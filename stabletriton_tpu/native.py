"""ctypes bindings for the native runtime library (native/*.cpp).

Loads ``libstabletriton_native.so`` (auto-building it with ``make`` on first
use if a toolchain exists); every entry point has a numpy fallback so the
framework stays fully functional without the native layer — the fast path is
an optimization, not a dependency.
"""

from __future__ import annotations

import ctypes
import functools
import subprocess
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent / "native"
_SO = _NATIVE_DIR / "libstabletriton_native.so"


@functools.cache
def lib() -> ctypes.CDLL | None:
    """The loaded native library, or None (fallbacks engage)."""
    if not _SO.exists():
        try:
            subprocess.run(
                ["make", "-C", str(_NATIVE_DIR)], check=True,
                capture_output=True, timeout=300,
            )
        except Exception:
            return None
    try:
        l = ctypes.CDLL(str(_SO))
    except OSError:
        return None
    l.st_bf16_to_f32.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64]
    l.st_f16_to_f32.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64]
    l.st_transpose_2d.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                  ctypes.c_int64, ctypes.c_int64]
    l.st_oihw_to_hwio.argtypes = [ctypes.c_void_p, ctypes.c_void_p] + [ctypes.c_int64] * 4
    l.st_float_to_rgb8.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64]
    l.st_encode_png.argtypes = [ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
                                ctypes.POINTER(ctypes.c_void_p)]
    l.st_encode_png.restype = ctypes.c_int64
    l.st_free.argtypes = [ctypes.c_void_p]
    l.st_tok_create.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
    l.st_tok_create.restype = ctypes.c_void_p
    l.st_tok_free.argtypes = [ctypes.c_void_p]
    l.st_tok_encode.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_void_p,
                                ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
                                ctypes.c_int32]
    l.st_tok_encode.restype = ctypes.c_int32
    l.st_tok_vocab_size.argtypes = [ctypes.c_void_p]
    l.st_tok_vocab_size.restype = ctypes.c_int32
    return l


def have_native() -> bool:
    return lib() is not None


# ---------------------------------------------------------------------------
# conversion
# ---------------------------------------------------------------------------


def bf16_to_f32(raw: np.ndarray) -> np.ndarray:
    """uint16 bf16 payloads -> float32."""
    raw = np.ascontiguousarray(raw, dtype=np.uint16)
    l = lib()
    if l is None:
        return (raw.astype(np.uint32) << 16).view(np.float32)
    out = np.empty(raw.shape, np.float32)
    l.st_bf16_to_f32(raw.ctypes.data, out.ctypes.data, raw.size)
    return out


def f16_to_f32(raw: np.ndarray) -> np.ndarray:
    raw = np.ascontiguousarray(raw, dtype=np.uint16)
    l = lib()
    if l is None:
        return raw.view(np.float16).astype(np.float32)
    out = np.empty(raw.shape, np.float32)
    l.st_f16_to_f32(raw.ctypes.data, out.ctypes.data, raw.size)
    return out


def transpose_2d(x: np.ndarray) -> np.ndarray:
    l = lib()
    if l is None or x.dtype != np.float32:
        return np.ascontiguousarray(x.T)
    x = np.ascontiguousarray(x)
    out = np.empty((x.shape[1], x.shape[0]), np.float32)
    l.st_transpose_2d(x.ctypes.data, out.ctypes.data, x.shape[0], x.shape[1])
    return out


def oihw_to_hwio(x: np.ndarray) -> np.ndarray:
    l = lib()
    if l is None or x.dtype != np.float32:
        return np.ascontiguousarray(x.transpose(2, 3, 1, 0))
    x = np.ascontiguousarray(x)
    o, i, h, w = x.shape
    out = np.empty((h, w, i, o), np.float32)
    l.st_oihw_to_hwio(x.ctypes.data, out.ctypes.data, o, i, h, w)
    return out


# ---------------------------------------------------------------------------
# image output
# ---------------------------------------------------------------------------


def to_rgb8(img: np.ndarray) -> np.ndarray:
    """[-1, 1] float image -> uint8 (round-half-up, clamped)."""
    img = np.ascontiguousarray(img, np.float32)
    l = lib()
    if l is None:
        return np.clip((img + 1.0) * 127.5 + 0.5, 0, 255).astype(np.uint8)
    out = np.empty(img.shape, np.uint8)
    l.st_float_to_rgb8(img.ctypes.data, out.ctypes.data, img.size)
    return out


def encode_png(rgb8: np.ndarray) -> bytes:
    """(H, W, 3) uint8 -> PNG bytes."""
    assert rgb8.ndim == 3 and rgb8.shape[2] == 3 and rgb8.dtype == np.uint8
    rgb8 = np.ascontiguousarray(rgb8)
    l = lib()
    if l is None:
        return _encode_png_py(rgb8)
    buf = ctypes.c_void_p()
    n = l.st_encode_png(rgb8.ctypes.data, rgb8.shape[1], rgb8.shape[0],
                        ctypes.byref(buf))
    if n < 0:
        raise RuntimeError("native PNG encode failed")
    try:
        return ctypes.string_at(buf, n)
    finally:
        l.st_free(buf)


def _encode_png_py(rgb8: np.ndarray) -> bytes:
    import struct
    import zlib

    h, w, _ = rgb8.shape
    raw = b"".join(b"\x00" + rgb8[y].tobytes() for y in range(h))
    comp = zlib.compress(raw, 6)

    def chunk(typ, data):
        c = typ + data
        return struct.pack(">I", len(data)) + c + struct.pack(">I", zlib.crc32(c))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) + chunk(b"IDAT", comp)
            + chunk(b"IEND", b""))


def save_png(img: np.ndarray, path) -> None:
    """[-1,1] float (H, W, 3) -> PNG file."""
    Path(path).write_bytes(encode_png(to_rgb8(img)))
