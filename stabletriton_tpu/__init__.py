"""stabletriton-tpu: a TPU-native SDXL inference-acceleration framework.

Capability target: everything `StableTriton` (the CUDA/Triton reference) does —
a one-call ``compile(model)`` that substitutes fused kernels for the hot ops of
an SDXL UNet and replays the whole forward without host round-trips — rebuilt
TPU-first on JAX / XLA / Pallas:

  * the torch.fx rewrite-pass pipeline (reference ``src/stabletriton/optimization.py:10-25``)
    becomes an *op registry* with per-op backend binding (``stabletriton_tpu.ops``);
  * the Triton kernels (reference ``src/stabletriton/kernels/``) become Pallas TPU
    kernels (``stabletriton_tpu.kernels``);
  * CUDA-graph capture/replay (reference ``src/stabletriton/optimizers/cuda/graphs.py``)
    becomes a jitted ``lax.scan`` denoising loop with donated buffers and a
    shape-keyed compile cache (``stabletriton_tpu.runtime``).
"""

__version__ = "0.1.0"

from stabletriton_tpu.compile import compile_unet, CompileConfig  # noqa: F401
from stabletriton_tpu import ops  # noqa: F401
