"""Pallas TPU kernels; importing this package registers the "pallas" backends.

Kernel inventory mirrors the reference's Triton kernel layer (SURVEY.md §2.5)
redesigned for TPU:

  flash_attention — fused non-causal flash attention (self + cross)
  group_norm      — two-pass tiled GroupNorm with fused SiLU
  layer_norm      — row-tiled fused LayerNorm
  geglu           — fused state*gelu(gate)
  time_embed      — fused sinusoidal timestep embedding
  dropout         — seeded dropout (TPU PRNG; unwired in inference, like the
                    reference's)
  linear          — fused matmul+bias+activation GEMM (opt-in; XLA's dot wins
                    by default, mirroring the reference's disabled linear pass)
  conv_direct     — direct 3x3 conv, nine shifted MXU GEMMs with the
                    bias+residual+act epilogue in-kernel (DEFAULT since
                    round 4: measured 1.10-1.26x per shape over XLA's
                    ~155 TF/s conv, +7.6% step-level; per-shape tuned-table
                    entries can route a losing shape back to XLA via
                    {"impl": "xla"}); also hosts the opt-in fused-GN
                    variant (gn_conv2d="fused")
"""

from stabletriton_tpu.kernels import (  # noqa: F401
    conv_direct,
    dropout,
    flash_attention,
    geglu,
    group_norm,
    layer_norm,
    linear,
    time_embed,
)
