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
  conv_direct     — experimental direct 3x3 conv, nine shifted MXU GEMMs with
                    the bias+residual+act epilogue in-kernel (opt-in; the
                    SURVEY §7 stretch-goal experiment — the shipped default
                    is XLA's conv, measured at ~155 TF/s)
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
