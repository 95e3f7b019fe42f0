"""Public op surface: model code calls these; the registry binds the backend.

``stabletriton_tpu.ops.attention(...)`` dispatches to whichever implementation
the active binding selects ("reference" jnp or "pallas" fused kernel). See
``registry.py`` for why this replaces the reference's fx rewrite passes.
"""

from functools import partial

from stabletriton_tpu.ops.registry import (  # noqa: F401
    current_binding,
    dispatch,
    registered_ops,
    register,
    resolve,
    use_backends,
)
from stabletriton_tpu.ops import reference  # noqa: F401  (registers "reference")

attention = partial(dispatch, "attention")
attention_qkv = partial(dispatch, "attention_qkv")
attention_kv = partial(dispatch, "attention_kv")
group_norm = partial(dispatch, "group_norm")
layer_norm = partial(dispatch, "layer_norm")
rms_norm = partial(dispatch, "rms_norm")
geglu = partial(dispatch, "geglu")
linear = partial(dispatch, "linear")
time_embed = partial(dispatch, "time_embed")
conv2d = partial(dispatch, "conv2d")
gn_conv2d = partial(dispatch, "gn_conv2d")

# Kernel registration is deferred: importing the pallas backends here would pull
# jax.experimental.pallas at package import; they self-register on first import
# of stabletriton_tpu.kernels (compile.py does this when a binding asks for them).
