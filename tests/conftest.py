"""Test harness: force JAX onto a virtual 8-device CPU mesh.

The reference repo had no CPU-runnable tests at all (everything needed a real
CUDA GPU — SURVEY.md §4); this conftest is the fake-backend layer it lacked.
Pallas kernels run under interpret mode on CPU (see kernels/common.py).
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The axon sitecustomize may have pre-selected the TPU platform; override it.
jax.config.update("jax_platforms", "cpu")
