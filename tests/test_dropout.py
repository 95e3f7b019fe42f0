"""Seeded dropout kernel tests (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from stabletriton_tpu.kernels.dropout import seeded_dropout


def test_dropout_determinism_and_rate():
    x = jnp.ones((64, 32))
    a = seeded_dropout(x, 7, rate=0.25)
    b = seeded_dropout(x, 7, rate=0.25)
    c = seeded_dropout(x, 8, rate=0.25)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.array_equal(np.asarray(a), np.asarray(c))
    # kept values are rescaled by 1/(1-rate)
    kept = np.asarray(a)[np.asarray(a) != 0]
    np.testing.assert_allclose(kept, 1 / 0.75)
    # empirical drop rate near 25%
    drop_frac = float((np.asarray(a) == 0).mean())
    assert 0.1 < drop_frac < 0.4


def test_dropout_zero_rate_identity():
    x = jnp.arange(12.0).reshape(3, 4)
    np.testing.assert_array_equal(np.asarray(seeded_dropout(x, 0, rate=0.0)), np.asarray(x))


def test_dropout_invalid_rate():
    with pytest.raises(ValueError):
        seeded_dropout(jnp.ones((2, 2)), 0, rate=1.0)
