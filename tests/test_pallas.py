"""Pallas kernel tests (interpreter mode on CPU; the real-TPU validation of
the same kernels happens in bench/profiling runs)."""

import numpy as np
import jax.numpy as jnp
import pytest

from flownet2_tpu.ops.correlation import correlation
from flownet2_tpu.ops.pallas.correlation import correlation_pallas


@pytest.mark.parametrize("stride2", [1, 2])
def test_correlation_pallas_matches_reference(rng, stride2):
    f1 = jnp.asarray(rng.standard_normal((2, 8, 12, 16)).astype(np.float32))
    f2 = jnp.asarray(rng.standard_normal((2, 8, 12, 16)).astype(np.float32))
    md = 4
    ref = correlation(f1, f2, max_displacement=md, stride2=stride2, pad=md)
    got = correlation_pallas(
        f1, f2, max_displacement=md, stride2=stride2, interpret=True
    )
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_correlation_pallas_bf16(rng):
    f1 = jnp.asarray(rng.standard_normal((1, 8, 8, 8)), jnp.bfloat16)
    f2 = jnp.asarray(rng.standard_normal((1, 8, 8, 8)), jnp.bfloat16)
    ref = correlation(f1, f2, max_displacement=2, stride2=1, pad=2)
    got = correlation_pallas(f1, f2, max_displacement=2, stride2=1, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32), rtol=2e-2, atol=2e-2
    )
