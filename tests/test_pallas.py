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


def test_flow_warp_pallas_matches_gather(rng):
    from flownet2_tpu.ops.pallas.warp import flow_warp_pallas
    from flownet2_tpu.ops.warp import flow_warp_gather

    n, h, w, c = 2, 40, 300, 3
    img = jnp.asarray(rng.uniform(0, 1, (n, h, w, c)).astype(np.float32))
    flow = jnp.asarray(rng.uniform(-6, 6, (n, h, w, 2)).astype(np.float32))
    # out-of-range samples must hit the fill value
    flow = flow.at[:, :4, :4, 0].set(500.0)
    got = flow_warp_pallas(img, flow, interpret=True)
    ref = flow_warp_gather(img, flow)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_flow_warp_pallas_nan_fill(rng):
    from flownet2_tpu.ops.pallas.warp import flow_warp_pallas

    img = jnp.asarray(rng.uniform(0, 1, (1, 16, 140, 3)).astype(np.float32))
    flow = jnp.zeros((1, 16, 140, 2), jnp.float32).at[0, 2, 3, 1].set(-99.0)
    out = flow_warp_pallas(img, flow, fill_value=float("nan"), interpret=True)
    assert np.isnan(np.asarray(out)[0, 2, 3]).all()
    assert np.isfinite(np.asarray(out)[0, 3:]).all()


def test_flow_warp_pallas_bf16(rng):
    from flownet2_tpu.ops.pallas.warp import flow_warp_pallas
    from flownet2_tpu.ops.warp import flow_warp_gather

    img = jnp.asarray(rng.uniform(0, 1, (1, 24, 260, 3)), jnp.bfloat16)
    flow = jnp.asarray(rng.uniform(-4, 4, (1, 24, 260, 2)), jnp.bfloat16)
    got = flow_warp_pallas(img, flow, interpret=True)
    ref = flow_warp_gather(img, flow)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32), atol=3e-2
    )


@pytest.mark.parametrize(
    "k,stride,cout", [(3, 1, 16), (3, 1, 64), (5, 1, 8), (3, 2, 32), (7, 2, 24)]
)
def test_s2d_conv_pallas_matches_xla(rng, k, stride, cout):
    """The experimental merged-s2d-conv kernel (opt-in, ops/pallas/s2d_conv)
    matches the XLA formulation for every geometry class it claims."""
    from unittest import mock

    import jax.experimental.pallas as pl

    from flownet2_tpu.ops import s2d as S
    import flownet2_tpu.ops.pallas.s2d_conv as SC

    orig = pl.pallas_call

    def interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    cin = 11
    x = jnp.asarray(rng.standard_normal((2, 34, 46, 4 * cin)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, k, cin, cout)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal((cout,)), jnp.float32)
    ref = S._conv2d_s2d_impl(x, w, b, stride=stride)
    with mock.patch.object(SC.pl, "pallas_call", interp):
        got = S._conv2d_s2d_routed(x, w, b, stride, None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-3)


def test_s2d_deconv_pallas_matches_xla(rng):
    from unittest import mock

    import jax.experimental.pallas as pl

    from flownet2_tpu.ops import s2d as S
    import flownet2_tpu.ops.pallas.s2d_conv as SC

    orig = pl.pallas_call

    def interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    x = jnp.asarray(rng.standard_normal((2, 20, 28, 10)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((4, 4, 6, 10)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal((6,)), jnp.float32)
    ref = S._deconv2d_s2d_impl(x, w, b)
    with mock.patch.object(SC.pl, "pallas_call", interp):
        got = S._deconv2d_s2d_routed(x, w, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-3)
