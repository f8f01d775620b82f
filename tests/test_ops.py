"""Op-level tests: JAX implementations vs. independent numpy oracles, plus
finite-difference gradient checks (the reference's GradientChecker idea,
include/caffe/test/test_gradient_check_util.hpp, via jax.test_util)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.test_util import check_grads

from flownet2_tpu.ops import (
    channel_norm,
    correlation,
    correlation_1d,
    downsample_nan_aware,
    flow_warp,
    leaky_relu,
    neg_relu,
    resample,
)
from flownet2_tpu.ops.correlation import correlation_output_shape

import oracles


class TestCorrelation:
    @pytest.mark.parametrize(
        "kwargs",
        [
            dict(max_displacement=2, kernel_size=1, stride1=1, stride2=1, pad=2),
            dict(max_displacement=4, kernel_size=1, stride1=1, stride2=2, pad=4),
            dict(max_displacement=2, kernel_size=3, stride1=1, stride2=1, pad=3),
            dict(max_displacement=2, kernel_size=1, stride1=2, stride2=1, pad=2),
            dict(max_displacement=2, kernel_size=1, stride1=1, stride2=1, pad=0),
        ],
    )
    def test_vs_oracle_multiply(self, rng, kwargs):
        f1 = rng.standard_normal((2, 10, 12, 3)).astype(np.float32)
        f2 = rng.standard_normal((2, 10, 12, 3)).astype(np.float32)
        got = np.asarray(correlation(jnp.asarray(f1), jnp.asarray(f2), **kwargs))
        want = oracles.correlation_oracle(f1, f2, **kwargs)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_vs_oracle_subtract(self, rng):
        kwargs = dict(max_displacement=2, kernel_size=3, stride1=1, stride2=1, pad=2)
        f1 = rng.standard_normal((1, 9, 11, 4)).astype(np.float32)
        f2 = rng.standard_normal((1, 9, 11, 4)).astype(np.float32)
        got = np.asarray(
            correlation(jnp.asarray(f1), jnp.asarray(f2), multiply=False, **kwargs)
        )
        want = oracles.correlation_oracle(f1, f2, multiply=False, **kwargs)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_flownetc_geometry(self):
        # FlowNetC: 441 channels at conv3 resolution (SURVEY.md §2.6).
        oh, ow, oc = correlation_output_shape(
            40, 56, max_displacement=20, kernel_size=1, stride1=1, stride2=2, pad=20
        )
        assert (oh, ow, oc) == (40, 56, 441)

    def test_gradients(self, rng):
        f1 = jnp.asarray(rng.standard_normal((1, 8, 8, 2)).astype(np.float32))
        f2 = jnp.asarray(rng.standard_normal((1, 8, 8, 2)).astype(np.float32))

        def fn(a, b):
            return correlation(a, b, max_displacement=2, stride2=1, pad=2)

        check_grads(fn, (f1, f2), order=1, modes=["rev"], atol=1e-2, rtol=1e-2)

    def test_1d_vs_oracle(self, rng):
        for sd in (-1, 0, 1):
            kwargs = dict(
                max_displacement=4, kernel_size=1, stride1=1, stride2=2, pad=4,
                single_direction=sd,
            )
            f1 = rng.standard_normal((1, 6, 14, 3)).astype(np.float32)
            f2 = rng.standard_normal((1, 6, 14, 3)).astype(np.float32)
            got = np.asarray(correlation_1d(jnp.asarray(f1), jnp.asarray(f2), **kwargs))
            want = oracles.correlation_1d_oracle(f1, f2, **kwargs)
            np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5, err_msg=f"sd={sd}")


class TestFlowWarp:
    def test_vs_oracle(self, rng):
        img = rng.standard_normal((2, 9, 12, 3)).astype(np.float32)
        flow = (rng.standard_normal((2, 9, 12, 2)) * 3).astype(np.float32)
        got = np.asarray(flow_warp(jnp.asarray(img), jnp.asarray(flow)))
        want = oracles.flow_warp_oracle(img, flow)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_nan_fill(self, rng):
        img = rng.standard_normal((1, 5, 5, 1)).astype(np.float32)
        flow = np.full((1, 5, 5, 2), 10.0, dtype=np.float32)  # everything OOB
        got = np.asarray(flow_warp(jnp.asarray(img), jnp.asarray(flow), fill_value=np.nan))
        assert np.all(np.isnan(got))

    def test_identity_flow(self, rng):
        img = rng.standard_normal((1, 6, 7, 3)).astype(np.float32)
        flow = np.zeros((1, 6, 7, 2), dtype=np.float32)
        got = np.asarray(flow_warp(jnp.asarray(img), jnp.asarray(flow)))
        np.testing.assert_allclose(got, img, rtol=1e-6)

    def test_gradients_both_inputs(self, rng):
        img = jnp.asarray(rng.standard_normal((1, 6, 6, 2)).astype(np.float32))
        # keep flow away from integer grid points (kinks) for finite differences
        flow = jnp.asarray((rng.uniform(0.2, 0.8, (1, 6, 6, 2))).astype(np.float32))
        check_grads(
            lambda i, f: flow_warp(i, f), (img, flow), order=1, modes=["rev"],
            atol=1e-2, rtol=1e-2,
        )


class TestChannelNorm:
    def test_forward(self, rng):
        x = rng.standard_normal((2, 4, 5, 7)).astype(np.float32)
        got = np.asarray(channel_norm(jnp.asarray(x)))
        want = np.sqrt((x**2).sum(-1, keepdims=True))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_grad_at_zero_is_finite(self):
        x = jnp.zeros((1, 2, 2, 3))
        g = jax.grad(lambda v: channel_norm(v).sum())(x)
        assert np.all(np.isfinite(np.asarray(g)))

    def test_gradients(self, rng):
        x = jnp.asarray(rng.standard_normal((1, 3, 3, 4)).astype(np.float32))
        check_grads(channel_norm, (x,), order=1, modes=["rev"], atol=1e-2, rtol=1e-2)


class TestResample:
    @pytest.mark.parametrize("method", ["nearest", "linear", "cubic"])
    @pytest.mark.parametrize("shape", [(8, 10, 16, 20), (16, 20, 8, 10), (8, 10, 8, 10)])
    def test_vs_oracle(self, rng, method, shape):
        ih, iw, oh, ow = shape
        x = rng.standard_normal((ih, iw, 3)).astype(np.float32)
        got = np.asarray(resample(jnp.asarray(x)[None], oh, ow, method=method))[0]
        want = oracles.resample_oracle(x, oh, ow, method=method)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    @pytest.mark.parametrize("antialias", [True, False])
    def test_downscale_antialias(self, rng, antialias):
        x = rng.standard_normal((16, 24, 2)).astype(np.float32)
        got = np.asarray(
            resample(jnp.asarray(x)[None], 8, 12, method="linear", antialias=antialias)
        )[0]
        want = oracles.resample_oracle(x, 8, 12, method="linear", antialias=antialias)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_differentiable(self, rng):
        x = jnp.asarray(rng.standard_normal((1, 8, 8, 2)).astype(np.float32))
        g = jax.grad(lambda v: resample(v, 16, 16).sum())(x)
        assert np.all(np.isfinite(np.asarray(g)))


class TestDownsample:
    def test_vs_oracle(self, rng):
        x = rng.standard_normal((17, 23, 2)).astype(np.float32)
        got = np.asarray(downsample_nan_aware(jnp.asarray(x)[None], 5, 7))[0]
        want = oracles.downsample_oracle(x, 5, 7)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_nan_voting(self, rng):
        x = rng.standard_normal((16, 16, 1)).astype(np.float32)
        x[:10, :10] = np.nan  # big NaN block → NaN in the corresponding output
        got = np.asarray(downsample_nan_aware(jnp.asarray(x)[None], 4, 4))[0]
        want = oracles.downsample_oracle(x, 4, 4)
        np.testing.assert_array_equal(np.isnan(got), np.isnan(want))
        m = ~np.isnan(want)
        np.testing.assert_allclose(got[m], want[m], rtol=1e-4, atol=1e-4)

    def test_identity_passthrough(self, rng):
        x = jnp.asarray(rng.standard_normal((1, 8, 8, 2)).astype(np.float32))
        assert downsample_nan_aware(x, 8, 8) is x


class TestActivations:
    def test_leaky_relu(self):
        x = jnp.asarray([-2.0, -0.5, 0.0, 0.5, 2.0])
        np.testing.assert_allclose(
            np.asarray(leaky_relu(x)), [-0.2, -0.05, 0.0, 0.5, 2.0], rtol=1e-6
        )

    def test_neg_relu(self):
        x = jnp.asarray([-2.0, 0.0, 2.0])
        np.testing.assert_allclose(np.asarray(neg_relu(x)), [-2.0, 0.0, 0.2], rtol=1e-6)


class TestFlowWarpOneHot:
    def test_matches_gather_path(self, rng):
        from flownet2_tpu.ops.warp import flow_warp_gather, flow_warp_onehot

        img = jnp.asarray(rng.standard_normal((2, 10, 14, 3)).astype(np.float32))
        flow = jnp.asarray((rng.standard_normal((2, 10, 14, 2)) * 4).astype(np.float32))
        a = np.asarray(flow_warp_gather(img, flow))
        b = np.asarray(flow_warp_onehot(img, flow))
        # bf16 one-hot matmul tolerance
        np.testing.assert_allclose(a, b, atol=3e-2, rtol=3e-2)

    def test_gradients(self, rng):
        from flownet2_tpu.ops.warp import flow_warp_onehot

        img = jnp.asarray(rng.standard_normal((1, 6, 6, 2)).astype(np.float32))
        flow = jnp.asarray(rng.uniform(0.2, 0.8, (1, 6, 6, 2)).astype(np.float32))
        g = jax.grad(lambda i, f: jnp.sum(flow_warp_onehot(i, f).astype(jnp.float32)), argnums=(0, 1))(img, flow)
        assert all(np.all(np.isfinite(np.asarray(x))) for x in g)


class TestAccum:
    def test_max_size_concat(self, rng):
        from flownet2_tpu.ops.accum import accum

        a = jnp.asarray(rng.standard_normal((1, 4, 6, 2)).astype(np.float32))
        b = jnp.asarray(rng.standard_normal((1, 8, 12, 3)).astype(np.float32))
        out = accum([a, b])
        assert out.shape == (1, 8, 12, 5)

    def test_reference_and_divisible(self, rng):
        from flownet2_tpu.ops.accum import accum

        a = jnp.asarray(rng.standard_normal((1, 4, 6, 1)).astype(np.float32))
        b = jnp.asarray(rng.standard_normal((1, 7, 9, 1)).astype(np.float32))
        out = accum([a, b], reference=0)
        assert out.shape == (1, 4, 6, 2)
        out = accum([a, b], size_divisible_by=8)
        assert out.shape == (1, 8, 16, 2)


class TestCorrelationCustomVjp:
    """The hand-derived backward (correlation_auto's FlowNet-config path)
    must match autodiff of the reference implementation."""

    def test_grads_match_autodiff(self, rng):
        from flownet2_tpu.ops.correlation import correlation_auto

        f1 = jnp.asarray(rng.standard_normal((2, 8, 10, 4)).astype(np.float32))
        f2 = jnp.asarray(rng.standard_normal((2, 8, 10, 4)).astype(np.float32))
        g = jnp.asarray(rng.standard_normal((2, 8, 10, 25)).astype(np.float32))
        kwargs = dict(max_displacement=2, kernel_size=1, stride1=1, stride2=1, pad=2)

        def custom(a, b):
            return jnp.vdot(correlation_auto(a, b, **kwargs), g)

        def ref(a, b):
            return jnp.vdot(correlation(a, b, **kwargs), g)

        gc = jax.grad(custom, argnums=(0, 1))(f1, f2)
        gr = jax.grad(ref, argnums=(0, 1))(f1, f2)
        np.testing.assert_allclose(np.asarray(gc[0]), np.asarray(gr[0]), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(gc[1]), np.asarray(gr[1]), rtol=1e-4, atol=1e-5)

    def test_grads_match_autodiff_stride2(self, rng):
        from flownet2_tpu.ops.correlation import correlation_auto

        f1 = jnp.asarray(rng.standard_normal((1, 10, 12, 3)).astype(np.float32))
        f2 = jnp.asarray(rng.standard_normal((1, 10, 12, 3)).astype(np.float32))
        kwargs = dict(max_displacement=4, kernel_size=1, stride1=1, stride2=2, pad=4)
        gw2 = (2 * 2 + 1) ** 2
        g = jnp.asarray(rng.standard_normal((1, 10, 12, gw2)).astype(np.float32))
        gc = jax.grad(lambda a, b: jnp.vdot(correlation_auto(a, b, **kwargs), g), argnums=(0, 1))(f1, f2)
        gr = jax.grad(lambda a, b: jnp.vdot(correlation(a, b, **kwargs), g), argnums=(0, 1))(f1, f2)
        np.testing.assert_allclose(np.asarray(gc[0]), np.asarray(gr[0]), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(gc[1]), np.asarray(gr[1]), rtol=1e-4, atol=1e-5)

    def test_grads_match_gather_path(self, rng):
        """The MXU one-hot warp must be gradient-equivalent to the exact
        gather warp (both differentiate the same bilinear form)."""
        from flownet2_tpu.ops.warp import flow_warp_gather, flow_warp_onehot

        img = jnp.asarray(rng.standard_normal((1, 7, 9, 2)).astype(np.float32))
        flow = jnp.asarray(rng.uniform(0.2, 0.8, (1, 7, 9, 2)).astype(np.float32))
        g = jnp.asarray(rng.standard_normal((1, 7, 9, 2)).astype(np.float32))

        ga = jax.grad(lambda i, f: jnp.vdot(flow_warp_gather(i, f), g), argnums=(0, 1))(img, flow)
        gb = jax.grad(lambda i, f: jnp.vdot(flow_warp_onehot(i, f), g), argnums=(0, 1))(img, flow)
        np.testing.assert_allclose(np.asarray(ga[0]), np.asarray(gb[0]), atol=3e-2, rtol=3e-2)
        np.testing.assert_allclose(np.asarray(ga[1]), np.asarray(gb[1]), atol=3e-2, rtol=3e-2)


class TestCorrelation1DFast:
    """MXU banded-matmul 1-D correlation + hand VJP (correlation_1d_auto)."""

    @pytest.mark.parametrize("single_direction", [-1, 0, 1])
    def test_matches_scan_path(self, rng, single_direction):
        from flownet2_tpu.ops.correlation import correlation_1d_auto

        f1 = rng.standard_normal((2, 6, 16, 5)).astype(np.float32)
        f2 = rng.standard_normal((2, 6, 16, 5)).astype(np.float32)
        kw = dict(max_displacement=4, kernel_size=1, stride1=1, pad=4,
                  single_direction=single_direction)
        fast = np.asarray(correlation_1d_auto(jnp.asarray(f1), jnp.asarray(f2), **kw))
        ref = np.asarray(correlation_1d(jnp.asarray(f1), jnp.asarray(f2), **kw))
        np.testing.assert_allclose(fast, ref, rtol=1e-5, atol=1e-6)

    @pytest.mark.parametrize("single_direction", [-1, 0])
    def test_hand_vjp_matches_autodiff(self, rng, single_direction):
        from flownet2_tpu.ops.correlation import correlation_1d_auto

        f1 = jnp.asarray(rng.standard_normal((1, 4, 12, 3)), jnp.float32)
        f2 = jnp.asarray(rng.standard_normal((1, 4, 12, 3)), jnp.float32)
        kw = dict(max_displacement=3, pad=3, single_direction=single_direction)

        def loss_fast(a, b):
            out = correlation_1d_auto(a, b, **kw)
            return jnp.sum(out * out)

        def loss_ref(a, b):
            out = correlation_1d(
                a, b, max_displacement=3, kernel_size=1, stride1=1, pad=3,
                single_direction=single_direction,
            )
            return jnp.sum(out * out)

        g_fast = jax.grad(loss_fast, argnums=(0, 1))(f1, f2)
        g_ref = jax.grad(loss_ref, argnums=(0, 1))(f1, f2)
        for a, b in zip(g_fast, g_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)

    def test_gradcheck(self, rng):
        from flownet2_tpu.ops.correlation import correlation_1d_auto

        f1 = jnp.asarray(rng.standard_normal((1, 3, 10, 2)), jnp.float32)
        f2 = jnp.asarray(rng.standard_normal((1, 3, 10, 2)), jnp.float32)
        jax.test_util.check_grads(
            lambda a, b: correlation_1d_auto(
                a, b, max_displacement=2, pad=2, single_direction=-1
            ),
            (f1, f2),
            order=1,
            modes=["rev"],
            atol=1e-2,
            rtol=1e-2,
        )


def test_flow_warp_windowed_partial_chunk_tall_image(rng):
    """Regression: the per-tile window base is a min over tile coordinates;
    zero-padded coordinates in a partial last column-chunk dragged the base
    to 0 and clamped every pixel with source row >= v_window (mean ~46px
    vertical error at 448x320 pre-fix). Pads must be large, not zero."""
    from flownet2_tpu.ops.warp import flow_warp_gather, flow_warp_windowed

    n, h, w = 1, 96, 300  # h > v_window(64), w % col_chunk(256) != 0
    img = jnp.asarray(rng.uniform(0, 1, (n, h, w, 3)).astype(np.float32))
    flow = jnp.asarray(rng.uniform(-5, 5, (n, h, w, 2)).astype(np.float32))
    got = flow_warp_windowed(img, flow)
    ref = flow_warp_gather(img, flow)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_flow_warp_gather_safe_grads_match(rng):
    """The TPU-safe gather backward (exact f32 one-hot VJP — the TPU
    scatter primitive faults the worker) matches the gather autodiff."""
    from flownet2_tpu.ops.warp import _flow_warp_gather_safe, flow_warp_gather

    img = jnp.asarray(rng.uniform(0, 1, (2, 12, 20, 3)).astype(np.float32))
    flow = jnp.asarray(rng.uniform(-3, 3, (2, 12, 20, 2)).astype(np.float32))
    g = jnp.asarray(rng.standard_normal((2, 12, 20, 3)).astype(np.float32))

    def pull(fn):
        out, vjp = jax.vjp(lambda a, f: fn(a, f, 0.0), img, flow)
        return vjp(g)

    da_ref, df_ref = pull(flow_warp_gather)
    da, df = pull(_flow_warp_gather_safe)
    np.testing.assert_allclose(np.asarray(da), np.asarray(da_ref), atol=1e-4)
    np.testing.assert_allclose(np.asarray(df), np.asarray(df_ref), atol=1e-3)


def test_flow_warp_windowed_hand_vjp_matches_autodiff(rng):
    """The hand-derived windowed backward (used by the pallas/windowed
    training paths) equals autodiff through flow_warp_windowed, including
    invalid pixels and the clip saturation chain."""
    from flownet2_tpu.ops.warp import _flow_warp_windowed_hand, flow_warp_windowed

    img = jnp.asarray(rng.uniform(0, 1, (2, 24, 40, 3)).astype(np.float32))
    flow = jnp.asarray(rng.uniform(-5, 5, (2, 24, 40, 2)).astype(np.float32))
    flow = flow.at[0, 1, 1, 0].set(300.0)  # invalid -> zero grads
    g = jnp.asarray(rng.standard_normal((2, 24, 40, 3)).astype(np.float32))
    _, vjp = jax.vjp(lambda a, f: flow_warp_windowed(a, f, 0.0), img, flow)
    da_ref, df_ref = vjp(g)
    _, vjp2 = jax.vjp(lambda a, f: _flow_warp_windowed_hand(a, f, 0.0), img, flow)
    da, df = vjp2(g)
    np.testing.assert_allclose(np.asarray(da), np.asarray(da_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(df), np.asarray(df_ref), atol=1e-5)

