"""Pallas kernel tests (interpreter mode on CPU; the real-TPU validation of
the same kernels happens in bench/profiling runs)."""

import numpy as np
import jax.numpy as jnp
import pytest

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


def test_flow_warp_pallas_adversarial_window_budget(rng):
    """Large within-tile flow variation at adversarial base alignments must
    stay EXACT up to the documented budgets (|Δx|<=127, |Δy|<=55 per tile)
    — ADVICE r2 #1: the old SW=384 geometry had a worst-case-NEGATIVE
    horizontal budget, silently clamping coherent in-budget flows."""
    from flownet2_tpu.ops.pallas.warp import flow_warp_pallas
    from flownet2_tpu.ops.warp import flow_warp_gather

    n, h, w, c = 1, 48, 448, 3
    img = jnp.asarray(rng.uniform(0, 1, (n, h, w, c)).astype(np.float32))
    # Base flow pushes sources near 128-alignment boundaries; a high-freq
    # component spreads the footprint almost the full horizontal budget
    # inside every (16, 256) tile, plus +-25 px vertically.
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    u = 63.0 * np.sin(xs * 0.37) - 60.0 * np.cos(xs * 0.11)  # spread ~123 px
    v = 25.0 * np.sin(xs * 0.23 + ys * 0.05)
    flow = jnp.asarray(np.stack([u, v], -1)[None])
    got = flow_warp_pallas(img, flow, interpret=True)
    ref = flow_warp_gather(img, flow)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_flow_warp_pallas_bwd_agrees_within_budget(rng):
    """Forward (pallas geometry) and the hand windowed backward use
    different tile geometries; within the shared 127/55 budget both are
    exact, so the pallas-path VJP must match the exact gather-path VJP."""
    import jax

    from flownet2_tpu.ops.warp import _flow_warp_windowed_bwd, flow_warp_gather

    n, h, w, c = 1, 24, 300, 3
    img = jnp.asarray(rng.uniform(0, 1, (n, h, w, c)).astype(np.float32))
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    # 0.37/0.53 offsets keep source coords off the integer lattice — at
    # exact-integer sources bilinear has a kink and the one-sided derivative
    # is implementation-defined (the reference GradientChecker excludes
    # kinks for the same reason, test_gradient_check_util.hpp).
    u = 50.0 * np.sin(xs * 0.3) + 0.37
    v = 20.0 * np.cos(xs * 0.17) + 0.53
    flow = jnp.asarray(np.stack([u, v], -1)[None])
    g = jnp.asarray(rng.uniform(-1, 1, (n, h, w, c)).astype(np.float32))

    dimg_w, dflow_w = _flow_warp_windowed_bwd(img, flow, 0.0, g)
    _, vjp = jax.vjp(lambda im, fl: flow_warp_gather(im, fl), img, flow)
    dimg_e, dflow_e = vjp(g)
    np.testing.assert_allclose(np.asarray(dimg_w), np.asarray(dimg_e), atol=2e-4)
    np.testing.assert_allclose(np.asarray(dflow_w), np.asarray(dflow_e), atol=2e-3)


def test_flow_warp_pallas_bwd_kernel_matches_gather_vjp(rng):
    """The fused Pallas backward (flow_warp_pallas_bwd) is the exact VJP of
    the forward — and, within budget, of the exact gather formulation."""
    import jax

    from flownet2_tpu.ops.pallas.warp import flow_warp_pallas_bwd
    from flownet2_tpu.ops.warp import flow_warp_gather

    n, h, w, c = 2, 24, 300, 3
    img = jnp.asarray(rng.uniform(0, 1, (n, h, w, c)).astype(np.float32))
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    # off-lattice sources (kinks excluded, as in the reference's
    # GradientChecker); spreads stay within the 127/55 budgets
    u = 50.0 * np.sin(xs * 0.3) + 0.37
    v = 20.0 * np.cos(xs * 0.17) + 0.53
    flow = jnp.asarray(np.broadcast_to(np.stack([u, v], -1), (n, h, w, 2)))
    # some out-of-range pixels: no gradient may flow through them
    flow = flow.at[:, 1, :5, 0].set(900.0)
    g = jnp.asarray(rng.uniform(-1, 1, (n, h, w, c)).astype(np.float32))

    dimg_p, dflow_p = flow_warp_pallas_bwd(img, flow, g, interpret=True)
    _, vjp = jax.vjp(lambda im, fl: flow_warp_gather(im, fl), img, flow)
    dimg_e, dflow_e = vjp(g)
    np.testing.assert_allclose(np.asarray(dimg_p), np.asarray(dimg_e), atol=2e-4)
    np.testing.assert_allclose(np.asarray(dflow_p), np.asarray(dflow_e), atol=2e-3)


def test_flow_warp_pallas_bwd_kernel_boundary(rng):
    """Sources pushed to the last column/row: the IMAGE gradient must land
    on the clamped taps exactly as the gather formulation's (xb=min(floor,
    W-2), alpha=1 convention, flow_warp_layer.cpp:88-94). Flow grads are
    excluded at exact-boundary pixels — x2 == W-1 is a clip kink where
    autodiff's tie-breaking (zero) and the windowed convention
    (img[W-1]-img[W-2]) legitimately differ."""
    import jax

    from flownet2_tpu.ops.pallas.warp import flow_warp_pallas_bwd
    from flownet2_tpu.ops.warp import flow_warp_gather

    n, h, w, c = 1, 16, 140, 3
    img = jnp.asarray(rng.uniform(0, 1, (n, h, w, c)).astype(np.float32))
    # off-lattice base flow: integer source coords are clip kinks where
    # autodiff tie-breaking is implementation-defined
    flow = jnp.full((n, h, w, 2), 0.37, jnp.float32)
    # column 3 -> exactly the last source column; column 5 -> just inside
    flow = flow.at[:, :, 3, 0].set(float(w - 1 - 3))
    flow = flow.at[:, :, 5, 0].set(float(w - 1 - 5) - 0.25)
    flow = flow.at[:, 2, :, 1].set(float(h - 1 - 2))
    g = jnp.asarray(rng.uniform(-1, 1, (n, h, w, c)).astype(np.float32))

    dimg_p, dflow_p = flow_warp_pallas_bwd(img, flow, g, interpret=True)
    _, vjp = jax.vjp(lambda im, fl: flow_warp_gather(im, fl), img, flow)
    dimg_e, dflow_e = vjp(g)
    np.testing.assert_allclose(np.asarray(dimg_p), np.asarray(dimg_e), atol=2e-4)
    kink = np.zeros((n, h, w, 1), bool)
    kink[:, :, 3] = True  # x2 == W-1 exactly
    kink[:, 2, :] = True  # y2 == H-1 exactly
    np.testing.assert_allclose(
        np.where(kink, 0, np.asarray(dflow_p)),
        np.where(kink, 0, np.asarray(dflow_e)),
        atol=2e-3,
    )


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


@pytest.mark.tpu
def test_flow_warp_pallas_bwd_compiled_matches_gather_vjp(rng):
    """ADVICE r3 #3: the COMPILED Mosaic backward kernel (interpret=False)
    — the default training path on TPU — asserted against the exact gather
    VJP at MXU precision (the interpret-mode tests above use tighter
    tolerances the compiled kernel's bf16 MXU passes can't meet)."""
    import jax

    from flownet2_tpu.ops.pallas.warp import flow_warp_pallas_bwd
    from flownet2_tpu.ops.warp import flow_warp_gather

    n, h, w, c = 2, 24, 300, 3
    img = jnp.asarray(rng.uniform(0, 1, (n, h, w, c)).astype(np.float32))
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    u = 50.0 * np.sin(xs * 0.3) + 0.37
    v = 20.0 * np.cos(xs * 0.17) + 0.53
    flow = jnp.asarray(np.broadcast_to(np.stack([u, v], -1), (n, h, w, 2)))
    flow = flow.at[:, 1, :5, 0].set(900.0)  # out-of-range: zero gradient
    g = jnp.asarray(rng.uniform(-1, 1, (n, h, w, c)).astype(np.float32))

    dimg_p, dflow_p = flow_warp_pallas_bwd(img, flow, g)  # compiled
    _, vjp = jax.vjp(lambda im, fl: flow_warp_gather(im, fl), img, flow)
    dimg_e, dflow_e = vjp(g)
    # MXU-precision tolerance (measured ~6e-3 max abs on v5e, ADVICE r3)
    np.testing.assert_allclose(np.asarray(dimg_p), np.asarray(dimg_e), atol=2e-2)
    np.testing.assert_allclose(np.asarray(dflow_p), np.asarray(dflow_e), atol=5e-2)


# -- fused fusion-net decoder head (ops/pallas/fusion_head.py) --------------


@pytest.mark.parametrize("shape", [(2, 40, 56), (1, 32, 224), (1, 17, 130)])
def test_fusion_head_pallas_matches_xla(rng, shape):
    """The fused 5-layer decoder-head kernel must match the XLA composition
    (its VJP/backward/off-TPU path) everywhere, including image borders —
    the kernel re-creates each stage's zero padding with in-kernel masks,
    and a chained kernel that skipped them would diverge exactly there.
    Covers multi-row-tile (R=16), multi-col-tile (CB=112), and
    non-tile-divisible geometries."""
    import jax

    from flownet2_tpu.models.fusion import fusion_init
    from flownet2_tpu.ops.pallas.fusion_head import (
        build_fusion_head_weights,
        fusion_head_pallas,
    )
    from flownet2_tpu.ops.s2d import _fusion_head_xla

    b, h2, w2 = shape
    params = fusion_init(jax.random.PRNGKey(1), dtype=jnp.float32)
    cat1 = jnp.asarray(rng.normal(0, 1, (b, h2, w2, 162)), jnp.float32)
    c0 = jnp.asarray(rng.normal(0, 1, (b, h2, w2, 256)), jnp.float32)
    ref0, ref1 = _fusion_head_xla(cat1, c0, params)
    fw = build_fusion_head_weights(params, jnp.float32)
    out0, out1 = fusion_head_pallas(cat1, c0, fw, interpret=True)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(ref0), atol=2e-5)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(ref1), atol=2e-5)


def test_fusion_head_xla_matches_fusion_apply(rng):
    """_fusion_head_xla (the kernel's oracle) must equal the in-net layer
    composition it replaces — pinned against fusion_apply(layout='s2d')
    with the kernel routing OFF."""
    import jax

    from flownet2_tpu.models.fusion import fusion_apply, fusion_init

    params = fusion_init(jax.random.PRNGKey(3), dtype=jnp.float32)
    x = jnp.asarray(rng.normal(0, 1, (2, 64, 96, 11)), jnp.float32)
    plain = fusion_apply(params, x, layout="plain")
    s2d = fusion_apply(params, x, layout="s2d")
    for k in ("flow0", "flow1", "flow2"):
        np.testing.assert_allclose(
            np.asarray(s2d[k]), np.asarray(plain[k]), atol=2e-5
        )
