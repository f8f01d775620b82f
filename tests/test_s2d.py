"""Space-to-depth domain rewrites (ops/s2d.py) and the pixel-shuffle deconv:
exactness against the plain conv/deconv implementations, plus the windowed
flow-warp against the gather oracle (within its flow-variation budget)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flownet2_tpu.ops.conv import conv2d, deconv2d, deconv2d_ps
from flownet2_tpu.ops.s2d import (
    conv2d_s2d,
    deconv2d_s2d,
    depth_to_space,
    space_to_depth,
)
from flownet2_tpu.ops.warp import flow_warp_gather, flow_warp_windowed


def test_s2d_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((2, 8, 12, 5)), jnp.float32)
    np.testing.assert_array_equal(np.asarray(depth_to_space(space_to_depth(x))), np.asarray(x))


@pytest.mark.parametrize("k", [3, 5, 7])
@pytest.mark.parametrize("stride", [1, 2])
def test_conv2d_s2d_matches_plain(rng, k, stride):
    x = jnp.asarray(rng.standard_normal((2, 12, 16, 5)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, k, 5, 7)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((7,)), jnp.float32)
    ref = conv2d(x, w, b, stride=stride, padding=k // 2)
    got = conv2d_s2d(space_to_depth(x), w, b, stride=stride)
    if stride == 1:
        got = depth_to_space(got)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_conv2d_s2d_small_cout_merged_branch(rng):
    # cout < 32 exercises the merged-conv + phase-slice branch
    x = jnp.asarray(rng.standard_normal((1, 10, 14, 6)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 6, 4)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((4,)), jnp.float32)
    ref = conv2d(x, w, b, stride=1, padding=1)
    got = depth_to_space(conv2d_s2d(space_to_depth(x), w, b))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_conv2d_s2d_segments(rng):
    """Concat of s2d tensors + segment-permuted weights == plain conv of the
    full-res concat."""
    a = jnp.asarray(rng.standard_normal((2, 8, 12, 5)), jnp.float32)
    c = jnp.asarray(rng.standard_normal((2, 8, 12, 3)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 8, 33)), jnp.float32)
    ref = conv2d(jnp.concatenate([a, c], axis=-1), w, stride=1, padding=1)
    x2 = jnp.concatenate([space_to_depth(a), space_to_depth(c)], axis=-1)
    got = depth_to_space(conv2d_s2d(x2, w, segments=(5, 3)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_deconv2d_s2d_matches_plain(rng):
    x = jnp.asarray(rng.standard_normal((2, 6, 8, 5)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((4, 4, 7, 5)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((7,)), jnp.float32)
    ref = deconv2d(x, w, b)
    got = depth_to_space(deconv2d_s2d(x, w, b))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_deconv2d_ps_matches_transposed_conv(rng):
    x = jnp.asarray(rng.standard_normal((2, 6, 9, 5)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((4, 4, 7, 5)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((7,)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(deconv2d_ps(x, w, b)), np.asarray(deconv2d(x, w, b)), atol=1e-4
    )
    # gradients agree too
    g = jnp.asarray(rng.standard_normal((2, 12, 18, 7)), jnp.float32)
    dr = jax.grad(lambda x, w: jnp.sum(deconv2d(x, w) * g), argnums=(0, 1))(x, w)
    dp = jax.grad(lambda x, w: jnp.sum(deconv2d_ps(x, w) * g), argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(dp[0]), np.asarray(dr[0]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(dp[1]), np.asarray(dr[1]), atol=1e-4)


def test_fusion_s2d_layout_matches_plain(rng):
    from flownet2_tpu.models.fusion import fusion_apply, fusion_init

    params = fusion_init(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.standard_normal((2, 32, 48, 11)), jnp.float32)
    plain = fusion_apply(params, x, layout="plain")
    s2d = fusion_apply(params, x, layout="s2d")
    for k in plain:
        np.testing.assert_allclose(np.asarray(s2d[k]), np.asarray(plain[k]), atol=2e-4)


def test_flow_warp_windowed_matches_gather_within_budget(rng):
    img = jnp.asarray(rng.standard_normal((2, 20, 30, 3)), jnp.float32)
    flow = jnp.asarray(rng.uniform(-5, 5, (2, 20, 30, 2)), jnp.float32)
    kw = dict(rows_per_tile=4, col_chunk=16, src_window=48, v_window=24)
    ref = flow_warp_gather(img, flow)
    got = flow_warp_windowed(img, flow, **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
    # NaN fill mode: identical invalid masks
    refn = flow_warp_gather(img, flow, float("nan"))
    gotn = flow_warp_windowed(img, flow, float("nan"), **kw)
    np.testing.assert_array_equal(np.isnan(np.asarray(gotn)), np.isnan(np.asarray(refn)))
    # gradients to both inputs match the gather formulation
    g = jnp.asarray(rng.standard_normal(ref.shape), jnp.float32)
    dr = jax.grad(lambda i, f: jnp.sum(flow_warp_gather(i, f) * g), argnums=(0, 1))(img, flow)
    dw = jax.grad(lambda i, f: jnp.sum(flow_warp_windowed(i, f, **kw) * g), argnums=(0, 1))(img, flow)
    np.testing.assert_allclose(np.asarray(dw[0]), np.asarray(dr[0]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(dw[1]), np.asarray(dr[1]), atol=1e-4)


def test_flow_warp_windowed_odd_sizes(rng):
    """Non-multiple-of-tile dims pad internally and slice back."""
    img = jnp.asarray(rng.standard_normal((1, 11, 19, 2)), jnp.float32)
    flow = jnp.asarray(rng.uniform(-2, 2, (1, 11, 19, 2)), jnp.float32)
    ref = flow_warp_gather(img, flow)
    got = flow_warp_windowed(img, flow, rows_per_tile=4, col_chunk=16, src_window=48, v_window=24)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("net", ["s", "c", "sd"])
def test_encoder_s2d_heads_match_plain(rng, net):
    """The s2d-domain encoder heads (FlowNetS/C 7x7-s2 conv1; SD conv0+conv1)
    are exact rewrites of the plain path."""
    import jax
    from flownet2_tpu.models.flownet_s import flownet_s_apply, flownet_s_init
    from flownet2_tpu.models.flownet_c import flownet_c_apply, flownet_c_init
    from flownet2_tpu.models.flownet_sd import flownet_sd_apply, flownet_sd_init

    key = jax.random.PRNGKey(0)
    if net == "s":
        params = flownet_s_init(key)
        x = jnp.asarray(rng.standard_normal((2, 64, 128, 6)), jnp.float32)
        f = lambda lo: flownet_s_apply(params, x, layout=lo)
    elif net == "c":
        params = flownet_c_init(key)
        a = jnp.asarray(rng.standard_normal((2, 64, 128, 3)), jnp.float32)
        b = jnp.asarray(rng.standard_normal((2, 64, 128, 3)), jnp.float32)
        f = lambda lo: flownet_c_apply(params, a, b, layout=lo)
    else:
        params = flownet_sd_init(key)
        x = jnp.asarray(rng.standard_normal((2, 64, 128, 6)), jnp.float32)
        f = lambda lo: flownet_sd_apply(params, x, layout=lo)
    plain = f("plain")
    s2d = f("s2d")
    for k in plain:
        np.testing.assert_allclose(
            np.asarray(s2d[k]), np.asarray(plain[k]), atol=3e-4
        )

