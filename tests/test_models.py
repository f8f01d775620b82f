"""Model-level smoke + shape tests (tiny resolutions, CPU).

All applies are jitted — unjitted op-by-op dispatch compiles each primitive
separately on the CPU backend and is ~50× slower.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from flownet2_tpu.inference import FlowRunner, MODEL_INITS
from flownet2_tpu.models import (
    flownet2_apply,
    flownet2_init,
    flownet_c_apply,
    flownet_c_init,
    flownet_s_apply,
    flownet_s_init,
    flownet_sd_apply,
    flownet_sd_init,
    fusion_apply,
    fusion_init,
    normalize_images,
)

H, W = 64, 128  # one /64 tile; keeps CPU tests fast


def _imgs(rng, n=1, h=H, w=W):
    return (
        jnp.asarray(rng.uniform(0, 255, (n, h, w, 3)).astype(np.float32)),
        jnp.asarray(rng.uniform(0, 255, (n, h, w, 3)).astype(np.float32)),
    )


def test_flownet_s_scales(rng):
    params = flownet_s_init(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.standard_normal((1, H, W, 6)).astype(np.float32))
    flows = jax.jit(flownet_s_apply)(params, x)
    assert set(flows) == {"flow2", "flow3", "flow4", "flow5", "flow6"}
    for lvl in range(2, 7):
        f = flows[f"flow{lvl}"]
        assert f.shape == (1, H // 2**lvl, W // 2**lvl, 2), lvl


def test_flownet_c_scales(rng):
    params = flownet_c_init(jax.random.PRNGKey(0))
    i0, i1 = _imgs(rng)

    @jax.jit
    def run(p, a, b):
        x0, x1 = normalize_images(a, b)
        return flownet_c_apply(p, x0, x1)

    flows = run(params, i0, i1)
    assert flows["flow2"].shape == (1, H // 4, W // 4, 2)
    assert flows["flow6"].shape == (1, H // 64, W // 64, 2)


def test_flownet_sd_scales(rng):
    params = flownet_sd_init(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.standard_normal((1, H, W, 6)).astype(np.float32))
    flows = jax.jit(flownet_sd_apply)(params, x)
    assert flows["flow2"].shape == (1, H // 4, W // 4, 2)


def test_fusion_scales(rng):
    params = fusion_init(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.standard_normal((1, H, W, 11)).astype(np.float32))
    flows = jax.jit(fusion_apply)(params, x)
    assert flows["flow0"].shape == (1, H, W, 2)
    assert flows["flow1"].shape == (1, H // 2, W // 2, 2)
    assert flows["flow2"].shape == (1, H // 4, W // 4, 2)


def test_flownet2_cascade(rng):
    params = flownet2_init(jax.random.PRNGKey(0))
    i0, i1 = _imgs(rng)
    flow = jax.jit(flownet2_apply)(params, i0, i1)
    assert flow.shape == (1, H, W, 2)
    assert np.all(np.isfinite(np.asarray(flow)))


def test_normalize_images(rng):
    i0, i1 = _imgs(rng, n=2)
    x0, x1 = jax.jit(normalize_images)(i0, i1)
    # per-sample joint mean removed, scaled to ~[-0.5, 0.5]
    joint = np.stack([np.asarray(x0), np.asarray(x1)], 1)
    means = joint.mean(axis=(1, 2, 3))
    np.testing.assert_allclose(means, 0.0, atol=1e-6)
    assert np.abs(joint).max() <= 1.0


def test_runner_non_divisible_resolution(rng):
    """The run-flownet adaptation contract: odd input sizes work and return
    target-resolution flow (scripts/run-flownet.py:37-48)."""
    params = flownet_s_init(jax.random.PRNGKey(0))
    runner = FlowRunner("flownets", params)
    img0 = rng.uniform(0, 255, (100, 150, 3)).astype(np.float32)
    img1 = rng.uniform(0, 255, (100, 150, 3)).astype(np.float32)
    flow = runner(img0, img1)
    assert flow.shape == (100, 150, 2)
    assert np.all(np.isfinite(flow))


def test_model_registry():
    assert set(MODEL_INITS) == {
        "flownets",
        "flownetc",
        "flownet2-sd",
        "flownet2-cs",
        "flownet2-css",
        "flownet2",
        "dispnetc",
    }


def test_dispnet_c_scales_and_training(rng):
    """DispNetC end to end: 1-channel disparity predictions at strides
    64..4 (the stereo path the reference ships only as layers —
    correlation_layer1d, disparity_data_layer)."""
    from flownet2_tpu.models import dispnet_c_init, dispnet_c_apply
    from flownet2_tpu.train.objectives import dispnet_c_loss

    params = dispnet_c_init(jax.random.PRNGKey(0))
    h, w = 64, 128
    left = jnp.asarray(rng.uniform(-1, 1, (1, h, w, 3)), jnp.float32)
    right = jnp.asarray(rng.uniform(-1, 1, (1, h, w, 3)), jnp.float32)
    preds = jax.jit(dispnet_c_apply)(params, left, right)
    for lvl in (6, 5, 4, 3, 2):
        s = 2 ** lvl
        assert preds[f"flow{lvl}"].shape == (1, h // s, w // s, 1)

    batch = {
        "img0": rng.uniform(0, 255, (1, h, w, 3)).astype(np.float32),
        "img1": rng.uniform(0, 255, (1, h, w, 3)).astype(np.float32),
        "flow": rng.uniform(-30, 0, (1, h, w, 1)).astype(np.float32),
    }
    (loss, aux), grads = jax.jit(
        jax.value_and_grad(dispnet_c_loss, has_aux=True)
    )(params, batch)
    assert np.isfinite(float(loss))
    gnorms = [float(jnp.sum(jnp.abs(g))) for g in jax.tree.leaves(grads)]
    assert all(np.isfinite(g) for g in gnorms)
    assert sum(gnorms) > 0  # gradients reach the siamese towers through corr1d
