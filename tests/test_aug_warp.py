"""The TPU augmentation warp fast path (ops/augment.py: apply_spatial_
transform(method="warp"), apply_flow_augmentation(method="warp"),
_nearest_sample_warp, and the sampler's warp_budget rejection).

On TPU these route the device-side spatial sample through the MXU warp
instead of gathers; off-accelerator the warp path uses the exact gather
warp, so CPU equality with method="exact" pins the routing layer (the
value-quantization deltas of the bf16 Pallas kernel are covered separately
by tests/test_warp_clamp.py + the tpu-marked kernel tests).
Reference semantics: data_augmentation_layer.cu:25-70 (spatial),
flow_augmentation_layer.cu:24-89 (flow).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from flownet2_tpu.ops.augment import (
    PALLAS_WARP_BUDGET,
    RandomSpec,
    SpatialAugSpec,
    SpatialCoeffs,
    _affine_positions,
    _nearest_sample_warp,
    apply_flow_augmentation,
    apply_spatial_transform,
    invert_affine,
    sample_valid_spatial_coeffs_batch,
    spatial_matrix,
)
from flownet2_tpu.ops.warp import warp_clamp_fraction


def _sample_mats(rng, n, crop_h, crop_w, src_h, src_w, spec=None, budget=None):
    spec = spec or SpatialAugSpec(
        translate=RandomSpec("uniform", mean=0.0, spread=0.3),
        rotate=RandomSpec("uniform", mean=0.0, spread=0.5),
        zoom=RandomSpec("uniform", exp=True, mean=0.1, spread=0.4),
        squeeze=RandomSpec("uniform", exp=True, mean=0.0, spread=0.2),
    )
    coeffs = sample_valid_spatial_coeffs_batch(
        spec, rng, n_items=n, crop_w=crop_w, crop_h=crop_h,
        src_w=src_w, src_h=src_h, warp_budget=budget,
    )
    return np.stack(
        [
            spatial_matrix(
                SpatialCoeffs(*(float(v) for v in row)), crop_w, crop_h, src_w, src_h
            )
            for row in coeffs
        ]
    ), coeffs


def test_spatial_transform_warp_matches_exact(rng):
    """method="warp" == method="exact" on CPU (the gather backend makes the
    flow-formulated sample the same 4-tap bilinear read)."""
    src_h, src_w, crop_h, crop_w = 96, 128, 64, 64
    mats, _ = _sample_mats(rng, 3, crop_h, crop_w, src_h, src_w)
    imgs = rng.uniform(0, 1, (3, src_h, src_w, 3)).astype(np.float32)
    exact = np.asarray(
        apply_spatial_transform(jnp.asarray(imgs), jnp.asarray(mats), crop_h, crop_w,
                                method="exact")
    )
    warp = np.asarray(
        apply_spatial_transform(jnp.asarray(imgs), jnp.asarray(mats), crop_h, crop_w,
                                method="warp")
    )
    assert exact.shape == warp.shape == (3, crop_h, crop_w, 3)
    np.testing.assert_allclose(warp, exact, atol=2e-6, rtol=0)


def test_flow_augmentation_warp_matches_exact(rng):
    """The GT-flow transform: method="warp"'s integer-position one-hot
    sample must equal the gather nearest-sample BIT-exactly (EPE parity),
    including NaN-encoded invalid pixels."""
    src_h, src_w, crop_h, crop_w = 96, 128, 64, 64
    mats0, _ = _sample_mats(rng, 2, crop_h, crop_w, src_h, src_w)
    mats1, _ = _sample_mats(rng, 2, crop_h, crop_w, src_h, src_w)
    inv1 = np.stack([invert_affine(m) for m in mats1])
    flows = rng.uniform(-30, 30, (2, src_h, src_w, 2)).astype(np.float32)
    # item 0: whole u-channel invalid — every crop placement must sample NaN
    flows[0, :, :, 0] = np.nan
    flows[1, 10:20, 30:50, :] = np.nan  # invalid GT block (may or may not be hit)

    out_exact = np.asarray(
        apply_flow_augmentation(jnp.asarray(flows), jnp.asarray(mats0),
                                jnp.asarray(inv1), crop_h, crop_w, method="exact")
    )
    out_warp = np.asarray(
        apply_flow_augmentation(jnp.asarray(flows), jnp.asarray(mats0),
                                jnp.asarray(inv1), crop_h, crop_w, method="warp")
    )
    # NaN pattern identical, values bit-exact
    np.testing.assert_array_equal(np.isnan(out_exact), np.isnan(out_warp))
    np.testing.assert_array_equal(
        out_exact[~np.isnan(out_exact)], out_warp[~np.isnan(out_warp)]
    )
    assert np.isnan(out_exact).any()  # the NaN region really was sampled


def test_nearest_sample_warp_identity_passthrough(rng):
    """Identity affine: values (incl. NaN) pass through bit-exactly."""
    h, w = 64, 128
    vals = rng.uniform(-100, 100, (1, h, w, 2)).astype(np.float32)
    vals[0, 5, 7, 0] = np.nan
    ident = np.array([[1, 0, 0, 1, 0, 0]], np.float32)
    out = np.asarray(_nearest_sample_warp(jnp.asarray(vals), jnp.asarray(ident)))
    np.testing.assert_array_equal(out, vals)


def test_warp_budget_rejection_keeps_fast_path_exact(rng):
    """Property test of the sampler's hand-derived derivative bound
    (sample_valid_spatial_coeffs_batch warp_budget): every ACCEPTED affine,
    expressed as the position flow the fast path actually warps with, must
    have warp_clamp_fraction == 0 on the Pallas tile geometry — i.e. the
    budget is sound and device-side augmentation warps are exact."""
    src_h, src_w, crop_h, crop_w = 384, 512, 64, 64
    # heavy rotation x zoom-out tail: small crops keep the corner-validity
    # test permissive so only the budget can save the fast path
    spec = SpatialAugSpec(
        translate=RandomSpec("uniform", mean=0.0, spread=0.2),
        rotate=RandomSpec("uniform", mean=0.0, spread=1.2),
        zoom=RandomSpec("uniform", exp=True, mean=-0.5, spread=0.5),
    )
    mats, _ = _sample_mats(rng, 48, crop_h, crop_w, src_h, src_w,
                           spec=spec, budget=PALLAS_WARP_BUDGET)
    u, v = _affine_positions(jnp.asarray(mats), src_h, src_w)
    posflow = np.stack([np.asarray(u), np.asarray(v)], axis=-1)
    frac = warp_clamp_fraction(posflow, geometry="pallas")
    assert frac.max() == 0.0, f"budget-accepted affine clamps: {frac}"

    # non-vacuous: WITHOUT the budget the same distribution does produce
    # affines the fast path would clamp
    mats_nb, _ = _sample_mats(rng, 48, crop_h, crop_w, src_h, src_w,
                              spec=spec, budget=None)
    u, v = _affine_positions(jnp.asarray(mats_nb), src_h, src_w)
    posflow = np.stack([np.asarray(u), np.asarray(v)], axis=-1)
    assert warp_clamp_fraction(posflow, geometry="pallas").max() > 0.0
