"""Augmentation engine tests: coefficient distributions, affine composition,
paired image/flow consistency."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from flownet2_tpu.ops.augment import (
    CoeffSchedule,
    RandomSpec,
    SpatialAugSpec,
    SpatialCoeffs,
    apply_black_augmentation,
    apply_chromatic_transform,
    apply_flow_augmentation,
    apply_gaussian_noise,
    apply_spatial_transform,
    crop_fits,
    invert_affine,
    sample_valid_spatial_coeffs,
    spatial_matrix,
)
from flownet2_tpu.data.augment_pipeline import (
    FlowNetAugConfig,
    apply_augmentation_device,
    make_flownet_augmenter,
)


class TestRandomSpec:
    def test_uniform_bounds(self, rng):
        spec = RandomSpec("uniform", mean=1.0, spread=0.5)
        vals = [spec.sample(rng) for _ in range(200)]
        assert all(0.5 <= v <= 1.5 for v in vals)

    def test_exp(self, rng):
        spec = RandomSpec("uniform", mean=0.0, spread=0.0, exp=True)
        assert spec.sample(rng) == pytest.approx(1.0)

    def test_spread_discount(self, rng):
        spec = RandomSpec("uniform", mean=0.0, spread=1.0)
        vals = [spec.sample(rng, discount=0.1) for _ in range(100)]
        assert all(abs(v) <= 0.1 + 1e-9 for v in vals)

    def test_bernoulli(self, rng):
        spec = RandomSpec("bernoulli", prob=1.0)
        assert spec.sample(rng) == 1.0
        spec = RandomSpec("bernoulli", prob=0.0)
        assert spec.sample(rng) == 0.0

    def test_uniform_bernoulli_prob0(self, rng):
        spec = RandomSpec("uniform_bernoulli", mean=5.0, spread=0.0, prob=0.0)
        # prob=0 => returns prob0_value when given (rng.cpp:50-62)
        assert spec.sample(rng, prob0_value=7.0) == 7.0
        # NaN prob0 => falls back to 0 path (then exp/multiplier applied)
        assert spec.sample(rng) == 0.0

    def test_discretize_multiplier(self, rng):
        spec = RandomSpec("uniform", mean=1.4, spread=0.0, discretize=True, multiplier=3.0)
        assert spec.sample(rng) == pytest.approx(3.0)


def test_coeff_schedule():
    s = CoeffSchedule(half_life=100, initial_coeff=0.0, final_coeff=1.0)
    assert s.at(0) == pytest.approx(0.0)
    assert s.at(100) == pytest.approx(0.5, abs=1e-3)  # -1.0986=-ln(3): sigmoid hits 1/2
    assert s.at(10**7) == pytest.approx(1.0, abs=1e-6)


class TestAffine:
    def test_identity_roundtrip(self):
        c = SpatialCoeffs()
        m = spatial_matrix(c, 10, 8, 10, 8)
        # identity coeffs with equal crop/src => pure centering cancels
        pt = np.asarray([3.0, 5.0])
        x = m[0] * pt[0] + m[2] * pt[1] + m[4]
        y = m[1] * pt[0] + m[3] * pt[1] + m[5]
        np.testing.assert_allclose([x, y], pt, atol=1e-5)

    def test_inverse(self):
        c = SpatialCoeffs(dx=0.1, dy=-0.05, angle=0.3, zoom_x=1.2, zoom_y=0.9)
        m = spatial_matrix(c, 20, 16, 32, 24)
        mi = invert_affine(m)
        # m ∘ mi == identity
        x, y = 7.0, 11.0
        xs = m[0] * x + m[2] * y + m[4]
        ys = m[1] * x + m[3] * y + m[5]
        xr = mi[0] * xs + mi[2] * ys + mi[4]
        yr = mi[1] * xs + mi[3] * ys + mi[5]
        np.testing.assert_allclose([xr, yr], [x, y], atol=1e-4)

    def test_crop_fits(self):
        assert crop_fits(SpatialCoeffs(), 16, 16, 32, 32)
        assert not crop_fits(SpatialCoeffs(dx=2.0), 16, 16, 32, 32)
        assert not crop_fits(SpatialCoeffs(zoom_x=0.1, zoom_y=0.1), 16, 16, 20, 20)

    def test_rejection_sampling_stays_valid(self, rng):
        spec = SpatialAugSpec(
            translate=RandomSpec("uniform", mean=0.0, spread=0.4),
            rotate=RandomSpec("uniform", mean=0.0, spread=0.4),
            zoom=RandomSpec("uniform", exp=True, mean=0.2, spread=0.4),
        )
        for _ in range(20):
            c = sample_valid_spatial_coeffs(
                spec, rng, crop_w=32, crop_h=24, src_w=64, src_h=48
            )
            assert crop_fits(c, 32, 24, 64, 48)


class TestDeviceApplication:
    def test_identity_spatial_transform(self, rng):
        img = jnp.asarray(rng.standard_normal((2, 8, 10, 3)).astype(np.float32))
        m = np.tile(spatial_matrix(SpatialCoeffs(), 10, 8, 10, 8), (2, 1))
        out = apply_spatial_transform(img, jnp.asarray(m), 8, 10)
        # last row/col are blended by the reference's clamp-to-(size-1.05)
        # convention (data_augmentation_layer.cu:44-46), so compare interior
        np.testing.assert_allclose(
            np.asarray(out)[:, :-1, :-1], np.asarray(img)[:, :-1, :-1], atol=1e-4
        )

    def test_translation_shifts_content(self, rng):
        img = np.zeros((1, 16, 16, 1), np.float32)
        img[0, 8, 8, 0] = 1.0
        # dx=0.25 of crop width 16 => source x = x + 4 (translate before center-undo)
        c = SpatialCoeffs(dx=4 / 16.0)
        m = spatial_matrix(c, 16, 16, 16, 16)[None]
        out = np.asarray(apply_spatial_transform(jnp.asarray(img), jnp.asarray(m), 16, 16))
        assert out[0, 8, 4, 0] == pytest.approx(1.0, abs=1e-4)

    def test_flow_augmentation_identity(self, rng):
        flow = jnp.asarray(rng.uniform(-2, 2, (1, 12, 12, 2)).astype(np.float32))
        ident = spatial_matrix(SpatialCoeffs(), 12, 12, 12, 12)
        m = jnp.asarray(ident[None])
        inv = jnp.asarray(invert_affine(ident)[None])
        out = apply_flow_augmentation(flow, m, inv, 12, 12)
        np.testing.assert_allclose(np.asarray(out), np.asarray(flow), atol=1e-4)

    def test_flow_augmentation_pure_translation(self):
        """If both frames translate identically, flow is unchanged (sampled
        at the shifted source position)."""
        h = w = 16
        flow = np.zeros((1, h, w, 2), np.float32)
        flow[..., 0] = 1.0  # uniform flow
        c = SpatialCoeffs(dx=2 / w)
        m = spatial_matrix(c, w, h, w, h)
        out = apply_flow_augmentation(
            jnp.asarray(flow), jnp.asarray(m[None]), jnp.asarray(invert_affine(m)[None]), h, w
        )
        np.testing.assert_allclose(np.asarray(out), flow, atol=1e-4)

    def test_chromatic_identity(self, rng):
        img = jnp.asarray(rng.uniform(0, 1, (2, 6, 6, 3)).astype(np.float32))
        out = apply_chromatic_transform(
            img,
            jnp.ones((2,)),
            jnp.zeros((2,)),
            jnp.ones((2,)),
            jnp.ones((2, 3)),
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)

    def test_chromatic_brightness(self, rng):
        img = jnp.full((1, 4, 4, 3), 0.4)
        out = apply_chromatic_transform(
            img, jnp.ones((1,)), jnp.full((1,), 0.2), jnp.ones((1,)), jnp.ones((1, 3))
        )
        np.testing.assert_allclose(np.asarray(out), 0.6, atol=1e-5)

    def test_noise_statistics(self, rng):
        img = jnp.full((1, 64, 64, 3), 0.5)
        out = apply_gaussian_noise(img, jnp.full((1,), 0.1), jax.random.PRNGKey(0))
        delta = np.asarray(out) - 0.5
        assert 0.05 < delta.std() < 0.15

    def test_black_augmentation(self, rng):
        imgs = jnp.ones((2, 8, 8, 3))
        flows = jnp.ones((2, 8, 8, 2))
        black = jnp.asarray([1.0, 0.0])
        border = jnp.asarray([0.0, 0.25])
        oi, of = apply_black_augmentation(imgs, flows, black, border)
        assert float(jnp.sum(oi[0])) == 0.0  # fully blacked
        oi1 = np.asarray(oi[1])
        assert oi1[0, 0, 0] == 0.0  # border zeroed
        assert oi1[4, 4, 0] == 1.0  # interior kept


class TestPipeline:
    def test_host_transform_and_device_apply(self, rng):
        n, src_h, src_w = 2, 48, 64
        crop_h, crop_w = 32, 40
        batch = {
            "img0": rng.uniform(0, 255, (n, src_h, src_w, 3)).astype(np.float32),
            "img1": rng.uniform(0, 255, (n, src_h, src_w, 3)).astype(np.float32),
            "flow": rng.uniform(-3, 3, (n, src_h, src_w, 2)).astype(np.float32),
        }
        tf = make_flownet_augmenter(crop_h, crop_w)
        batch = tf(batch, rng)
        assert batch["aug_mat0"].shape == (n, 6)
        out = jax.jit(
            lambda b: apply_augmentation_device(b, jax.random.PRNGKey(0), crop_h, crop_w)
        )(batch)
        assert out["img0"].shape == (n, crop_h, crop_w, 3)
        assert out["flow"].shape == (n, crop_h, crop_w, 2)
        assert np.all(np.isfinite(np.asarray(out["flow"])))
        assert 0.0 <= float(jnp.min(out["img0"]))
        assert float(jnp.max(out["img0"])) <= 255.0


class TestChromaticEigen:
    def test_identity_coeffs(self, rng):
        from flownet2_tpu.ops.augment import apply_chromatic_eigen_transform

        n = 2
        imgs = jnp.asarray(rng.uniform(0, 1, (n, 8, 8, 3)).astype(np.float32))
        coeffs = {
            "pow_nomean": np.ones((n, 3), np.float32),
            "add_nomean": np.zeros((n, 3), np.float32),
            "mult_nomean": np.ones((n, 3), np.float32),
            "pow_withmean": np.ones((n, 3), np.float32),
            "add_withmean": np.zeros((n, 3), np.float32),
            "mult_withmean": np.ones((n, 3), np.float32),
            "lmult_pow": np.ones((n,), np.float32),
            "lmult_add": np.zeros((n,), np.float32),
            "lmult_mult": np.ones((n,), np.float32),
            "col_angle": np.zeros((n,), np.float32),
        }
        out = apply_chromatic_eigen_transform(imgs, {k: jnp.asarray(v) for k, v in coeffs.items()})
        # identity coefficients reproduce the input up to ~1%: the published
        # chromatic_eigvec values are rounded to 2 decimals, so the
        # eigvec^T·eigvec roundtrip is only approximately orthonormal —
        # the reference kernel has the identical property.
        np.testing.assert_allclose(np.asarray(out), np.asarray(imgs), atol=2e-2)

    def test_sampler_mapping(self, rng):
        from flownet2_tpu.ops.augment import ChromaticEigenAugSpec, RandomSpec

        spec = ChromaticEigenAugSpec(
            sat_pow=RandomSpec("uniform", mean=2.0, spread=0.0),
            col_rotate=RandomSpec("uniform", mean=0.5, spread=0.0),
            ladd_add=RandomSpec("uniform", mean=0.1, spread=0.0),
        )
        c = spec.sample(rng)
        assert c.pow_withmean == (1.0, 2.0, 2.0)  # sat drives channels 1,2
        assert c.add_nomean == (0.1, 0.0, 0.0)  # ladd drives channel 0
        assert c.col_angle == 0.5

    def test_brightness_changes_output(self, rng):
        from flownet2_tpu.ops.augment import apply_chromatic_eigen_transform

        n = 1
        imgs = jnp.asarray(rng.uniform(0.2, 0.8, (n, 8, 8, 3)).astype(np.float32))
        coeffs = {
            "pow_nomean": np.ones((n, 3), np.float32),
            "add_nomean": np.zeros((n, 3), np.float32),
            "mult_nomean": np.ones((n, 3), np.float32),
            "pow_withmean": np.ones((n, 3), np.float32),
            "add_withmean": np.zeros((n, 3), np.float32),
            "mult_withmean": np.ones((n, 3), np.float32),
            "lmult_pow": np.ones((n,), np.float32),
            "lmult_add": np.zeros((n,), np.float32),
            "lmult_mult": np.full((n,), 1.5, np.float32),  # brighten
            "col_angle": np.zeros((n,), np.float32),
        }
        out = apply_chromatic_eigen_transform(imgs, {k: jnp.asarray(v) for k, v in coeffs.items()})
        assert float(jnp.mean(out)) > float(jnp.mean(imgs))


def test_shadow_effect(rng):
    from flownet2_tpu.ops.augment import apply_shadow

    img = jnp.full((1, 8, 8, 3), 0.8)
    out = apply_shadow(
        img,
        jnp.asarray([1.0]),  # nx: shadow on the right half-plane
        jnp.asarray([0.0]),
        jnp.asarray([0.0]),
        jnp.asarray([0.3]),
    )
    o = np.asarray(out)
    assert o[0, 4, 7, 0] == pytest.approx(0.5, abs=1e-6)  # shaded
    assert o[0, 4, 0, 0] == pytest.approx(0.8, abs=1e-6)  # unshaded


def test_vectorized_sampler_valid_and_fast(rng):
    from flownet2_tpu.ops.augment import (
        SpatialCoeffs,
        crop_fits,
        sample_valid_spatial_coeffs_batch,
    )
    from flownet2_tpu.data.augment_pipeline import FlowNetAugConfig

    cfg = FlowNetAugConfig()
    out = sample_valid_spatial_coeffs_batch(
        cfg.spatial, rng, n_items=16, crop_w=448, crop_h=320, src_w=512, src_h=384
    )
    assert out.shape == (16, 6)
    for row in out:
        c = SpatialCoeffs(*(float(v) for v in row))
        assert crop_fits(c, 448, 320, 512, 384)
