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


# ---------------------------------------------------------------------------
# Coefficient arrays + GenerateAugmentationParameters modes
# ---------------------------------------------------------------------------


class TestAugParams:
    """generate_augmentation_parameters_layer.{cpp,cu} semantics."""

    def _specs(self):
        from flownet2_tpu.data.aug_params import AugSpecBundle
        from flownet2_tpu.ops.augment import ChromaticAugSpec, EffectAugSpec

        return AugSpecBundle(
            spatial=SpatialAugSpec(
                translate=RandomSpec("uniform", mean=0.0, spread=0.1),
                rotate=RandomSpec("uniform", mean=0.0, spread=0.1),
                zoom=RandomSpec("uniform", exp=True, mean=0.1, spread=0.1),
            ),
            chromatic=ChromaticAugSpec(
                gamma=RandomSpec("gaussian", exp=True, mean=0.0, spread=0.05),
                brightness=RandomSpec("gaussian", mean=0.0, spread=0.05),
            ),
            effect=EffectAugSpec(noise=RandomSpec("uniform", mean=0.05, spread=0.05)),
        )

    def test_array_round_trip(self, rng):
        from flownet2_tpu.data.aug_params import (
            FullCoeffs,
            array_to_coeffs,
            coeffs_to_array,
            identity_array,
            NUM_COEFFS,
        )
        from flownet2_tpu.ops.augment import ChromaticCoeffs, ChromaticEigenCoeffs

        # identity encodes to all zeros (log(1)=0)
        np.testing.assert_allclose(coeffs_to_array(FullCoeffs.identity()), identity_array())
        assert identity_array().shape == (NUM_COEFFS,)

        c = FullCoeffs(
            SpatialCoeffs(mirror=1.0, dx=0.1, dy=-0.2, angle=0.3, zoom_x=1.5, zoom_y=0.8),
            ChromaticCoeffs(gamma=1.2, brightness=-0.1, contrast=0.9, color=(1.1, 0.95, 1.0)),
            ChromaticEigenCoeffs(lmult_pow=1.3, lmult_add=0.2, col_angle=0.1),
            noise=0.07,
            shadow_strength=0.4,
        )
        rt = array_to_coeffs(coeffs_to_array(c))
        assert rt.spatial.zoom_x == pytest.approx(1.5, rel=1e-6)
        assert rt.spatial.dx == pytest.approx(0.1, abs=1e-7)
        assert rt.chromatic.gamma == pytest.approx(1.2, rel=1e-6)
        assert rt.chromatic.color[1] == pytest.approx(0.95, rel=1e-6)
        assert rt.eigen.lmult_pow == pytest.approx(1.3, rel=1e-6)
        assert rt.noise == pytest.approx(0.07, abs=1e-7)
        assert rt.shadow_strength == pytest.approx(0.4, abs=1e-7)

    def test_log_space_addition_composes_multiplicatively(self):
        from flownet2_tpu.data.aug_params import array_to_coeffs, coeffs_to_array, FullCoeffs
        from flownet2_tpu.ops.augment import ChromaticCoeffs, ChromaticEigenCoeffs

        a = FullCoeffs(SpatialCoeffs(zoom_x=2.0, zoom_y=2.0), ChromaticCoeffs(gamma=1.5), ChromaticEigenCoeffs())
        b = FullCoeffs(SpatialCoeffs(zoom_x=0.5, zoom_y=4.0), ChromaticCoeffs(gamma=2.0), ChromaticEigenCoeffs())
        combined = array_to_coeffs(coeffs_to_array(a) + coeffs_to_array(b))
        assert combined.spatial.zoom_x == pytest.approx(1.0, rel=1e-6)
        assert combined.spatial.zoom_y == pytest.approx(8.0, rel=1e-6)
        assert combined.chromatic.gamma == pytest.approx(3.0, rel=1e-6)

    def test_regenerate_ignores_incoming(self, rng):
        from flownet2_tpu.data.aug_params import (
            array_to_coeffs,
            generate_augmentation_parameters,
            identity_array,
        )

        incoming = identity_array()
        incoming[1] = 123.0  # huge dx that would never pass bounds checking
        geo = dict(crop_w=64, crop_h=48, src_w=128, src_h=96)
        out = generate_augmentation_parameters(
            self._specs(), incoming, mode="regenerate", rng=rng, **geo
        )
        c = array_to_coeffs(out)
        assert abs(c.spatial.dx) < 1.0  # fresh, not 123
        assert crop_fits(c.spatial, **{k: geo[k] for k in ("crop_w", "crop_h", "src_w", "src_h")})

    def test_replace_clears_spatial_keeps_rest_fresh_chromatic(self, rng):
        from flownet2_tpu.data.aug_params import (
            array_to_coeffs,
            coeffs_to_array,
            generate_augmentation_parameters,
            FullCoeffs,
            _INDEX,
        )
        from flownet2_tpu.ops.augment import ChromaticCoeffs, ChromaticEigenCoeffs

        incoming = coeffs_to_array(
            FullCoeffs(
                SpatialCoeffs(dx=0.3, angle=1.0),
                ChromaticCoeffs(gamma=5.0),
                ChromaticEigenCoeffs(lmult_add=0.7),
            )
        )
        geo = dict(crop_w=64, crop_h=48, src_w=256, src_h=192)
        out = generate_augmentation_parameters(
            self._specs(), incoming, mode="replace", rng=rng, **geo
        )
        c = array_to_coeffs(out)
        # spatial was cleared then regenerated small (spec spread 0.1)
        assert abs(c.spatial.dx) < 0.3
        assert abs(c.spatial.angle) < 0.5
        # chromatic overwritten by fresh (gamma near 1, not 5)
        assert c.chromatic.gamma < 2.0
        # eigen not generated by these specs -> incoming kept
        assert c.eigen.lmult_add == pytest.approx(0.7, rel=1e-5)

    def test_add_composes_with_incoming(self, rng):
        from flownet2_tpu.data.aug_params import (
            array_to_coeffs,
            coeffs_to_array,
            generate_augmentation_parameters,
            FullCoeffs,
        )
        from flownet2_tpu.ops.augment import ChromaticCoeffs, ChromaticEigenCoeffs

        incoming = coeffs_to_array(
            FullCoeffs(SpatialCoeffs(dx=0.05), ChromaticCoeffs(gamma=1.5), ChromaticEigenCoeffs())
        )
        geo = dict(crop_w=64, crop_h=48, src_w=256, src_h=192)
        outs = [
            array_to_coeffs(
                generate_augmentation_parameters(
                    self._specs(), incoming, mode="add", rng=rng, **geo
                )
            )
            for _ in range(50)
        ]
        # spatial: fresh dx ~ U(-0.1, 0.1) added onto incoming 0.05
        mean_dx = np.mean([o.spatial.dx for o in outs])
        assert mean_dx == pytest.approx(0.05, abs=0.03)
        # chromatic: fresh gamma (exp-gaussian around 1) composed onto 1.5
        mean_gamma = np.exp(np.mean([np.log(o.chromatic.gamma) for o in outs]))
        assert mean_gamma == pytest.approx(1.5, rel=0.1)
        # effect: noise regenerated each time, in the spec's range
        assert all(0.0 <= o.noise <= 0.11 for o in outs)

    def test_add_rejection_respects_bounds(self, rng):
        from flownet2_tpu.data.aug_params import (
            array_to_coeffs,
            coeffs_to_array,
            generate_augmentation_parameters,
            FullCoeffs,
        )
        from flownet2_tpu.ops.augment import ChromaticCoeffs, ChromaticEigenCoeffs

        # incoming translation near the edge: composed result must still fit
        incoming = coeffs_to_array(
            FullCoeffs(SpatialCoeffs(dx=0.2), ChromaticCoeffs(), ChromaticEigenCoeffs())
        )
        geo = dict(crop_w=64, crop_h=48, src_w=96, src_h=72)
        for _ in range(20):
            out = generate_augmentation_parameters(
                self._specs(), incoming, mode="add", rng=rng, **geo
            )
            c = array_to_coeffs(out).spatial
            assert crop_fits(c, 64, 48, 96, 72)

    def test_batch_generator(self, rng):
        from flownet2_tpu.data.aug_params import (
            NUM_COEFFS,
            generate_augmentation_parameters_batch,
        )

        out = generate_augmentation_parameters_batch(
            self._specs(), None, 4, mode="add", rng=rng,
            crop_w=64, crop_h=48, src_w=128, src_h=96,
        )
        assert out.shape == (4, NUM_COEFFS)
        assert not np.allclose(out[0], out[1])  # per-item sampling


# ---------------------------------------------------------------------------
# Running-mean recompute + mean subtraction
# ---------------------------------------------------------------------------


class TestMeanRecompute:
    """data_augmentation_layer.cu:592-635 recursion + subtraction modes."""

    def test_running_mean_matches_reference_recursion(self, rng):
        from flownet2_tpu.data.mean import MeanRecompute, recompute_mean_and_subtract

        h, w, c = 8, 10, 3
        mr = MeanRecompute(h, w, c, window=5, per_pixel=True)
        batches = [rng.uniform(0, 1, (4, h, w, c)).astype(np.float32) for _ in range(8)]

        # oracle: the reference recursion in pure numpy, frozen after window
        mean = np.zeros((h, w, c), np.float32)
        for t, b in enumerate(batches, start=1):
            bm = b.mean(axis=0)
            if t <= 5:
                mean = (mean * (t - 1) + bm) / t
            batch = mr.attach({"x": b})
            out, got_bm = recompute_mean_and_subtract(
                jnp.asarray(b), jnp.asarray(batch["mean_image0"]),
                jnp.asarray(batch["mean_iter"]), window=5, per_pixel=True,
            )
            np.testing.assert_allclose(np.asarray(got_bm), bm, rtol=1e-5)
            np.testing.assert_allclose(np.asarray(out), b - mean, rtol=1e-4, atol=1e-5)
            mr.update(np.asarray(got_bm))
            np.testing.assert_allclose(mr.mean, mean, rtol=1e-5)

    def test_per_channel_subtraction(self, rng):
        from flownet2_tpu.data.mean import recompute_mean_and_subtract

        b = rng.uniform(0, 1, (2, 4, 4, 3)).astype(np.float32)
        mean = rng.uniform(0, 1, (4, 4, 3)).astype(np.float32)
        out, bm = recompute_mean_and_subtract(
            jnp.asarray(b), jnp.asarray(mean), jnp.asarray(3, jnp.int32),
            window=2, per_pixel=False,
        )
        # iteration 3 > window 2: mean frozen; per-channel average subtracted
        expect = b - mean.mean(axis=(0, 1), keepdims=True)
        np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-5)

    def test_fixed_rgb_mean(self, rng):
        from flownet2_tpu.data.mean import subtract_fixed_mean

        b = rng.uniform(0, 1, (2, 4, 4, 3)).astype(np.float32)
        out = subtract_fixed_mean(jnp.asarray(b), [0.4, 0.3, 0.2])
        np.testing.assert_allclose(
            np.asarray(out), b - np.asarray([0.4, 0.3, 0.2], np.float32), rtol=1e-6
        )

    def test_mean_file_round_trip(self, tmp_path, rng):
        from flownet2_tpu.data.mean import MeanRecompute

        mr = MeanRecompute(6, 8, 3, window=2)
        mr.update(rng.uniform(0, 1, (6, 8, 3)).astype(np.float32))
        path = str(tmp_path / "mean.float3")
        mr.write_mean(path)
        loaded = MeanRecompute.from_mean_file(path)
        np.testing.assert_allclose(loaded.mean, mr.mean, rtol=1e-6)
        # frozen: update must not change it
        frozen = loaded.mean.copy()
        loaded.update(np.ones((6, 8, 3), np.float32))
        np.testing.assert_allclose(loaded.mean, frozen)

    def test_augmented_loss_surfaces_batch_mean(self, rng):
        from flownet2_tpu.data.augment_pipeline import (
            make_augmented_loss,
            make_flownet_augmenter,
        )
        from flownet2_tpu.data.mean import MeanRecompute

        def base_loss(params, batch):
            return jnp.mean(batch["img0"]), {}

        loss_fn = make_augmented_loss(base_loss, 32, 48, mean_window=4, mean_per_pixel=True)
        batch = {
            "img0": rng.uniform(0, 255, (2, 48, 64, 3)).astype(np.float32),
            "img1": rng.uniform(0, 255, (2, 48, 64, 3)).astype(np.float32),
            "flow": rng.uniform(-2, 2, (2, 48, 64, 2)).astype(np.float32),
        }
        batch = make_flownet_augmenter(32, 48)(batch, rng)
        mr0 = MeanRecompute(32, 48, 3, window=4, per_pixel=True)
        batch = mr0.attach(batch, key="mean_image0")
        loss, aux = jax.jit(loss_fn)(({},), batch)
        assert "aug_batch_mean0" in aux
        assert np.asarray(aux["aug_batch_mean0"]).shape == (32, 48, 3)
        mr0.update(np.asarray(aux["aug_batch_mean0"]))
        assert mr0.num_iter == 1
        assert np.isfinite(float(loss))


def test_write_augmented_dumps(tmp_path, rng):
    """write_augmented (caffe.proto:492): coefficient log + image dumps."""
    from flownet2_tpu.data.augment_pipeline import make_flownet_augmenter, write_augmented
    from flownet2_tpu.core.flow_io import read_ppm

    batch = {
        "img0": rng.uniform(0, 255, (2, 48, 64, 3)).astype(np.float32),
        "img1": rng.uniform(0, 255, (2, 48, 64, 3)).astype(np.float32),
        "flow": rng.uniform(-2, 2, (2, 48, 64, 2)).astype(np.float32),
    }
    batch = make_flownet_augmenter(32, 48)(batch, rng)
    lines = []
    paths = write_augmented(batch, str(tmp_path), 7, 32, 48, log=lines.append)
    assert len(paths) == 4  # 2 items x 2 frames
    assert len(lines) == 2 and "gamma" in lines[0]
    img = read_ppm(paths[0])
    assert img.shape == (32, 48, 3)
    assert all("0000007" in p for p in paths)
