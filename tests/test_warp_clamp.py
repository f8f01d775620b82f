"""Clamp contract of the fast-path warps on large motions (VERDICT r3
next.3): the windowed/Pallas warps are exact while INTRA-TILE flow
variation fits the window budgets; outliers clamp to the window edge.
These tests pin (a) the `warp_clamp_fraction` diagnostic against the
geometry it models, (b) that zero predicted violations really means
bit-level agreement with the exact gather warp, and (c) that when a
motion boundary does cross a tile, the divergence stays confined to the
violating tiles. The on-TPU image-space error tables (Pallas + windowed,
f32 + bf16, Sintel-like fields) live in docs/DESIGN_NOTES.md
(scratch/clamp_quant.py).
"""

import numpy as np
import pytest

from flownet2_tpu.ops.warp import (
    flow_warp_gather,
    flow_warp_windowed,
    warp_clamp_fraction,
)

H, W = 160, 256


def _textured(rng, h=H, w=W, c=3):
    img = rng.uniform(0, 255, (1, h, w, c)).astype(np.float32)
    return img


def test_smooth_flow_no_violations_and_exact(rng):
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
    f = np.zeros((1, H, W, 2), np.float32)
    f[0, :, :, 0] = 20 * np.sin(ys / H * np.pi)  # smooth, well within budget
    f[0, :, :, 1] = 10 * np.cos(xs / W * np.pi)
    for geom in ("pallas", "windowed"):
        assert warp_clamp_fraction(f, geometry=geom).max() == 0.0
    img = _textured(rng)
    got = np.asarray(flow_warp_windowed(img, f))
    want = np.asarray(flow_warp_gather(img, f))
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_tile_aligned_motion_boundary_is_free(rng):
    # step at a multiple of both tile heights (8 and 16): no tile sees both
    # sides, so an 80-px discontinuity costs nothing
    f = np.zeros((1, H, W, 2), np.float32)
    f[0, :48, :, 1] = 80.0
    for geom in ("pallas", "windowed"):
        assert warp_clamp_fraction(f, geometry=geom).max() == 0.0
    img = _textured(rng)
    got = np.asarray(flow_warp_windowed(img, f))
    want = np.asarray(flow_warp_gather(img, f))
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_misaligned_boundary_clamps_only_the_boundary_tiles(rng):
    # step inside a tile: rows 48-51 share a tile with rows 52-55 but sample
    # 90 px away (in-bounds at H=160), violating both budgets (62 windowed,
    # 78 pallas after 8-row base alignment)
    f = np.zeros((1, H, W, 2), np.float32)
    f[0, :52, :, 1] = 90.0
    frac_w = warp_clamp_fraction(f, geometry="windowed")[0]
    frac_p = warp_clamp_fraction(f, geometry="pallas")[0]
    # violations exist but are confined to one tile-row band
    assert 0.0 < frac_w <= 8 / H
    assert 0.0 < frac_p <= 16 / H
    img = _textured(rng)
    got = np.asarray(flow_warp_windowed(img, f))
    want = np.asarray(flow_warp_gather(img, f))
    err_rows = np.abs(got - want).max(axis=(0, 2, 3))
    # divergence only on the violating rows of the boundary tile (48-51:
    # their samples sit 90 px below the tile base; 52+ define the base)
    assert err_rows[:48].max() <= 2e-3
    assert err_rows[52:].max() <= 2e-3
    assert err_rows[48:52].max() > 1.0  # the clamp is real there


def test_fraction_scales_with_boundary_density(rng):
    rng_f = np.random.default_rng(0)
    f = np.zeros((1, H, W, 2), np.float32)
    f[0, :, :, 1] = 4 * np.sin(np.arange(W, dtype=np.float32) / 40)[None, :]
    for _ in range(4):  # random fast patches, boundaries everywhere
        y0, x0 = int(rng_f.integers(0, H - 24)), int(rng_f.integers(0, W - 48))
        f[0, y0 : y0 + 24, x0 : x0 + 48, 1] += float(rng_f.uniform(60, 90))
    frac = warp_clamp_fraction(f, geometry="pallas")[0]
    assert 0.0 < frac < 0.25
    # the diagnostic predicts where the fast path diverges: every pixel
    # outside ANY violating tile matches gather exactly
    fw = warp_clamp_fraction(f, geometry="windowed")[0]
    assert 0.0 < fw < 0.25
