"""Quantify the warp_budget truncation of the augmentation distribution.

The TPU fast-path augmentation warp is exact only for affines whose
derivatives fit the Pallas window budget (ops/augment.PALLAS_WARP_BUDGET);
``sample_valid_spatial_coeffs_batch(warp_budget=...)`` therefore rejects the
rotation×zoom-out tail the same way it rejects out-of-frame crops — a REAL
divergence from the reference's unbounded sampler
(augmentation_layer_base.cpp:101-169). This script measures how large that
divergence actually is at the FlowNet2 training configs:

- per-draw truncation: P(budget rejects | corner-valid) — how often a
  candidate the reference would have accepted gets re-drawn;
- per-item outcome delta: fraction of items whose FINAL accepted coeffs
  differ from the unconstrained sampler's (re-draws that changed nothing
  don't matter);
- identity fallbacks added by the budget (items with no valid candidate).

Run: python -m flownet2_tpu.tools.diag.budget_truncation
The numbers feed docs/DESIGN_NOTES.md "warp_budget truncation" and the
documented-divergences list. Schedule discounts (CoeffSchedule ramps the
spread 0.5→1.0 over training) make early-training rates LOWER than the
discount=1.0 worst case reported here.
"""

from __future__ import annotations

import numpy as np

from flownet2_tpu.data.augment_pipeline import FlowNetAugConfig
from flownet2_tpu.ops.augment import (
    PALLAS_WARP_BUDGET,
    _sample_spec_n,
    sample_valid_spatial_coeffs_batch,
    spatial_budget_valid,
    spatial_corner_valid,
)


def draw_candidates(spec, rng, n, discount=1.0):
    """Raw candidate coeffs exactly as the sampler draws them (same spec
    plumbing, no validity filtering)."""
    mirror = _sample_spec_n(spec.mirror, rng, n, discount)
    if spec.translate is not None:
        dx = _sample_spec_n(spec.translate, rng, n, discount)
        dy = _sample_spec_n(spec.translate, rng, n, discount)
    else:
        dx = np.zeros(n)
        dy = np.zeros(n)
    angle = _sample_spec_n(spec.rotate, rng, n, discount)
    zx = _sample_spec_n(spec.zoom, rng, n, discount) if spec.zoom is not None else np.ones(n)
    zy = zx.copy()
    if spec.squeeze is not None:
        sq = _sample_spec_n(spec.squeeze, rng, n, discount)
        zx, zy = zx * sq, zy / sq
    return mirror, dx, dy, angle, zx, zy


def truncation_report(
    *,
    spec,
    crop_h: int,
    crop_w: int,
    src_h: int,
    src_w: int,
    n: int = 200_000,
    discount: float = 1.0,
    seed: int = 0,
    budget=PALLAS_WARP_BUDGET,
) -> dict:
    rng = np.random.default_rng(seed)
    mirror, dx, dy, angle, zx, zy = draw_candidates(spec, rng, n, discount)
    geo = dict(crop_w=crop_w, crop_h=crop_h, src_w=src_w, src_h=src_h)
    corner = spatial_corner_valid(mirror, dx, dy, angle, zx, zy, **geo)
    in_budget = spatial_budget_valid(mirror, angle, zx, zy, budget)
    n_corner = int(corner.sum())
    p_truncated = float((corner & ~in_budget).sum() / max(n_corner, 1))

    # worst-case margin: how close the sampled distribution ever gets to
    # the budget (the bound's LHS, see spatial_budget_valid)
    ca, sa = np.cos(angle), np.sin(angle)
    sgn = np.where(mirror.astype(bool), -1.0, 1.0)
    lhs_h = np.abs(sgn * ca / zx - 1.0) * 127 + np.abs(sa / zx) * 15
    lhs_v = np.abs(sgn * sa / zy) * 127 + np.abs(ca / zy - 1.0) * 15

    # per-item: same rng stream → identical candidate arrays, only the
    # validity mask differs, so coeff differences isolate the budget effect
    n_items = 20_000
    a = sample_valid_spatial_coeffs_batch(
        spec, np.random.default_rng(seed + 1), n_items=n_items,
        discount=discount, warp_budget=None, **geo,
    )
    b = sample_valid_spatial_coeffs_batch(
        spec, np.random.default_rng(seed + 1), n_items=n_items,
        discount=discount, warp_budget=budget, **geo,
    )
    changed = float((np.abs(a - b) > 0).any(axis=1).mean())
    ident = np.asarray([0, 0, 0, 0, 1, 1], np.float32)
    fb_a = float((a == ident).all(axis=1).mean())
    fb_b = float((b == ident).all(axis=1).mean())
    return {
        "corner_accept_rate": n_corner / n,
        "p_budget_rejects_corner_valid_draw": p_truncated,
        "p_item_final_coeffs_changed": changed,
        "identity_fallback_without_budget": fb_a,
        "identity_fallback_with_budget": fb_b,
        "worst_budget_lhs_h_vs_limit": (float(lhs_h.max()), budget[0]),
        "worst_budget_lhs_v_vs_limit": (float(lhs_v.max()), budget[1]),
    }


def main():
    cfg = FlowNetAugConfig()
    cases = [
        # (name, spec, crop, src): the FlowNet2 recipe geometries
        ("frame1 FlyingChairs 512x384->448x320", cfg.spatial, (320, 448), (384, 512)),
        ("frame1 Things3D 960x540->768x384", cfg.spatial, (384, 768), (540, 960)),
        ("frame1 ChairsSDHom 512x384->448x320", cfg.spatial, (320, 448), (384, 512)),
    ]
    for discount in (1.0, 0.5):
        print(f"== discount={discount} "
              f"(CoeffSchedule ramps 0.5 -> 1.0 over training) ==")
        for name, spec, (ch, cw), (sh, sw) in cases:
            r = truncation_report(
                spec=spec, crop_h=ch, crop_w=cw, src_h=sh, src_w=sw,
                discount=discount,
            )
            print(f"{name}:")
            for k, v in r.items():
                if isinstance(v, tuple):
                    print(f"    {k}: {v[0]:.2f} / {v[1]:.0f}")
                else:
                    print(f"    {k}: {v:.5f}")
    print(
        "\nframe2 offsets (spatial_offset, sigma=0.03) compose with frame1; "
        "the sampler applies the SAME budget to the composed coeffs via "
        "base=, so the composed rate is bounded by the frame1 rate at the "
        "next discount notch."
    )


if __name__ == "__main__":
    main()
