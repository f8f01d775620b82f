"""Warped-image error of the fast warp paths vs the exact gather warp.

Backs the DESIGN_NOTES "Windowed-warp clamp on large motions" tables: the
windowed/Pallas warps clamp bilinear footprints whose INTRA-TILE flow
variation exceeds the source-window budget (~127 px horizontal / ~55 px
vertical; constant offsets are free — the window base follows each tile's
minimum). This script measures the actual image-space error on four flow
classes, textured image in [0,255], 448x1024 (Sintel geometry):

1. 80 px vertical step, tile-aligned      — should be ~free;
2. 160 px horizontal step, tile-aligned   — should be ~free;
3. smooth 60 px field + 150/90 px object  — clamping;
4. Sintel-like statistics (8 px mean background, +-140 px patches).

Run: python -m flownet2_tpu.tools.diag.clamp_quant [--methods windowed,pallas]
(pallas needs a TPU; on CPU only windowed runs). Oracle: flow_warp gather
== reference flow_warp_layer.cpp:58-117, exact everywhere.
"""

from __future__ import annotations

import argparse

import numpy as np


def make_fields(h=448, w=1024, seed=0):
    rng = np.random.default_rng(seed)
    fields = {}
    z = np.zeros((h, w), np.float32)

    v = z.copy()
    v[h // 2:, :] = 80.0  # row 224 is 16-row-tile aligned
    fields["80px vertical step (tile-aligned)"] = np.stack([z, v], -1)

    u = z.copy()
    u[:, w // 2:] = -160.0  # col 512 is 128-col aligned
    fields["160px horizontal step (tile-aligned)"] = np.stack([u, z], -1)

    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    u = 60.0 * np.sin(2 * np.pi * xx / w) * np.cos(2 * np.pi * yy / h)
    v = 60.0 * np.cos(2 * np.pi * xx / w)
    obj = (np.hypot(xx - w * 0.3, yy - h * 0.6) < 70)
    u = np.where(obj, 150.0, u)
    v = np.where(obj, -90.0, v)
    fields["smooth 60px + 150/90px object"] = np.stack([u, v], -1).astype(np.float32)

    u = rng.normal(0, 8, (h, w)).astype(np.float32)
    v = rng.normal(0, 8, (h, w)).astype(np.float32)
    for _ in range(24):  # fast-moving patches, Sintel-ish tails
        cy, cx = rng.integers(0, h), rng.integers(0, w)
        r = rng.integers(20, 60)
        du, dv = rng.uniform(-140, 140, 2)
        m = np.hypot(xx - cx, yy - cy) < r
        u, v = np.where(m, du, u), np.where(m, dv, v)
    fields["Sintel-like stats (8px mean, ±140 patches)"] = np.stack([u, v], -1)

    img = rng.uniform(0, 255, (h, w, 3)).astype(np.float32)
    # texture so clamped taps land on DIFFERENT values (uniform noise alone
    # under-reports: a clamp that lands on another noise pixel looks small)
    img += 120 * np.sin(xx / 7)[..., None] * np.cos(yy / 5)[..., None]
    img = np.clip(img, 0, 255)
    return img, fields


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--methods", default=None,
                   help="comma list of windowed,pallas,onehot (default: "
                        "windowed + pallas-if-TPU)")
    p.add_argument("--dtypes", default="float32,bfloat16")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from flownet2_tpu.ops.warp import flow_warp, warp_clamp_fraction

    on_acc = jax.default_backend() in ("tpu", "axon")
    methods = (
        args.methods.split(",") if args.methods
        else (["windowed", "pallas"] if on_acc else ["windowed"])
    )
    dtypes = args.dtypes.split(",")

    img, fields = make_fields()
    img_j = jnp.asarray(img)[None]

    @jax.jit
    def run(image, flow, method):
        return flow_warp(image, flow, method=method)

    print(f"{'field':42s} {'method':10s} {'dtype':8s} "
          f"{'mean|err|':>9s} {'p99':>7s} {'max':>7s} {'%px>1':>7s} {'clamp%':>7s}")
    for fname, flow in fields.items():
        flow_j = jnp.asarray(flow)[None]
        exact = np.asarray(
            jax.jit(lambda i, f: flow_warp(i, f, method="gather"))(img_j, flow_j)
        ).astype(np.float64)
        for method in methods:
            geom = "pallas" if method == "pallas" else "windowed"
            clamp = float(warp_clamp_fraction(np.asarray(flow_j), geometry=geom)[0])
            for dt in dtypes:
                x = img_j.astype(jnp.bfloat16) if dt == "bfloat16" else img_j
                out = np.asarray(
                    jax.jit(lambda i, f, m=method: flow_warp(i, f, method=m))(
                        x, flow_j
                    )
                ).astype(np.float64)
                err = np.abs(out - exact)
                print(f"{fname:42s} {method:10s} {dt:8s} "
                      f"{err.mean():9.2f} {np.percentile(err, 99):7.1f} "
                      f"{err.max():7.1f} {(err > 1).mean():7.2%} {clamp:7.2%}")


if __name__ == "__main__":
    main()
