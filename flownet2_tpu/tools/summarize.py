"""Net summarization tool (the reference's tools/extra/summarize.py:1-10,
which tabulates a prototxt's layers "to check at a glance that the
computation you've specified is the computation you expect").

Here the net definition is the model registry + parameter pytree rather
than a prototxt, so the table lists every parameterized layer with its
weight/bias shapes and parameter count, per-subnet subtotals for the
cascade models, and the multi-scale output shapes from an abstract
(jax.eval_shape — no FLOPs spent) forward at the requested resolution.

Usage: python -m flownet2_tpu.tools.summarize flownet2 [--height 320]
       [--width 448] [--batch 1]
"""

from __future__ import annotations

import argparse
import sys


def _layer_rows(params: dict, prefix: str = ""):
    """Flatten {layer: {"w": ..., "b": ...}} (possibly nested one level for
    cascade subnets) into (name, w_shape, b_shape, count) rows."""
    rows = []
    for name in params:
        entry = params[name]
        if isinstance(entry, dict) and "w" in entry:
            w, b = entry["w"], entry.get("b")
            count = int(w.size) + (int(b.size) if b is not None else 0)
            rows.append((prefix + name, tuple(w.shape), tuple(b.shape) if b is not None else None, count))
        elif isinstance(entry, dict):
            rows.extend(_layer_rows(entry, prefix=f"{name}/"))
    return rows


def summarize(model: str, height: int, width: int, batch: int, out=sys.stdout):
    import jax
    import jax.numpy as jnp

    from flownet2_tpu.inference import MODEL_INITS, _make_forward

    params = MODEL_INITS[model](jax.random.PRNGKey(0))
    rows = _layer_rows(params)

    name_w = max(len(r[0]) for r in rows) + 1
    print(f"{'layer':<{name_w}} {'weights':<20} {'bias':<10} {'params':>10}", file=out)
    total = 0
    subtotals: dict[str, int] = {}
    for name, ws, bs, count in rows:
        total += count
        if "/" in name:
            subtotals[name.split("/")[0]] = subtotals.get(name.split("/")[0], 0) + count
        print(
            f"{name:<{name_w}} {str(ws):<20} {str(bs) if bs else '-':<10} {count:>10,}",
            file=out,
        )
    for sub, cnt in subtotals.items():
        print(f"{'[' + sub + ']':<{name_w}} {'':<20} {'':<10} {cnt:>10,}", file=out)
    print(f"{'TOTAL':<{name_w}} {'':<20} {'':<10} {total:>10,}", file=out)

    fwd = _make_forward(model)
    img = jax.ShapeDtypeStruct((batch, height, width, 3), jnp.float32)
    shapes = jax.eval_shape(fwd, params, img, img)
    print(f"\noutput @ {width}x{height} (batch {batch}):", file=out)
    print(f"  {jax.tree.map(lambda s: tuple(s.shape), shapes)}", file=out)
    return total


def main(argv=None) -> int:
    from flownet2_tpu.inference import MODEL_INITS

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("model", choices=sorted(MODEL_INITS))
    p.add_argument("--height", type=int, default=320)
    p.add_argument("--width", type=int, default=448)
    p.add_argument("--batch", type=int, default=1)
    args = p.parse_args(argv)
    summarize(args.model, args.height, args.width, args.batch)
    return 0


if __name__ == "__main__":
    sys.exit(main())
