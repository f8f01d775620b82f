"""Eval-path warp exactness (VERDICT r4 next.5): force_warp_method routing,
FlowRunner(warp_method=...), and the cli/test.py / eval_parity exact-by-
construction defaults.

The fast warp paths (pallas/windowed) clamp targets whose per-tile flow
variation exceeds the window budget — measured 1.5% of pixels at mean image
error 0.79 on Sintel-statistics flows (docs/DESIGN_NOTES.md "Windowed-warp
clamp"). The reference warp is exact everywhere (flow_warp_layer.cpp:58-117),
so evaluation commands must route every internal warp to the gather path.
"""

import io
import contextlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flownet2_tpu.ops.warp import (
    flow_warp,
    force_warp_method,
    warp_clamp_fraction,
)


def _clamping_case(rng):
    """A flow whose in-tile variation exceeds the fast paths' vertical
    window budget (~55 px within one row-tile): valid targets (never
    filled), but both the pallas (VW=80) and windowed (VW=64) geometries
    must clamp some footprints to the window edge."""
    h, w = 128, 256
    img = rng.uniform(0, 1, (1, h, w, 3)).astype(np.float32)
    v = np.zeros((h, w), np.float32)
    v[0:8, 1::2] = 100.0  # odd columns of the first row-tile jump +100 px
    flow = np.stack([np.zeros_like(v), v], axis=-1)[None]
    for geom in ("pallas", "windowed"):
        assert warp_clamp_fraction(flow, geometry=geom).max() > 0, geom
    return jnp.asarray(img), jnp.asarray(flow)


def test_force_warp_method_reroutes_auto(rng):
    img, flow = _clamping_case(rng)
    g = np.asarray(flow_warp(img, flow, method="gather"))
    wdw = np.asarray(flow_warp(img, flow, method="windowed"))
    # non-vacuous: the fast path clamps, the exact path doesn't
    assert np.abs(g - wdw).max() > 1e-3

    # CPU auto resolves to gather...
    np.testing.assert_array_equal(np.asarray(flow_warp(img, flow)), g)
    # ...unless forced
    with force_warp_method("windowed"):
        np.testing.assert_array_equal(np.asarray(flow_warp(img, flow)), wdw)
        # explicit methods are untouched by the override
        np.testing.assert_array_equal(
            np.asarray(flow_warp(img, flow, method="gather")), g
        )
    # the override is scoped
    np.testing.assert_array_equal(np.asarray(flow_warp(img, flow)), g)


def test_flow_runner_warp_method_active_at_trace(rng, monkeypatch):
    """FlowRunner(warp_method=...) holds the override while the cascade's
    internal warps TRACE (models/flownet2.py flow_warp call sites)."""
    from flownet2_tpu.models import flownet2
    from flownet2_tpu.ops import warp as warp_mod
    from flownet2_tpu.inference import FlowRunner
    from flownet2_tpu.models import flownet2_init

    seen = []

    def recorder(image, flow, fill_value=0.0, *, method="auto"):
        seen.append(getattr(warp_mod._method_override, "method", None))
        return warp_mod.flow_warp(image, flow, fill_value, method=method)

    monkeypatch.setattr(flownet2, "flow_warp", recorder)
    params = flownet2_init(jax.random.PRNGKey(0))
    img = np.zeros((1, 64, 128, 3), np.float32)

    runner = FlowRunner("flownet2-cs", params, warp_method="gather")
    out_exact = runner.batch(img, img)
    assert seen and all(m == "gather" for m in seen)
    assert out_exact.shape == (1, 64, 128, 2)

    seen.clear()
    out_auto = FlowRunner("flownet2-cs", params).batch(img, img)
    assert seen and all(m is None for m in seen)
    # on CPU auto already routes to gather: the plumb is a no-op here
    np.testing.assert_array_equal(out_exact, out_auto)


def test_cli_test_defaults_to_exact_warp(tmp_path, monkeypatch):
    """`caffe test` constructs its runner with warp_method='gather' unless
    --warp fast, which instead screens GT flows via warp_clamp_fraction."""
    from flownet2_tpu.cli import test as test_cli
    from flownet2_tpu.tools.synth_dataset import write_split
    import flownet2_tpu.inference as inference

    rec = str(tmp_path / "eval.flowrec")
    write_split(rec, 4, seed=0, h=64, w=128, max_shift=3.0, n_layers=1,
                log=lambda *_: None)

    captured = {}
    real_runner = inference.FlowRunner

    class Capture(real_runner):
        def __init__(self, model, params, dtype=None, warp_method=None):
            captured["warp_method"] = warp_method
            super().__init__(model, params, dtype=dtype, warp_method=warp_method)

    monkeypatch.setattr(inference, "FlowRunner", Capture)

    def run(extra):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            rc = test_cli.main(
                ["--weights", "random", "--model", "flownets",
                 "--dataset", "flowrec", "--data-root", rec, "--batch", "2"]
                + extra
            )
        assert rc == 0
        return buf.getvalue()

    out = run([])
    assert captured["warp_method"] == "gather"
    assert "Loss: average EPE" in out

    out = run(["--warp", "fast"])
    assert captured["warp_method"] is None
    assert "Loss: average EPE" in out


def test_eval_parity_defaults_to_exact_warp(tmp_path, monkeypatch):
    from flownet2_tpu.cli import eval_parity
    from flownet2_tpu.core.flow_io import write_flo, write_ppm
    import flownet2_tpu.inference as inference

    rng = np.random.default_rng(0)
    img = (rng.uniform(0, 255, (64, 128, 3))).astype(np.uint8)
    p0, p1 = str(tmp_path / "a.ppm"), str(tmp_path / "b.ppm")
    write_ppm(p0, img)
    write_ppm(p1, img)
    flo = str(tmp_path / "ref.flo")
    write_flo(flo, np.zeros((64, 128, 2), np.float32))
    lst = tmp_path / "pairs.txt"
    lst.write_text(f"{p0} {p1} {flo}\n")

    captured = {}
    real_runner = inference.FlowRunner

    class Capture(real_runner):
        def __init__(self, model, params, dtype=None, warp_method=None):
            captured["warp_method"] = warp_method
            super().__init__(model, params, dtype=dtype, warp_method=warp_method)

    monkeypatch.setattr(inference, "FlowRunner", Capture)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        eval_parity.main(
            ["--model", "flownets", "--weights", "random", "--list", str(lst)]
        )
    assert captured["warp_method"] == "gather"
