"""Tools tests: writers, float-blob round trip, log parsing, flow colors,
Mean op."""

import numpy as np
import jax.numpy as jnp
import pytest

from flownet2_tpu.core.flow_io import read_flo, read_ppm
from flownet2_tpu.ops.mean import apply_mean
from flownet2_tpu.tools.flow_vis import flow_to_color
from flownet2_tpu.tools.parse_log import parse_log
from flownet2_tpu.tools.writers import Writer, read_float_blob, _write_float_blob


def test_flo_writer_filename_pattern(tmp_path, rng):
    w = Writer(str(tmp_path / "out"), kind="flo", prefix="pred_", suffix="_x")
    blob = rng.standard_normal((2, 6, 8, 2)).astype(np.float32)
    paths = w(blob, iteration=42)
    # reference pattern: {prefix}{iter:07d}({n:03d}){suffix}.flo
    assert paths[0].endswith("pred_0000042(000)_x.flo")
    assert paths[1].endswith("pred_0000042(001)_x.flo")
    np.testing.assert_array_equal(read_flo(paths[1]), blob[1])


def test_flo_writer_single_item_no_index(tmp_path, rng):
    w = Writer(str(tmp_path), kind="flo")
    paths = w(rng.standard_normal((1, 4, 4, 2)).astype(np.float32), iteration=7)
    assert paths[0].endswith("0000007.flo")


def test_img_writer(tmp_path, rng):
    w = Writer(str(tmp_path), kind="img")
    img = rng.uniform(0, 255, (1, 5, 5, 3)).astype(np.float32)
    paths = w(img, iteration=1)
    out = read_ppm(paths[0])
    np.testing.assert_array_equal(out, np.clip(img[0], 0, 255).astype(np.uint8))


def test_float_blob_roundtrip(tmp_path, rng):
    arr = rng.standard_normal((3, 4, 5)).astype(np.float32)
    p = str(tmp_path / "b.float3")
    _write_float_blob(p, arr)
    np.testing.assert_array_equal(read_float_blob(p), arr)


def test_parse_log():
    lines = [
        "Training flownets on flyingchairs",
        "Iteration 100, loss = 3.25 (1.52 iter/s)",
        "Iteration 200, loss = 2.5 (1.61 iter/s)",
        "Iteration 200, test metric = 4.125",
        "garbage line",
    ]
    train, test = parse_log(lines)
    assert [r["iteration"] for r in train] == [100, 200]
    assert train[0]["loss"] == 3.25
    assert train[1]["iters_per_sec"] == 1.61
    assert test == [{"iteration": 200, "metric": 4.125}]


def test_flow_to_color(rng):
    flow = rng.standard_normal((8, 8, 2)).astype(np.float32)
    flow[0, 0] = np.nan
    img = flow_to_color(flow)
    assert img.shape == (8, 8, 3) and img.dtype == np.uint8
    assert (img[0, 0] == 0).all()  # NaN → black
    # zero flow → white-ish center of the wheel
    white = flow_to_color(np.zeros((2, 2, 2), np.float32))
    assert (white > 240).all()


class TestMean:
    def test_subtract_values(self):
        x = jnp.ones((1, 2, 2, 3)) * 10.0
        out = apply_mean(x, mean_values=[1.0, 2.0, 3.0])
        np.testing.assert_allclose(np.asarray(out)[0, 0, 0], [9.0, 8.0, 7.0])

    def test_add_with_scales(self):
        x = jnp.ones((1, 1, 1, 2))
        out = apply_mean(
            x,
            mean_values=[1.0, 1.0],
            operation="add",
            input_scale=2.0,
            mean_scale=3.0,
            output_scale=0.5,
        )
        np.testing.assert_allclose(np.asarray(out)[0, 0, 0], [2.5, 2.5])

    def test_mean_array(self, rng):
        x = jnp.asarray(rng.standard_normal((1, 4, 4, 3)).astype(np.float32))
        mean = jnp.asarray(rng.standard_normal((4, 4, 3)).astype(np.float32))
        out = apply_mean(x, mean_array=mean)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x) - np.asarray(mean), rtol=1e-6)

    def test_requires_exactly_one(self):
        with pytest.raises(ValueError):
            apply_mean(jnp.ones((1, 1, 1, 3)))


def test_plot_training_log(tmp_path):
    log = tmp_path / "train.log"
    log.write_text(
        "Iteration 10, loss = 5.0 (1.0 iter/s)\n"
        "Iteration 20, loss = 3.0 (1.0 iter/s)\n"
        "Iteration 20, test metric = 4.0\n"
    )
    from flownet2_tpu.tools.plot_training_log import main

    assert main([str(log), "--out", str(tmp_path / "x.png")]) == 0
    assert (tmp_path / "x.png").stat().st_size > 0


def test_summarize_tool():
    """summarize (reference tools/extra/summarize.py) tabulates layers and
    counts params; FlowNet2 totals ~162.5M — the paper's model size."""
    import io

    from flownet2_tpu.tools.summarize import summarize

    buf = io.StringIO()
    total = summarize("flownet2", 64, 128, 1, out=buf)
    text = buf.getvalue()
    assert "fusion/predict_flow0" in text and "TOTAL" in text
    assert 162_000_000 < total < 163_000_000
    assert "(1, 64, 128, 2)" in text
