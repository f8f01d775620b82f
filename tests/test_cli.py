"""CLI surface tests (fast paths only; heavy model runs live in test_e2e)."""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CPU_ENV = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)


class TestModelNameResolution:
    def test_exact_names(self):
        from flownet2_tpu.cli.run_flownet import resolve_model_name

        for name in ("flownets", "flownetc", "flownet2", "flownet2-css", "flownet2-sd"):
            assert resolve_model_name(name) == name

    def test_reference_template_paths(self):
        from flownet2_tpu.cli.run_flownet import resolve_model_name

        cases = {
            "models/FlowNet2/FlowNet2_deploy.prototxt.template": "flownet2",
            "FlowNet2-S_deploy.prototxt.template": "flownets",
            "FlowNet2-C_deploy.prototxt.template": "flownetc",
            "FlowNet2-CSS_deploy.prototxt.template": "flownet2-css",
            "FlowNet2-CS_deploy.prototxt.template": "flownet2-cs",
            "FlowNet2-SD_deploy.prototxt.template": "flownet2-sd",
            "FlowNet2-CSS-ft-sd_deploy.prototxt.template": "flownet2-css",
            "FlowNet2-KITTI_deploy.prototxt.template": "flownet2",
        }
        for path, want in cases.items():
            assert resolve_model_name(path) == want, path

    def test_unknown_raises(self):
        from flownet2_tpu.cli.run_flownet import resolve_model_name

        with pytest.raises(SystemExit):
            resolve_model_name("not-a-net.prototxt")


def test_device_query_runs():
    r = subprocess.run(
        [sys.executable, "-m", "flownet2_tpu.cli.device_query"],
        capture_output=True, text=True, cwd=REPO, timeout=240, env=CPU_ENV,
    )
    assert r.returncode == 0, r.stderr[-1000:]
    assert "backend: cpu" in r.stdout
    assert "device 0" in r.stdout


def test_convert_dataset_listfile(tmp_path):
    from flownet2_tpu.core.flow_io import write_flo, write_ppm
    from flownet2_tpu.data import FlowRecordReader

    rng = np.random.default_rng(0)
    img0 = tmp_path / "a0.ppm"
    img1 = tmp_path / "a1.ppm"
    flo = tmp_path / "a.flo"
    write_ppm(img0, rng.integers(0, 255, (8, 10, 3), dtype=np.uint8))
    write_ppm(img1, rng.integers(0, 255, (8, 10, 3), dtype=np.uint8))
    write_flo(flo, rng.standard_normal((8, 10, 2)).astype(np.float32))
    listfile = tmp_path / "list.txt"
    listfile.write_text(f"{img0} {img1} {flo}\n")
    out = tmp_path / "packed.flowrec"

    from flownet2_tpu.cli.convert_dataset import main

    assert main([str(out), "--listfile", str(listfile)]) == 0
    r = FlowRecordReader(str(out))
    assert len(r) == 1
    assert r[0]["flow"].shape == (8, 10, 2)


def test_run_flownet_rejects_missing_inputs(tmp_path):
    from flownet2_tpu.cli.run_flownet import main

    with pytest.raises(SystemExit):
        main(["random", "flownets", "/nonexistent0.ppm", "/nonexistent1.ppm", str(tmp_path / "o.flo")])


def test_run_flownet_many_rejects_bad_listfile(tmp_path):
    from flownet2_tpu.cli.run_flownet_many import main

    bad = tmp_path / "jobs.txt"
    bad.write_text("only two fields\n")
    with pytest.raises(SystemExit):
        main(["random", "flownets", str(bad)])


def test_time_cmd_breakdown_smoke(capsys):
    """time_cmd --breakdown (the caffe-time per-layer report) runs end to
    end and prints the per-stage table. Tiny shapes on CPU — the numbers
    are noise there; this validates the plumbing."""
    from flownet2_tpu.cli.time_cmd import main

    rc = main(
        ["--model", "flownet2", "--height", "64", "--width", "128",
         "--batch", "1", "--iterations", "1", "--breakdown"]
    )
    out = capsys.readouterr().out
    assert rc == 0
    assert "fusion" in out and "sum (count-weighted)" in out


def test_eval_parity_bfloat16(tmp_path, capsys):
    """eval_parity --dtype bfloat16 end to end: f32 run dumps reference
    .flo files, the bf16 run compares against them. Random weights on CPU —
    this pins the bf16 CLI path; the trained-weight parity numbers live in
    docs/DESIGN_NOTES.md ("bf16 inference parity", round 3)."""
    import json

    from flownet2_tpu.cli.eval_parity import main

    ex = "/root/reference/data/FlyingChairs_examples"
    if not os.path.isdir(ex):
        pytest.skip("example data unavailable")
    from flownet2_tpu.core.flow_io import write_flo

    ref = tmp_path / "ref.flo"
    write_flo(ref, np.zeros((384, 512, 2), np.float32))  # placeholder target
    pairs = tmp_path / "pairs.txt"
    pairs.write_text(f"{ex}/0000000-img0.ppm {ex}/0000000-img1.ppm {ref}\n")

    # f32 pass overwrites the placeholder with its own prediction
    rc = main(
        ["--model", "flownets", "--weights", "random", "--list", str(pairs),
         "--out-dir", str(tmp_path)]
    )
    assert rc == 0
    capsys.readouterr()

    rc = main(
        ["--model", "flownets", "--weights", "random", "--list", str(pairs),
         "--dtype", "bfloat16"]
    )
    out = capsys.readouterr().out
    assert rc == 0
    result = json.loads(out.strip().splitlines()[-1])
    assert result["pairs"] == 1
    assert np.isfinite(result["mean_epe"])
