"""End-to-end integration tests: CLI inference on the in-tree example pairs
and a short real training run (tiny crops, CPU)."""

import os
import subprocess
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from flownet2_tpu.core.flow_io import read_flo

EXAMPLES = "/root/reference/data/FlyingChairs_examples"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

needs_examples = pytest.mark.skipif(
    not os.path.isdir(EXAMPLES), reason="example data unavailable"
)


@needs_examples
def test_run_flownet_cli(tmp_path):
    """The reference inference contract end to end: two PPMs in, .flo out."""
    out = tmp_path / "out.flo"
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
    r = subprocess.run(
        [
            sys.executable,
            "-m",
            "flownet2_tpu.cli.run_flownet",
            "random",
            "FlowNet2-S_deploy.prototxt.template",  # name resolution path
            f"{EXAMPLES}/0000000-img0.ppm",
            f"{EXAMPLES}/0000000-img1.ppm",
            str(out),
        ],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=600,
        env=env,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    flow = read_flo(out)
    img_h, img_w = 384, 512  # FlyingChairs resolution
    assert flow.shape == (img_h, img_w, 2)
    assert np.all(np.isfinite(flow))


@needs_examples
def test_training_reduces_loss(tmp_path):
    """A short FlowNetS training run on real example data must reduce the
    multi-scale EPE loss (the reference's gradient-based-solver test idea,
    test_gradient_based_solver.cpp, on the real objective)."""
    from flownet2_tpu.data import BatchLoader, FlyingChairs
    from flownet2_tpu.models import flownet_s_init
    from flownet2_tpu.train import Solver, SolverConfig
    from flownet2_tpu.train.objectives import flownet_s_loss

    ds = FlyingChairs(EXAMPLES)
    loader = BatchLoader(ds, batch_size=2, crop=(64, 128), shuffle_seed=0, num_threads=1)
    cfg = SolverConfig(solver_type="adam", base_lr=1e-4, momentum=0.9, max_iter=12)
    solver = Solver(cfg, flownet_s_loss, flownet_s_init(jax.random.PRNGKey(0)), display=0)

    it = iter(loader)
    losses = []
    for _ in range(12):
        loss, _ = solver.step(next(it))
        losses.append(loss)
    assert np.isfinite(losses).all()
    assert np.mean(losses[-3:]) < np.mean(losses[:3])


@needs_examples
def test_training_with_augmentation_runs(tmp_path):
    from flownet2_tpu.data import BatchLoader, FlyingChairs
    from flownet2_tpu.data.augment_pipeline import make_augmented_loss, make_flownet_augmenter
    from flownet2_tpu.models import flownet_s_init
    from flownet2_tpu.train import Solver, SolverConfig
    from flownet2_tpu.train.objectives import flownet_s_loss

    ds = FlyingChairs(EXAMPLES)
    crop_h, crop_w = 64, 128
    loader = BatchLoader(
        ds,
        batch_size=2,
        shuffle_seed=0,
        num_threads=1,
        transform=make_flownet_augmenter(crop_h, crop_w),
    )
    cfg = SolverConfig(solver_type="adam", base_lr=1e-4, max_iter=3)
    solver = Solver(
        cfg,
        make_augmented_loss(flownet_s_loss, crop_h, crop_w),
        flownet_s_init(jax.random.PRNGKey(0)),
        display=0,
    )
    it = iter(loader)
    for _ in range(3):
        loss, _ = solver.step(next(it))
        assert np.isfinite(loss)


@needs_examples
def test_run_flownet_many_cli(tmp_path):
    """List-file batch inference: program reuse across same-resolution jobs
    (run-flownet-many.py:50-75 semantics)."""
    jobs = tmp_path / "jobs.txt"
    out1, out2 = tmp_path / "a.flo", tmp_path / "b.flo"
    jobs.write_text(
        f"{EXAMPLES}/0000000-img0.ppm {EXAMPLES}/0000000-img1.ppm {out1}\n"
        f"{EXAMPLES}/0000001-img0.ppm {EXAMPLES}/0000001-img1.ppm {out2}\n"
    )
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
    r = subprocess.run(
        [
            sys.executable, "-m", "flownet2_tpu.cli.run_flownet_many",
            "random", "flownets", str(jobs),
        ],
        capture_output=True, text=True, cwd=REPO, timeout=600, env=env,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    for out in (out1, out2):
        flow = read_flo(out)
        assert flow.shape == (384, 512, 2)
