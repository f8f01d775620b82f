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


@needs_examples
def test_training_with_mean_recompute(tmp_path):
    """Augmented training with the running-mean window: the in-step
    subtraction + aux batch means keep the host MeanRecompute mirrors in
    sync across solver steps (data_augmentation_layer.cu:592-635 path)."""
    from flownet2_tpu.data import BatchLoader, FlyingChairs
    from flownet2_tpu.data.augment_pipeline import (
        make_augmented_loss,
        make_flownet_augmenter,
    )
    from flownet2_tpu.data.mean import MeanRecompute
    from flownet2_tpu.models import flownet_s_init
    from flownet2_tpu.train import Solver, SolverConfig
    from flownet2_tpu.train.objectives import flownet_s_loss

    ds = FlyingChairs(EXAMPLES)
    crop_h, crop_w = 64, 128
    means = [
        MeanRecompute(crop_h, crop_w, 3, window=2, per_pixel=True) for _ in range(2)
    ]
    base = make_flownet_augmenter(crop_h, crop_w)

    def transform(batch, rng):
        batch = base(batch, rng)
        batch = means[0].attach(batch, key="mean_image0")
        return means[1].attach(batch, key="mean_image1")

    loader = BatchLoader(ds, batch_size=2, shuffle_seed=0, num_threads=1, transform=transform)
    cfg = SolverConfig(solver_type="adam", base_lr=1e-4, max_iter=3)
    solver = Solver(
        cfg,
        make_augmented_loss(flownet_s_loss, crop_h, crop_w, mean_window=2, mean_per_pixel=True),
        flownet_s_init(jax.random.PRNGKey(0)),
        display=0,
    )

    seen = []

    def on_step(it, loss, aux):
        assert "aug_batch_mean0" in aux and "aug_batch_mean1" in aux
        for m, k in zip(means, ("aug_batch_mean0", "aug_batch_mean1")):
            m.update(np.asarray(aux[k]))
        seen.append(it)

    solver.solve(iter(loader), max_iter=3, log=lambda s: None, on_step=on_step)
    assert seen == [1, 2, 3]
    assert means[0].num_iter == 3
    # window=2: the mean froze after iteration 2 and is a real image mean
    assert means[0].mean.shape == (crop_h, crop_w, 3)
    assert 0.0 < means[0].mean.mean() < 1.0  # images are in [0,1] pre-x255


@needs_examples
def test_train_cli_multidevice(tmp_path):
    """`train --gpu all` — the reference's `caffe train -gpu all`
    (tools/caffe.cpp:175-197): data-parallel mesh over every local device,
    effective batch = --batch x n_devices (docs/multigpu.md:11). Runs the
    full CLI path (loader -> augmenter -> DP solver -> snapshot) in-process
    on the 8-virtual-device mesh."""
    from flownet2_tpu.cli.train import main

    rc = main([
        "--model", "flownets",
        "--dataset", "flyingchairs",
        "--data-root", EXAMPLES,
        "--batch", "1",
        "--gpu", "all",
        "--crop", "64x64",
        "--max-iter", "2",
        "--display", "1",
        "--snapshot-dir", str(tmp_path / "snaps"),
        "--snapshot-interval", "0",
        "--no-augment",
    ])
    assert rc == 0
    # final snapshot written at iteration 2
    assert (tmp_path / "snaps" / "iter_0000002").is_dir()
