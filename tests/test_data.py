"""Data pipeline tests: datasets over the in-tree example pairs, the packed
record format round-trip, and the prefetching loader."""

import os
import shutil

import numpy as np
import pytest

from flownet2_tpu.core.flow_io import read_flo, write_flo, write_ppm
from flownet2_tpu.data import BatchLoader, FlowRecordReader, FlowRecordWriter, FlyingChairs

EXAMPLES = "/root/reference/data/FlyingChairs_examples"


@pytest.fixture(scope="module")
def chairs_dir(tmp_path_factory):
    if os.path.isdir(EXAMPLES):
        return EXAMPLES
    # synthesize a tiny dataset if the examples are unavailable
    d = tmp_path_factory.mktemp("chairs")
    rng = np.random.default_rng(0)
    for i in range(3):
        write_ppm(d / f"{i:07d}-img0.ppm", rng.integers(0, 255, (32, 48, 3), dtype=np.uint8))
        write_ppm(d / f"{i:07d}-img1.ppm", rng.integers(0, 255, (32, 48, 3), dtype=np.uint8))
        write_flo(d / f"{i:07d}-gt.flo", rng.standard_normal((32, 48, 2)).astype(np.float32))
    return str(d)


def test_flying_chairs_examples(chairs_dir):
    ds = FlyingChairs(chairs_dir)
    assert len(ds) >= 3
    s = ds[0]
    assert s["img0"].shape == s["img1"].shape
    assert s["img0"].shape[-1] == 3
    assert s["flow"].shape[:2] == s["img0"].shape[:2]
    assert s["flow"].shape[-1] == 2


def test_subset_and_permutation(chairs_dir):
    ds = FlyingChairs(chairs_dir)
    sub = ds.subset_range(0, 1)
    assert len(sub) == 2
    p1 = ds.permutation(seed=1, block_size=2)
    p2 = ds.permutation(seed=1, block_size=2)
    assert np.array_equal(p1, p2)  # seeded => deterministic
    assert sorted(p1.tolist()) == list(range(len(ds)))


def test_flow_records_roundtrip(tmp_path, rng):
    img0 = rng.integers(0, 255, (16, 20, 3)).astype(np.uint8)
    img1 = rng.integers(0, 255, (16, 20, 3)).astype(np.uint8)
    flow = rng.uniform(-100, 100, (16, 20, 2)).astype(np.float32)
    flow[0, 0] = np.nan
    occ = rng.integers(0, 2, (16, 20)).astype(bool)

    path = str(tmp_path / "data.flowrec")
    with FlowRecordWriter(path) as w:
        w.write(img0, img1, flow, occ)
        w.write(img1, img0, -flow)

    r = FlowRecordReader(path)
    assert len(r) == 2
    s0 = r[0]
    np.testing.assert_array_equal(s0["img0"], img0.astype(np.float32))
    np.testing.assert_array_equal(s0["img1"], img1.astype(np.float32))
    assert np.isnan(s0["flow"][0, 0]).all()
    m = ~np.isnan(flow)
    np.testing.assert_allclose(s0["flow"][m], flow[m], atol=1.0 / 64 + 1e-6)
    np.testing.assert_array_equal(s0["occ"][..., 0], occ.astype(np.float32))
    s1 = r[1]
    assert "occ" not in s1


def test_batch_loader(chairs_dir):
    ds = FlyingChairs(chairs_dir)
    h, w = ds[0]["img0"].shape[:2]
    loader = BatchLoader(ds, batch_size=2, crop=(h // 2, w // 2), epochs=2, shuffle_seed=0)
    batches = list(loader)
    # epochs run back to back, so leftovers at an epoch boundary join the
    # next epoch's first batch: total = floor(2*len / batch)
    assert len(batches) == (2 * len(ds)) // 2
    b = batches[0]
    assert b["img0"].shape == (2, h // 2, w // 2, 3)
    assert b["flow"].shape == (2, h // 2, w // 2, 2)


def test_batch_loader_transform(chairs_dir):
    ds = FlyingChairs(chairs_dir)
    calls = []

    def tf(batch, rng_):
        calls.append(1)
        batch["extra"] = np.ones((batch["img0"].shape[0],), np.float32)
        return batch

    loader = BatchLoader(ds, batch_size=1, epochs=1, transform=tf, num_threads=1)
    batches = list(loader)
    assert len(batches) == len(ds)
    assert all("extra" in b for b in batches)


def test_record_reader_as_dataset(tmp_path, rng):
    """.flowrec files drive BatchLoader directly (the CustomData role)."""
    from flownet2_tpu.data import FlowRecordWriter, open_dataset

    path = str(tmp_path / "train.flowrec")
    with FlowRecordWriter(path) as w:
        for _ in range(5):
            w.write(
                rng.integers(0, 255, (16, 16, 3)).astype(np.uint8),
                rng.integers(0, 255, (16, 16, 3)).astype(np.uint8),
                rng.uniform(-5, 5, (16, 16, 2)).astype(np.float32),
            )
    ds = open_dataset("flowrec", path)
    assert len(ds) == 5
    p1 = ds.permutation(seed=3, block_size=2)
    assert sorted(p1.tolist()) == list(range(5))
    loader = BatchLoader(ds, batch_size=2, epochs=1, shuffle_seed=1, num_threads=1)
    batches = list(loader)
    assert len(batches) == 2
    assert batches[0]["flow"].shape == (2, 16, 16, 2)


def test_flow_record_reader_is_thread_safe(tmp_path, rng):
    """Concurrent __getitem__ from loader worker threads must never tear a
    record. The reader uses os.pread (atomic positioned reads) because a
    shared-handle seek()+read() interleaves across BatchLoader's workers —
    observed in production as shape errors mid-eval; a torn read whose
    length field still parses would be SILENT data corruption."""
    import threading

    n = 24
    sizes = [(16 + 4 * (i % 3), 20 + 4 * (i % 2)) for i in range(n)]
    path = str(tmp_path / "mt.flowrec")
    with FlowRecordWriter(path) as w:
        for i, (h, wd) in enumerate(sizes):
            img = np.full((h, wd, 3), i, np.uint8)
            flow = np.full((h, wd, 2), float(i), np.float32)
            w.write(img, img, flow)

    r = FlowRecordReader(path)
    errors = []

    def hammer(seed):
        g = np.random.default_rng(seed)
        try:
            for _ in range(300):
                i = int(g.integers(n))
                s = r[i]
                h, wd = sizes[i]
                assert s["img0"].shape == (h, wd, 3), (i, s["img0"].shape)
                assert float(s["img0"][0, 0, 0]) == i
                assert abs(float(s["flow"][0, 0, 0]) - i) < 1e-2
        except Exception as e:  # pragma: no cover - failure path
            errors.append(e)

    threads = [threading.Thread(target=hammer, args=(t,)) for t in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors[:3]
