"""Optical-flow datasets as direct file streams.

Covers the three training corpora the reference downloads
(data/download.sh:1-19): FlyingChairs, FlyingThings3D (+ ChairsSDHom), plus
the in-tree FlyingChairs_examples layout (``NNNNNNN-img0.ppm/-img1.ppm/
-gt.flo``). Range subsetting and seeded block-wise shuffling mirror the
CustomData options (custom_data_layer.cpp:29-42, 394-476; DataParameter
range/rand_permute/block_size, caffe.proto:972-985).
"""

from __future__ import annotations

import os
import glob as globmod
from dataclasses import dataclass
from typing import Iterator, Optional, Sequence

import numpy as np

from flownet2_tpu.core.flow_io import read_flo, read_image, read_pfm


@dataclass(frozen=True)
class FlowSample:
    img0_path: str
    img1_path: str
    flow_path: str
    occ_path: Optional[str] = None

    def load(self) -> dict:
        img0 = read_image(self.img0_path)
        img1 = read_image(self.img1_path)
        if self.flow_path.lower().endswith(".pfm"):
            flow = read_pfm(self.flow_path)[0][:, :, :2]
        else:
            flow = read_flo(self.flow_path)
        out = {
            "img0": img0.astype(np.float32),
            "img1": img1.astype(np.float32),
            "flow": flow.astype(np.float32),
        }
        if self.occ_path:
            occ = read_image(self.occ_path)[..., :1]
            out["occ"] = (occ > 127).astype(np.float32)
        return out


class FlowPairDataset:
    """A list of (img0, img1, flow) triples with reference-style subsetting."""

    def __init__(self, samples: Sequence[FlowSample]):
        if not samples:
            raise ValueError("dataset is empty")
        self.samples = list(samples)

    def __len__(self) -> int:
        return len(self.samples)

    def __getitem__(self, i: int) -> dict:
        return self.samples[i].load()

    def subset_range(self, start: int, end: int) -> "FlowPairDataset":
        """The DataParameter ``range`` option (caffe.proto:972-973):
        restrict to sample indices [start, end]."""
        return FlowPairDataset(self.samples[start : end + 1])

    def permutation(
        self, seed: Optional[int], block_size: int = 1
    ) -> np.ndarray:
        """Seeded block-wise shuffle (custom_data_layer.cpp:29-42): indices
        are permuted in contiguous blocks of ``block_size`` so disk reads
        stay sequential within a block."""
        n = len(self.samples)
        if seed is None:
            return np.arange(n)
        rng = np.random.default_rng(seed)
        n_blocks = (n + block_size - 1) // block_size
        order = rng.permutation(n_blocks)
        idx = []
        for b in order:
            lo = b * block_size
            idx.extend(range(lo, min(lo + block_size, n)))
        return np.asarray(idx)


def _pairs_from_patterns(root: str, img0_pat: str, img1_pat: str, flow_pat: str):
    """Match flow files by the glob pattern; the '*' part is the sample key."""
    flow_suffix = flow_pat.split("*")[-1]
    flows = sorted(globmod.glob(os.path.join(root, flow_pat)))
    samples = []
    for fp in flows:
        key = os.path.basename(fp)[: -len(flow_suffix)]
        img0 = os.path.join(root, img0_pat.replace("*", key))
        img1 = os.path.join(root, img1_pat.replace("*", key))
        if os.path.exists(img0) and os.path.exists(img1):
            samples.append(FlowSample(img0, img1, fp))
    return samples


def FlyingChairs(root: str) -> FlowPairDataset:
    """Official FlyingChairs layout (NNNNN_img1.ppm/_img2.ppm/_flow.flo) or
    the in-tree examples layout (NNNNNNN-img0.ppm/-img1.ppm/-gt.flo)."""
    samples = _pairs_from_patterns(root, "*-img0.ppm", "*-img1.ppm", "*-gt.flo")
    if not samples:
        samples = _pairs_from_patterns(root, "*_img1.ppm", "*_img2.ppm", "*_flow.flo")
    return FlowPairDataset(samples)


def ChairsSDHom(root: str, split: str = "train") -> FlowPairDataset:
    """ChairsSDHom layout: data/<split>/{t0,t1,flow}/NNNNN.{png,pfm}."""
    base = os.path.join(root, "data", split)
    flows = sorted(globmod.glob(os.path.join(base, "flow", "*.pfm")))
    samples = []
    for fp in flows:
        key = os.path.splitext(os.path.basename(fp))[0]
        img0 = os.path.join(base, "t0", key + ".png")
        img1 = os.path.join(base, "t1", key + ".png")
        if os.path.exists(img0) and os.path.exists(img1):
            samples.append(FlowSample(img0, img1, fp))
    return FlowPairDataset(samples)


def FlyingThings3D(root: str, split: str = "TRAIN", direction: str = "into_future") -> FlowPairDataset:
    """FlyingThings3D subset layout: frames_cleanpass/<split>/... +
    optical_flow/<split>/.../{into_future,into_past}/OpticalFlowInto*.pfm."""
    img_root = os.path.join(root, "frames_cleanpass", split)
    flow_root = os.path.join(root, "optical_flow", split)
    samples = []
    flows = sorted(
        globmod.glob(os.path.join(flow_root, "*", "*", direction, "*.pfm"))
    )
    for fp in flows:
        parts = fp.split(os.sep)
        scene_letter, scene = parts[-4], parts[-3]
        fname = os.path.basename(fp)
        # OpticalFlowIntoFuture_NNNN_L.pfm
        num = int(fname.split("_")[1])
        nxt = num + 1 if direction == "into_future" else num - 1
        img0 = os.path.join(img_root, scene_letter, scene, "left", f"{num:04d}.png")
        img1 = os.path.join(img_root, scene_letter, scene, "left", f"{nxt:04d}.png")
        if os.path.exists(img0) and os.path.exists(img1):
            samples.append(FlowSample(img0, img1, fp))
    return FlowPairDataset(samples)


def Sintel(root: str, split: str = "training", render: str = "clean") -> FlowPairDataset:
    """MPI-Sintel layout: <split>/<render>/<scene>/frame_NNNN.png with GT at
    <split>/flow/<scene>/frame_NNNN.flo (the benchmark the reference's
    Sintel-finetuned models target, models/download-models.sh)."""
    img_root = os.path.join(root, split, render)
    flow_root = os.path.join(root, split, "flow")
    samples = []
    for fp in sorted(globmod.glob(os.path.join(flow_root, "*", "frame_*.flo"))):
        scene = os.path.basename(os.path.dirname(fp))
        num = int(os.path.basename(fp)[6:10])
        img0 = os.path.join(img_root, scene, f"frame_{num:04d}.png")
        img1 = os.path.join(img_root, scene, f"frame_{num + 1:04d}.png")
        if os.path.exists(img0) and os.path.exists(img1):
            samples.append(FlowSample(img0, img1, fp))
    return FlowPairDataset(samples)


def KITTI(root: str, split: str = "training", occluded: bool = True) -> FlowPairDataset:
    """KITTI 2015 flow layout: <split>/image_2/NNNNNN_1{0,1}.png with GT
    <split>/flow_{occ,noc}/NNNNNN_10.png (16-bit PNG flow encoding:
    (value-2^15)/64, valid mask in the 3rd channel)."""
    sub = "flow_occ" if occluded else "flow_noc"
    img_root = os.path.join(root, split, "image_2")
    samples = []
    for fp in sorted(globmod.glob(os.path.join(root, split, sub, "*_10.png"))):
        key = os.path.basename(fp)[:6]
        img0 = os.path.join(img_root, f"{key}_10.png")
        img1 = os.path.join(img_root, f"{key}_11.png")
        if os.path.exists(img0) and os.path.exists(img1):
            samples.append(KittiSample(img0, img1, fp))
    return FlowPairDataset(samples)


@dataclass(frozen=True)
class KittiSample(FlowSample):
    """KITTI GT flow is a 16-bit PNG: u,v = (png[...,0:2]-2^15)/64, invalid
    pixels (png[...,2]==0) → NaN (matching the reference's NaN-invalid
    convention end to end)."""

    def load(self) -> dict:
        from PIL import Image

        img0 = read_image(self.img0_path)
        img1 = read_image(self.img1_path)
        png = np.asarray(Image.open(self.flow_path))  # (H, W, 3) uint16
        flow = (png[..., :2].astype(np.float32) - 2**15) / 64.0
        invalid = png[..., 2] == 0
        flow[invalid] = np.nan
        return {
            "img0": img0.astype(np.float32),
            "img1": img1.astype(np.float32),
            "flow": flow,
        }


_FACTORIES = {
    "flyingchairs": FlyingChairs,
    "chairssdhom": ChairsSDHom,
    "flyingthings3d": FlyingThings3D,
    "sintel": Sintel,
    "kitti": KITTI,
}


def open_dataset(name: str, root: str, **kw):
    """Open a named dataset layout, or — when ``name`` is "flowrec"/"lmdb"/
    "leveldb" or ``name`` is "auto" and ``root`` looks like one — the
    packed formats.

    An explicitly named dataset (e.g. "flyingchairs") is honored even when
    ``root`` happens to contain a data.mdb; format sniffing only applies to
    ``name="auto"`` (or the format names themselves)."""
    key = name.lower().replace("_", "")
    auto = key == "auto"
    if key == "flowrec" or (auto and root.endswith(".flowrec")):
        from flownet2_tpu.data.records import FlowRecordReader

        return FlowRecordReader(root)
    if key == "lmdb" or (
        auto
        and (root.endswith(".mdb") or os.path.exists(os.path.join(root, "data.mdb")))
    ):
        from flownet2_tpu.data.lmdb import LmdbFlowDataset

        return LmdbFlowDataset(root, **kw)
    if key == "leveldb" or (
        auto and os.path.exists(os.path.join(root, "CURRENT"))
    ):
        from flownet2_tpu.data.leveldb import LevelDBFlowDataset

        return LevelDBFlowDataset(root, **kw)
    if auto:
        raise ValueError(
            f"cannot sniff dataset format at {root!r}; pass an explicit name "
            f"(known: {sorted(_FACTORIES)}, 'flowrec', 'lmdb', 'leveldb')"
        )
    try:
        return _FACTORIES[key](root, **kw)
    except KeyError:
        raise ValueError(f"unknown dataset {name!r}; known: {sorted(_FACTORIES)}")
