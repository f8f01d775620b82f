"""Weight file I/O: flat-npz param archives (+ orbax for full train state).

The reference stores weights as binaryproto ``.caffemodel`` / HDF5
(net.cpp:752-885); the native format here is a flat ``.npz`` with
``/``-joined nested keys — self-describing, mmap-friendly, and trivially
inspectable. ``flownet2_tpu.models.import_caffe`` converts reference
caffemodels into this layout.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import jax.numpy as jnp


def flatten_params(params: dict, prefix: str = "") -> dict[str, np.ndarray]:
    out = {}
    for k, v in params.items():
        key = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(flatten_params(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def unflatten_params(flat: dict[str, np.ndarray]) -> dict:
    out: dict = {}
    for key, v in flat.items():
        parts = key.split("/")
        d = out
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = jnp.asarray(v)
    return out


def save_params(path: str, params: dict) -> None:
    np.savez(path, **flatten_params(params))


def load_params(path: str) -> dict:
    with np.load(path) as z:
        return unflatten_params({k: z[k] for k in z.files})


def snapshot_params(snapshot_dir: str) -> dict:
    """Extract the param pytree from an orbax ``Solver.snapshot`` directory.

    The solver's snapshots hold the full TrainState (params + opt_state +
    iteration, the reference's ``.solverstate``, solver.cpp:412-483); this
    pulls out just the weights — the ``.caffemodel`` half — so snapshots
    feed ``cli/test.py --weights`` / ``run_flownet`` without a Solver.
    """
    import os

    import jax
    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ckptr:
        state = ckptr.restore(os.path.abspath(snapshot_dir))
    return jax.tree.map(jnp.asarray, state["params"])


def export_snapshot_npz(snapshot_dir: str, npz_path: str) -> None:
    """Snapshot dir → flat ``.npz`` weights (`caffe train` snapshot → deployable
    weights, the ``-weights`` handoff in tools/caffe.cpp:125-135)."""
    save_params(npz_path, snapshot_params(snapshot_dir))
