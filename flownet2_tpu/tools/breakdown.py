"""Per-stage cost breakdown derived from the model definition itself.

The reference's ``caffe time`` walks the Net's layer list and times each
layer's Forward/Backward (tools/caffe.cpp:302-388). Under XLA the layers
fuse into one program, so the equivalent granularity is the CASCADE STAGE:
subnets (FlowNetC/S/SD/fusion/DispNetC) and the glue ops between them
(normalize, warp, channel-norm, resample).

Rather than hard-coding a stage table per model, :func:`walk_stages`
derives it by tracing the model's own forward function under
``jax.eval_shape`` with recording shims installed on the stage-level
symbols — the stage list, call counts, and input shapes all come from the
actual model wiring (models/flownet2.py etc.), so any cascade composition
(flownetc, flownet2-css, dispnetc, …) breaks down without a bespoke table.

Each stage is then timed with the chained-timing methodology
(tools/timing.chain_ms): forward, and forward+backward via ``jax.vjp``
(``caffe time`` tables Backward per layer; post-fusion the honest analog is
bwd ≈ (fwd+bwd) − fwd per stage).
"""

from __future__ import annotations

import contextlib
from dataclasses import dataclass, field
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

# (module path, attribute) pairs where stage-level symbols are *referenced*
# (patching the defining module alone would miss `from x import y` aliases).
_PATCH_SITES: dict[str, list[tuple[str, str]]] = {
    "normalize_images": [
        ("flownet2_tpu.models.flownet2", "normalize_images"),
        ("flownet2_tpu.inference", "normalize_images"),
    ],
    "flownetc": [
        ("flownet2_tpu.models.flownet2", "flownet_c_apply"),
        ("flownet2_tpu.inference", "flownet_c_apply"),
    ],
    "flownets": [
        ("flownet2_tpu.models.flownet2", "flownet_s_apply"),
        ("flownet2_tpu.inference", "flownet_s_apply"),
    ],
    "flownet-sd": [
        ("flownet2_tpu.models.flownet2", "flownet_sd_apply"),
        ("flownet2_tpu.inference", "flownet_sd_apply"),
    ],
    "fusion": [("flownet2_tpu.models.flownet2", "fusion_apply")],
    "dispnetc": [("flownet2_tpu.inference", "dispnet_c_apply")],
    "flow_warp": [("flownet2_tpu.models.flownet2", "flow_warp")],
    "channel_norm": [("flownet2_tpu.models.flownet2", "channel_norm")],
    "resample": [
        ("flownet2_tpu.models.flownet2", "resample"),
        ("flownet2_tpu.inference", "resample"),
    ],
}


@dataclass
class Stage:
    """One timed row: a stage-level op plus the concrete-shape signature it
    was called with inside the model; ``count`` = how many times the model
    calls it with this signature."""

    name: str
    fn: Callable
    arg_specs: tuple  # per positional arg: ShapeDtypeStruct | ("static", v)
    kwargs: dict
    count: int = 1
    # filled by time_stages:
    fwd_ms: float = field(default=float("nan"))
    fwdbwd_ms: float = field(default=float("nan"))

    @property
    def bwd_ms(self) -> float:
        return self.fwdbwd_ms - self.fwd_ms

    def signature(self) -> tuple:
        def key(s):
            if isinstance(s, jax.ShapeDtypeStruct):
                return ("arr", s.shape, str(s.dtype))
            return s

        return (self.name, tuple(key(s) for s in self.arg_specs),
                tuple(sorted(self.kwargs.items())))


def _spec_of(x) -> Any:
    if hasattr(x, "shape") and hasattr(x, "dtype"):
        return jax.ShapeDtypeStruct(tuple(x.shape), x.dtype)
    if isinstance(x, dict):  # a params subtree: record leaf specs
        return (
            "tree",
            tuple(
                (jax.tree_util.keystr(p), jax.ShapeDtypeStruct(tuple(v.shape), v.dtype))
                for p, v in jax.tree_util.tree_leaves_with_path(x)
            ),
        )
    return ("static", x)


def walk_stages(model: str, params, img0, img1) -> list[Stage]:
    """Trace ``model``'s forward under eval_shape; return the deduplicated
    stage list in first-call order with per-signature call counts."""
    import importlib

    from flownet2_tpu.inference import _make_forward

    records: list[tuple[str, Callable, tuple, dict]] = []

    def make_shim(name, real):
        def shim(*a, **kw):
            records.append((name, real, tuple(_spec_of(x) for x in a), dict(kw)))
            return real(*a, **kw)

        return shim

    saved = []
    try:
        shims: dict[str, Callable] = {}
        for name, sites in _PATCH_SITES.items():
            for mod_path, attr in sites:
                mod = importlib.import_module(mod_path)
                real = getattr(mod, attr, None)
                if real is None:
                    continue
                if name not in shims:
                    shims[name] = make_shim(name, real)
                saved.append((mod, attr, real))
                setattr(mod, attr, shims[name])
        forward = _make_forward(model)
        jax.eval_shape(lambda i0, i1: forward(params, i0, i1), img0, img1)
    finally:
        for mod, attr, real in saved:
            setattr(mod, attr, real)

    stages: dict[tuple, Stage] = {}
    order: list[tuple] = []
    for name, fn, arg_specs, kwargs in records:
        st = Stage(name=name, fn=fn, arg_specs=arg_specs, kwargs=kwargs)
        sig = st.signature()
        if sig in stages:
            stages[sig].count += 1
        else:
            stages[sig] = st
            order.append(sig)
    return [stages[s] for s in order]


def _materialize(spec, rng):
    """Concrete array for a recorded shape spec; statics pass through."""
    if isinstance(spec, jax.ShapeDtypeStruct):
        return jnp.asarray(rng.uniform(-1, 1, spec.shape), spec.dtype)
    if isinstance(spec, tuple) and spec and spec[0] == "static":
        return spec[1]
    return spec


def time_stages(
    stages: list[Stage],
    params_by_stage: dict[str, Any],
    *,
    n1: int,
    n2: int,
    backward: bool = False,
) -> list[Stage]:
    """Fill fwd_ms (and fwdbwd_ms when ``backward``) for every stage using
    chained timing. ``params_by_stage``: live params subtree per stage name.

    Dynamic args (arrays, params trees) travel as jit ARGUMENTS — baking
    weights into the HLO as constants overflows the remote compile service
    (tools/timing.py docstring); static args (ints like resample's target
    size) are closed over so shapes stay static under jit.
    """
    from flownet2_tpu.tools.timing import chain_ms

    rng = np.random.default_rng(1)
    for st in stages:
        # Build concrete args: arrays random, params subtrees live.
        args = []
        for spec in st.arg_specs:
            if isinstance(spec, tuple) and spec and spec[0] == "tree":
                args.append(params_by_stage[st.name])
            else:
                args.append(_materialize(spec, rng))
        dynamic = [
            i for i, a in enumerate(args) if isinstance(a, (jnp.ndarray, dict))
        ]
        arr_idx = [i for i in dynamic if isinstance(args[i], jnp.ndarray)]
        if not arr_idx:
            continue
        fb = arr_idx[0]
        rest_idx = [i for i in dynamic if i != fb]
        statics = {i: args[i] for i in range(len(args)) if i not in dynamic}
        kwargs = st.kwargs

        def fwd(a0, *r, _fn=st.fn, _fb=fb, _ri=tuple(rest_idx), _st=statics,
                _n=len(args), _kw=kwargs):
            full = [None] * _n
            full[_fb] = a0
            for i, v in zip(_ri, r):
                full[i] = v
            for i, v in _st.items():
                full[i] = v
            return _fn(*full, **_kw)

        rest = [args[i] for i in rest_idx]
        st.fwd_ms = chain_ms(fwd, args[fb], rest, n1, n2)

        if backward:
            # fwd+bwd: value + VJP wrt the feedback array (the activation
            # path Backward must traverse), cotangents = ones.
            def fwdbwd(a0, *r, _fwd=fwd):
                out, vjp = jax.vjp(lambda a: _fwd(a, *r), a0)
                ones = jax.tree.map(jnp.ones_like, out)
                (da,) = vjp(ones)
                return (out, da)

            try:
                st.fwdbwd_ms = chain_ms(fwdbwd, args[fb], rest, n1, n2)
            except Exception:  # non-differentiable stage (e.g. int inputs)
                st.fwdbwd_ms = float("nan")
    return stages


def params_for_stages(model: str, params) -> dict[str, Any]:
    """Map stage names to the live params subtree each stage consumes."""
    if model in ("flownet2", "flownet2-css", "flownet2-cs"):
        return {
            "flownetc": params.get("flownetc"),
            "flownets": params.get("flownets_1"),
            "flownet-sd": params.get("flownetsd"),
            "fusion": params.get("fusion"),
        }
    return {
        "flownetc": params,
        "flownets": params,
        "flownet-sd": params,
        "dispnetc": params,
        "fusion": params,
    }
