"""Device mesh + sharding helpers.

Scaling strategy (SURVEY.md §2.9): the one real parallelism requirement of
this workload is data parallelism over slice batches.  We express it the
XLA-native way — a `jax.sharding.Mesh` with a ``data`` axis (plus a spare
``model`` axis for channel sharding of the big dense layers), batch arrays
sharded on axis 0, parameters replicated — and let GSPMD insert the ICI
all-reduces for the gradient sums.  The same jitted train step runs unchanged
on 1 chip or N.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(mesh_shape: Sequence[int] = (0, 1),
              devices=None) -> Mesh:
    """Create a (data, model) mesh; data size 0 means 'all remaining devices'."""
    devices = list(devices if devices is not None else jax.devices())
    data, model = mesh_shape
    if model <= 0:
        model = 1
    if data <= 0:
        data = len(devices) // model
    if data < 1 or data * model > len(devices):
        raise ValueError(
            f"mesh {mesh_shape} cannot be built from {len(devices)} devices "
            f"(resolved data={data}, model={model})")
    dev_array = np.asarray(devices[:data * model]).reshape(data, model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def make_mesh_for_batch(mesh_shape: Sequence[int], batch_size: int,
                        devices=None) -> Mesh:
    """Like `make_mesh`, but clamps the data axis to the largest divisor of
    the global batch size (so a batch-2 smoke run on an 8-device host works)."""
    devices = list(devices if devices is not None else jax.devices())
    data, model = mesh_shape
    if model <= 0:
        model = 1
    max_data = max(len(devices) // model, 1) if data <= 0 else data
    requested = max_data
    while max_data > 1 and batch_size % max_data != 0:
        max_data -= 1
    if max_data < requested:
        import logging
        idle = (requested - max_data) * model
        logging.getLogger(__name__).warning(
            "make_mesh_for_batch: batch %d not divisible by data axis %d; "
            "clamping to %d — %d of %d devices will sit idle. Pick a batch "
            "size divisible by the data-parallel degree for full utilization.",
            batch_size, requested, max_data, idle, len(devices))
    return make_mesh((max_data, model), devices)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Place a host batch onto the mesh, sharded along the batch dimension."""
    sharding = batch_sharding(mesh)
    return {k: jax.device_put(v, sharding) for k, v in batch.items()}


def replicate_state(state, mesh: Mesh):
    """Replicate a pytree (train state / params) across the mesh."""
    sharding = replicated_sharding(mesh)
    return jax.device_put(state, sharding)


def local_batch_size(global_batch: int, mesh: Mesh) -> int:
    n_data = mesh.shape[DATA_AXIS]
    assert global_batch % n_data == 0, \
        f"batch {global_batch} not divisible by data-parallel size {n_data}"
    return global_batch // n_data


def infer_param_sharding(path_str: str, shape, mesh: Mesh) -> NamedSharding:
    """Tensor-parallel placement rule for one parameter.

    When the mesh has a model axis > 1, the large matmul-bearing parameters
    shard their output dimension over it — dense kernels [out, in] on dim 0,
    conv kernels [O, I, kh, kw] on dim 0 — and GSPMD inserts the matching
    all-gathers/reduce-scatters.  Biases and small/indivisible tensors stay
    replicated.
    """
    n_model = mesh.shape[MODEL_AXIS]
    if n_model <= 1 or len(shape) < 2:
        return replicated_sharding(mesh)
    out_dim = shape[0]
    # Keep small layers replicated: sharding them costs more in collectives
    # than it saves in FLOPs.
    if out_dim % n_model != 0 or out_dim < 8 * n_model:
        return replicated_sharding(mesh)
    return NamedSharding(mesh, P(MODEL_AXIS))


_DTYPE_BYTES = {"f64": 8, "f32": 4, "f16": 2, "bf16": 2, "s32": 4, "u32": 4,
                "s16": 2, "u16": 2, "s8": 1, "u8": 1, "pred": 1}

_COLLECTIVES = ("all-reduce", "all-gather", "reduce-scatter",
                "collective-permute", "all-to-all")


def collective_census(hlo_text: str) -> Dict[str, Dict[str, int]]:
    """Count + size the cross-device collectives in a compiled HLO module.

    Returns {op: {"count": n, "bytes": total_result_bytes}} for all-reduce /
    all-gather / reduce-scatter / collective-permute / all-to-all (including
    their async -start forms; -done ops are skipped so nothing double-counts).
    This is how the dp-vs-tp communication pattern is made measurable
    (SURVEY.md §2.9): dp inserts gradient all-reduces; a model axis adds
    activation/weight all-gathers or reduce-scatters on top.
    """
    import re

    shape_re = re.compile(r"(\w+)\[([\d,]*)\]")
    # `%x = <result shapes> <op>(...)`; async ops appear as `<op>-start` with
    # a matching `<op>-done` that only forwards the result (not re-counted).
    op_re = re.compile(
        r"=\s*(?P<result>[^=]*?)\s*"
        r"(?P<op>" + "|".join(_COLLECTIVES) + r")(?P<start>-start)?\(")
    census = {op: {"count": 0, "bytes": 0} for op in _COLLECTIVES}
    for line in hlo_text.splitlines():
        m = op_re.search(line)
        if m is None:
            continue
        op = m.group("op")
        census[op]["count"] += 1
        nbytes = 0
        shapes = shape_re.findall(m.group("result"))
        if m.group("start") and len(shapes) > 1:
            # async -start ops return a (operand, result) buffer tuple; only
            # the final shape is the transferred result — don't double-count.
            shapes = shapes[-1:]
        for dtype, dims in shapes:
            if dtype not in _DTYPE_BYTES:
                continue
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            nbytes += n * _DTYPE_BYTES[dtype]
        census[op]["bytes"] += nbytes
    return {op: v for op, v in census.items() if v["count"]}


def format_census(census: Dict[str, Dict[str, int]]) -> str:
    if not census:
        return "no collectives"
    return ", ".join(f"{op} x{v['count']} ({v['bytes'] / 1e6:.2f} MB)"
                     for op, v in sorted(census.items()))


def shard_params(params, mesh: Mesh):
    """Apply `infer_param_sharding` across a pytree.

    The rule is shape-based, so applying it to a whole train state places
    parameters, their EMA copies and the Adam moment trees identically
    (scalars and small tensors stay replicated)."""
    def place(path, leaf):
        path_str = jax.tree_util.keystr(path)
        return jax.device_put(leaf,
                              infer_param_sharding(path_str, leaf.shape, mesh))
    return jax.tree_util.tree_map_with_path(place, params)
