"""Device mesh construction and sharding rules.

The reference has no in-tree parallelism (single-GPU Lightning,
SURVEY.md section 2c). The TPU-native design makes parallelism first-class:

- a 2-D logical mesh ``('data', 'model')`` over ICI;
- batch tensors sharded on ``data``;
- parameters replicated by default, with optional tensor-parallel sharding
  of the ViT attention heads / MLP hidden dim on ``model`` (the models are
  small, so TP is an opt-in scale-out axis, not a requirement);
- gradients/metrics all-reduced by pjit-inserted collectives — no hand-rolled
  NCCL-style code.
"""

from __future__ import annotations

import dataclasses
import re
from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Multi-host bring-up: ``jax.distributed.initialize`` with env-based
    autodetection (TPU pods). Single-process runs are a no-op. Data
    parallelism then spans hosts over DCN while the in-host axis rides ICI
    — the mesh construction below is identical either way.
    """
    import os

    if num_processes in (None, 1) and "JAX_COORDINATOR_ADDRESS" not in os.environ \
            and coordinator_address is None:
        return  # single process
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


@dataclasses.dataclass(frozen=True)
class MeshSpec:
    """Logical mesh shape; -1 means 'all remaining devices'."""
    data: int = -1
    model: int = 1


def build_mesh(spec: MeshSpec | None = None,
               devices: list | None = None) -> Mesh:
    """Build a ('data', 'model') mesh over the available devices."""
    spec = spec or MeshSpec()
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    model = spec.model if spec.model > 0 else 1
    data = spec.data if spec.data > 0 else n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree: Any, axis: str = DATA_AXIS,
                leading_stack: bool = False,
                force_replicated: bool = False) -> Any:
    """Assemble a loader batch into GLOBAL arrays sharded over ``axis``.

    The one entry point for feeding data to jitted steps, identical for 1
    and N processes (the reference inherits Lightning's single-device
    placement; SURVEY.md section 2c promises DP that spans hosts):

    - single process: ``jax.device_put`` with a ``NamedSharding`` — batch
      rows spread over the data axis, everything else replicated;
    - multi-process: each process passes its LOCAL rows (``1/process_count``
      of the global batch, see ``PrefetchLoader`` process sharding) and
      ``jax.make_array_from_process_local_data`` assembles the global
      array, so jitted steps see one logical batch and XLA's collectives
      handle every cross-host reduction.

    Leaves whose leading dim doesn't divide the data axis (or 0-d/aux
    leaves) are replicated. With ``leading_stack=True`` dim 0 is a
    grad-accum stack and dim 1 is the batch dim (spec ``P(None, axis)``).
    Non-array leaves (string lists) pass through untouched.
    """
    nproc = jax.process_count()
    nshard = mesh.shape[axis]

    def put(x):
        if not isinstance(x, (np.ndarray, jax.Array)):
            return x
        bdim = 1 if leading_stack else 0
        global_rows = x.shape[bdim] * nproc if x.ndim > bdim else 0
        if (not force_replicated and x.ndim > bdim
                and global_rows % nshard == 0 and global_rows > 0):
            spec = P(*([None] * bdim), axis)
        else:
            spec = P()
        sharding = NamedSharding(mesh, spec)
        if isinstance(x, jax.Array):
            return jax.device_put(x, sharding)
        if nproc == 1:
            return jax.device_put(x, sharding)
        if spec == P():
            if not force_replicated:
                # The loader SHARDED rows across processes but the global
                # batch doesn't divide the data axis: every process holds
                # a DIFFERENT slice, so "replicate local data" would give
                # each process a different idea of the same global array
                # (silent divergence). Gather the full batch first.
                from jax.experimental import multihost_utils

                gathered = np.asarray(multihost_utils.process_allgather(x))
                x = np.concatenate(list(gathered), axis=bdim)
            # Replicated leaf: every process now holds the full
            # (identical) array.
            return jax.make_array_from_process_local_data(
                sharding, x, x.shape)
        global_shape = (x.shape[:bdim] + (global_rows,)
                        + x.shape[bdim + 1:])
        return jax.make_array_from_process_local_data(
            sharding, x, global_shape)

    return jax.tree.map(put, tree)


def local_rows(arr: jax.Array) -> np.ndarray:
    """Host copy of this process's rows of a batch-dim-sharded array.

    Fully-addressable arrays (single process) return the whole array.
    Multi-process: concatenates the addressable shards in global row
    order, i.e. exactly the rows this process's loader contributed — used
    by the per-sample test collector to key metrics to local sample ids.
    Shards replicated along the batch dim (``index[0] == slice(None)``,
    e.g. a trailing batch the loader replicated) and duplicates from
    model-axis replication (mesh_model > 1 puts the same rows on several
    devices) are deduplicated by row range, not concatenated twice.
    """
    if arr.is_fully_addressable:
        return np.asarray(arr)
    return _concat_local_shards(arr.addressable_shards)


def gather_rows(arr: jax.Array) -> np.ndarray:
    """Full host copy of a (possibly cross-process-sharded) array.

    For the small (B,) per-sample metric vectors: every process gets all
    rows regardless of the output sharding GSPMD picked, and the caller
    slices its own deterministic global row range (exactly-once
    coverage; see ``cli/test_depth.py``). Collective when multi-process
    — every process must call it on the same arrays in the same order."""
    if arr.is_fully_addressable:
        return np.asarray(arr)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(arr, tiled=True))


def _concat_local_shards(shards) -> np.ndarray:
    """Row-order concat of addressable shards, deduplicated.

    Each shard needs ``.index`` (tuple of slices into the global array)
    and ``.data``. Handles the two replication layouts ``local_rows``
    meets in practice: a batch-dim-replicated array (``index[0] ==
    slice(None)``, e.g. a trailing batch the loader replicated) returns
    one shard's data; model-axis replication (mesh_model > 1 puts the
    same rows on several devices) is deduplicated by row start instead
    of concatenated twice."""
    by_start: dict[int, Any] = {}
    for s in shards:
        start = s.index[0].start if s.index else None
        if start is None:  # batch dim replicated: any one shard has it all
            return np.asarray(s.data)
        by_start.setdefault(start, s)
    return np.concatenate(
        [np.asarray(by_start[k].data) for k in sorted(by_start)], axis=0)


# Tensor-parallel rules for ViT parameters, matched against the flattened
# parameter path ("/"-joined). Column-parallel on qkv/fc1, row-parallel on
# proj/fc2 — the classic Megatron split, expressed purely as shardings so
# XLA inserts the all-reduces.
_TP_RULES: list[tuple[str, P]] = [
    (r".*attn/qkv/kernel$", P(None, MODEL_AXIS)),
    (r".*attn/qkv/bias$", P(MODEL_AXIS)),
    (r".*attn/proj/kernel$", P(MODEL_AXIS, None)),
    (r".*mlp/fc1/kernel$", P(None, MODEL_AXIS)),
    (r".*mlp/fc1/bias$", P(MODEL_AXIS)),
    (r".*mlp/fc2/kernel$", P(MODEL_AXIS, None)),
    # Fused-SwiGLU FFN (vitg): w12 column-parallel, w3 row-parallel.
    # The gate/value halves of w12 land interleaved across shards; GSPMD
    # keeps the split-and-multiply exact (a reshard, not a wrong answer).
    (r".*mlp/w12/kernel$", P(None, MODEL_AXIS)),
    (r".*mlp/w12/bias$", P(MODEL_AXIS)),
    (r".*mlp/w3/kernel$", P(MODEL_AXIS, None)),
]


def _spec_for_path(path: str, tp: bool) -> P:
    if tp:
        for pattern, spec in _TP_RULES:
            if re.fullmatch(pattern, path):
                return spec
    return P()


# Leaves smaller than this stay replicated under FSDP: sharding a handful
# of KB trades an all-gather launch for no memory win.
FSDP_MIN_SIZE = 2 ** 15


def fsdp_spec(shape: tuple[int, ...], mesh: Mesh,
              base: P = P(), min_size: int = FSDP_MIN_SIZE) -> P:
    """ZeRO-style spec: shard the largest dim divisible by the data axis.

    ``base`` is an existing (e.g. tensor-parallel) spec for the leaf; the
    data axis goes on the largest remaining ``None`` dim whose extent it
    divides, so FSDP composes with Megatron TP (params end up sharded over
    BOTH mesh axes). Leaves with fewer than ``min_size`` elements, or with
    no divisible dim, keep ``base`` (replicated over the data axis) —
    XLA's GSPMD then all-gathers each param just-in-time for its use and
    reduce-scatters its gradient, which is exactly the ZeRO-3 schedule
    expressed purely as shardings.
    """
    ndata = mesh.shape[DATA_AXIS]
    n = 1
    for d in shape:
        n *= d
    if ndata <= 1 or n < min_size:
        return base
    entries = list(base) + [None] * (len(shape) - len(base))
    best = -1
    for dim, extent in enumerate(shape):
        if entries[dim] is None and extent % ndata == 0 and extent >= ndata:
            if extent > (shape[best] if best >= 0 else 0):
                best = dim
    if best < 0:
        return base
    entries[best] = DATA_AXIS
    return P(*entries)


def fsdp_sharding(mesh: Mesh, shape: tuple[int, ...],
                  min_size: int = FSDP_MIN_SIZE) -> NamedSharding:
    """``NamedSharding`` form of ``fsdp_spec`` for one array shape."""
    return NamedSharding(mesh, fsdp_spec(tuple(shape), mesh,
                                         min_size=min_size))


def param_shardings(mesh: Mesh, params: Any, tensor_parallel: bool = False,
                    fsdp: bool = False,
                    fsdp_min_size: int = FSDP_MIN_SIZE):
    """NamedSharding pytree for a parameter pytree.

    With ``tensor_parallel=False`` (default) everything is replicated; with
    True, ViT attention/MLP weights are sharded over the ``model`` axis.
    With ``fsdp=True`` every large leaf is additionally sharded over the
    ``data`` axis (see ``fsdp_spec``).
    """
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def path_str(kp) -> str:
        parts = []
        for k in kp:
            if hasattr(k, "key"):
                parts.append(str(k.key))
            elif hasattr(k, "idx"):
                parts.append(str(k.idx))
            else:
                parts.append(str(k))
        return "/".join(parts)

    tp = tensor_parallel and mesh.shape[MODEL_AXIS] > 1

    def shard_one(kp, leaf):
        spec = _spec_for_path(path_str(kp), tp)
        # Drop specs that don't divide the dimension evenly.
        if tp and spec != P():
            for dim, axis in enumerate(spec):
                if axis is not None and (
                        dim >= leaf.ndim
                        or leaf.shape[dim] % mesh.shape[axis] != 0):
                    spec = P()
                    break
        if fsdp:
            spec = fsdp_spec(tuple(leaf.shape), mesh, base=spec,
                             min_size=fsdp_min_size)
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(shard_one, params)
