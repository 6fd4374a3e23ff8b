"""Device mesh and sharding layout for grit_tpu.

The reference's only parallelism is NCCL data-parallel DDP
(train_caption.py:61, SURVEY.md section 2.3).  On TPU that maps to a
``jax.sharding.Mesh`` and GSPMD: batches are sharded over a ``data`` axis,
parameters are replicated (or tensor-sharded over a ``model`` axis), and XLA
inserts the gradient ``psum`` and any tensor-parallel collectives over ICI —
there is no hand-written communication.

Mesh layout:
- axis ``data``: data parallelism (gradient all-reduce — DDP equivalent);
- axis ``model``: optional tensor parallelism.  GRIT is ~200M params so TP is
  not needed for memory, but sharding the widest matmuls (vocab head, FFNs)
  over ``model`` lets small batches scale past the point where pure DP runs
  out of per-chip batch.  With ``model=1`` this degenerates to pure DP.

``param_shardings`` derives a NamedSharding pytree from parameter-path rules;
passing those shardings to ``jax.jit``'s in_shardings is all GSPMD needs —
the collectives come out of the compiler, following the standard
mesh/annotate/compile recipe.
"""

from __future__ import annotations

import re
from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# parameter-path regexes -> PartitionSpec over ('data', 'model') axes.
# Only the big, safely-shardable matmuls are tensor-sharded; everything else
# is replicated.  Rules are matched against '/'-joined flax param paths.
_TP_RULES: list[tuple[re.Pattern, P]] = [
    # caption-generator vocab head [d_model, vocab] — shard vocab
    (re.compile(r"cap_generator/fc/kernel$"), P(None, "model")),
    # FFN up-projections [d_model, d_ff] — shard d_ff
    (re.compile(r"pwff/fc1/kernel$"), P(None, "model")),
    # FFN down-projections [d_ff, d_model] — shard d_ff (contracting)
    (re.compile(r"pwff/fc2/kernel$"), P("model", None)),
    # Swin MLPs
    (re.compile(r"mlp/fc1/kernel$"), P(None, "model")),
    (re.compile(r"mlp/fc2/kernel$"), P("model", None)),
]


def make_mesh(
    n_data: int | None = None,
    n_model: int = 1,
    devices=None,
) -> Mesh:
    """Build a ('data', 'model') mesh. Defaults to all devices on the data axis."""
    if devices is None:
        devices = jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    need = n_data * n_model
    if len(devices) < need:
        raise ValueError(
            f"make_mesh needs {need} devices (data={n_data} x model={n_model}) "
            f"but only {len(devices)} are visible: {devices}. "
            "To fake an N-device mesh on CPU set JAX_PLATFORMS=cpu and "
            "XLA_FLAGS=--xla_force_host_platform_device_count=N before jax "
            "initializes its backend."
        )
    devs = np.asarray(devices[:need]).reshape(n_data, n_model)
    return Mesh(devs, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis batch sharding over the data axis."""
    return NamedSharding(mesh, P("data"))


def pad_to_multiple(
    tree: Any, multiple: int, int_fill: int = 1, int_first: int | None = None
) -> Any:
    """Zero-pad each leaf's leading axis up to a multiple of ``multiple``.

    Integer leaves are filled with ``int_fill`` (default 1 = the vocab's
    ``<pad>`` id).  CAPTION callers must additionally pass
    ``int_first`` (the ``<bos>`` id): an all-<pad> caption row would mask
    EVERY self-attention key for its queries and softmax(all -inf) is
    NaN — one ragged batch would poison the loss and every gradient.  A
    leading BOS keeps one visible key per row while the shifted NLL targets
    (``captions[:, 1:]``, all <pad>) still carry zero weight, so the loss
    and gradients stay bit-identical to the unpadded batch.  ``int_first``
    is an explicit opt-in (default None = plain fill) precisely because it
    bakes a vocab convention into the padded rows: non-caption integer
    leaves (detection labels, token-type ids, ...) must NOT receive a
    spurious BOS at column 0.  Float and bool leaves pad with zeros (a zero
    image with an all-valid mask is numerically safe; its outputs carry
    zero weight downstream).
    """
    if multiple <= 1:
        return tree

    def pad(x):
        if not hasattr(x, "shape") or x.ndim == 0:
            return x
        rem = (-x.shape[0]) % multiple
        if rem == 0:
            return x
        arr = np.asarray(x)
        if np.issubdtype(arr.dtype, np.integer) and arr.dtype != np.uint8:
            # uint8 is the raw-RGB image wire format, not token ids — it
            # pads with zero pixels like float images, never int_fill/BOS
            block = np.full((rem,) + arr.shape[1:], int_fill, dtype=arr.dtype)
            if int_first is not None and arr.ndim >= 2 and arr.shape[1] > 0:
                block[:, 0] = int_first
        else:
            block = np.zeros((rem,) + arr.shape[1:], dtype=arr.dtype)
        return np.concatenate([arr, block], axis=0)

    return jax.tree.map(pad, tree)


def shard_batch(
    tree: Any, mesh: Mesh, int_fill: int = 1, int_first: int | None = None
) -> Any:
    """Device-put a host batch with its leading axis split over ``data``.

    Batches whose leading axis is not divisible by the data axis (e.g. a
    short final eval batch) are padded with ``pad_to_multiple`` and sharded
    normally — never silently replicated (which would cost n_data x memory
    and compute on every device).  Callers track the true batch size
    themselves (``len(batch['image_id'])``) and slice/weight outputs.

    Single-host: a plain sharded device_put.  Multi-host: each process holds
    its rank's slice of the global batch (the loader shards by rank/world
    like DistributedSampler); each local slice is padded to the local device
    count and the slices assemble into one global array via
    ``make_array_from_process_local_data``.
    """
    sharding = batch_sharding(mesh)
    n_data = mesh.shape.get("data", 1)

    if jax.process_count() > 1:
        if n_data % jax.process_count():
            raise ValueError(
                f"data axis ({n_data}) must divide evenly across "
                f"{jax.process_count()} processes: every process pads its "
                "local slice to the same per-process device count, and an "
                "uneven split would hand make_array_from_process_local_data "
                "inconsistently sized slices."
            )
        local = n_data // jax.process_count()
        tree = pad_to_multiple(tree, local, int_fill, int_first)

        def put(x):
            return jax.make_array_from_process_local_data(sharding, np.asarray(x))

        return jax.tree.map(put, tree)

    tree = pad_to_multiple(tree, n_data, int_fill, int_first)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Fully replicate a pytree across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def param_shardings(params: Any, mesh: Mesh, tensor_parallel: bool = True) -> Any:
    """NamedSharding pytree for params: TP rules on big matmuls, else replicated.

    With ``mesh`` having model-axis size 1 (or tensor_parallel=False) this is
    full replication — the DDP-equivalent layout.
    """
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    use_tp = tensor_parallel and mesh.shape.get("model", 1) > 1

    def spec_for(path_str: str, x) -> P:
        if use_tp:
            for pat, spec in _TP_RULES:
                if pat.search(path_str):
                    # only shard if the dimension divides evenly
                    dims = [d for d in spec if d is not None]
                    ok = True
                    for axis_i, axis_name in enumerate(spec):
                        if axis_name is not None and (
                            axis_i >= x.ndim
                            or x.shape[axis_i] % mesh.shape[axis_name] != 0
                        ):
                            ok = False
                    if ok and dims:
                        return spec
        return P()

    def path_to_str(path) -> str:
        parts = []
        for p in path:
            if hasattr(p, "key"):
                parts.append(str(p.key))
            elif hasattr(p, "idx"):
                parts.append(str(p.idx))
        return "/".join(parts)

    specs = {path_to_str(path): spec_for(path_to_str(path), leaf) for path, leaf in flat}

    def to_sharding(path, leaf):
        return NamedSharding(mesh, specs[path_to_str(path)])

    return jax.tree_util.tree_map_with_path(to_sharding, params)


def shard_params(params: Any, mesh: Mesh, tensor_parallel: bool = True) -> Any:
    """Device-put params according to ``param_shardings``."""
    shardings = param_shardings(params, mesh, tensor_parallel)
    return jax.tree.map(jax.device_put, params, shardings)
