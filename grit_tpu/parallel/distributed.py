"""Multi-host bootstrap: the reference's mp.spawn/env:// rendezvous, TPU-style.

The reference launches one process per GPU with a MASTER_ADDR/PORT
rendezvous (train_caption.py:27-28, :207-216).  On TPU pods each host runs
one process that drives its local chips; ``jax.distributed.initialize``
performs the rendezvous and ``jax.devices()`` then spans the whole slice, so
the SAME mesh/GSPMD code scales from 1 chip to a pod with no further
plumbing.

Call ``maybe_initialize()`` at CLI start: it is a no-op for single-host runs
and reads the standard env (``COORDINATOR_ADDRESS``/``NUM_PROCESSES``/
``PROCESS_ID``, or the TPU metadata autodetection) otherwise.
"""

from __future__ import annotations

import os


def maybe_initialize() -> tuple[int, int]:
    """Initialize jax.distributed if a multi-process env is configured.

    Returns (process_index, process_count).
    """
    import jax

    coord = os.environ.get("COORDINATOR_ADDRESS")
    nproc = os.environ.get("NUM_PROCESSES")
    if coord and nproc:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(nproc),
            process_id=int(os.environ.get("PROCESS_ID", "0")),
        )
    elif os.environ.get("TPU_WORKER_HOSTNAMES", "").count(",") > 0:
        # multi-host TPU slice: autodetect from the TPU metadata
        jax.distributed.initialize()
    return jax.process_index(), jax.process_count()


def allgather_pyobj(obj):
    """Allgather arbitrary per-process Python objects -> list (one per rank).

    The reference's pickled-byte-tensor all_gather (engine/utils.py:102-142):
    pickle, pad each rank's bytes to the global max, allgather, unpickle.
    Used for COCO eval merges and rank-specialized eval score exchange.
    """
    import pickle

    import jax
    import numpy as np

    if jax.process_count() == 1:
        return [obj]
    from jax.experimental import multihost_utils

    # callers arrive here after rank-DIVERGENT work (rank-specialized eval,
    # per-rank detection shards) — realign before process_allgather's first
    # execution has to initialize its Gloo context (~30 s rendezvous cap)
    barrier("allgather_pyobj")

    payload = np.frombuffer(pickle.dumps(obj), np.uint8)
    sizes = np.asarray(
        multihost_utils.process_allgather(np.asarray([payload.size]))
    ).ravel()
    padded = np.zeros(int(sizes.max()), np.uint8)
    padded[: payload.size] = payload
    stacked = np.asarray(multihost_utils.process_allgather(padded))
    return [
        pickle.loads(row[: int(size)].tobytes())
        for row, size in zip(stacked, sizes)
    ]


def sync_hosts(name: str = "barrier") -> None:
    """Cross-host barrier (the reference's dist.barrier equivalent)."""
    import jax

    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)


_barrier_seq: dict = {}


def barrier(name: str, timeout_ms: int = 900_000) -> None:
    """Align all processes WITHOUT a device collective.

    Uses the jax.distributed coordination service (gRPC key-value store), so
    it works even when the ranks are minutes apart — unlike
    ``sync_global_devices``, whose underlying psum must initialize a CPU
    collectives (Gloo) context whose key-value rendezvous has a hardcoded
    ~30 s deadline.  XLA creates one such context per compiled executable's
    first execution, so training loops call this before every program's
    first run: it bounds the rank skew at context init to one same-program
    compile-time delta instead of the accumulated divergence (e.g. after
    rank-SPECIALIZED eval, where ranks compile and run different programs).

    ``name`` is made unique per call site invocation via an internal counter
    (coordination-service barrier ids are single-use).
    """
    import jax

    if jax.process_count() <= 1:
        return
    from jax._src import distributed

    client = distributed.global_state.client
    if client is None:  # initialized by other means; device barrier fallback
        sync_hosts(name)
        return
    seq = _barrier_seq.get(name, 0)
    _barrier_seq[name] = seq + 1
    client.wait_at_barrier(f"{name}/{seq}", timeout_ms)


def is_main_process() -> bool:
    import jax

    return jax.process_index() == 0


def align_compile(jitted, *args, tag: str, **kwargs) -> None:
    """AOT-compile ``jitted`` for these args, then realign all ranks.

    Multi-process only (no-op otherwise).  The FIRST execution of every XLA
    executable containing CPU collectives performs a Gloo context rendezvous
    with a hardcoded ~30 s deadline; two ranks compiling a multi-minute
    program on a loaded host can easily skew past that, which kills the
    training run (observed: GetKeyValue() DEADLINE_EXCEEDED mid-epoch).
    Compiling FIRST — which also populates the persistent compile cache, so
    the subsequent real call recompiles from cache in seconds — and then
    waiting at a coordination-service barrier bounds the rank skew at
    context init to a cache-deserialize delta.

    Call once per distinct (program, shape) right before its first real
    invocation; training loops do this for the step/eval programs.
    """
    import jax

    if jax.process_count() <= 1:
        return
    jitted.lower(*args, **kwargs).compile()
    barrier("compiled_" + tag)
