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


def is_main_process() -> bool:
    import jax

    return jax.process_index() == 0
