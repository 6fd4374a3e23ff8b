"""Observability helpers: smoothed metrics, iteration logging, profiling.

Capability parity with the reference's logging utilities
(engine/utils.py:26-238 — SmoothedValue window/global stats, MetricLogger
``log_every`` with iter/data timing and device-memory prints) plus the TPU
equivalents of its profiling hooks: ``jax.profiler`` trace annotation and
device memory stats instead of ``torch.cuda.max_memory_allocated``.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict, deque


class SmoothedValue:
    """Windowed + global average of a scalar series."""

    def __init__(self, window_size: int = 20, fmt: str = "{median:.4f} ({global_avg:.4f})"):
        self.deque: deque = deque(maxlen=window_size)
        self.total = 0.0
        self.count = 0
        self.fmt = fmt

    def update(self, value, n: int = 1):
        self.deque.append(float(value))
        self.count += n
        self.total += float(value) * n

    @property
    def median(self) -> float:
        d = sorted(self.deque)
        return d[len(d) // 2] if d else 0.0

    @property
    def avg(self) -> float:
        return sum(self.deque) / len(self.deque) if self.deque else 0.0

    @property
    def global_avg(self) -> float:
        return self.total / max(self.count, 1)

    @property
    def value(self) -> float:
        return self.deque[-1] if self.deque else 0.0

    def __str__(self):
        return self.fmt.format(
            median=self.median, avg=self.avg, global_avg=self.global_avg,
            value=self.value,
        )


class MetricLogger:
    def __init__(self, delimiter: str = "  "):
        self.meters: dict[str, SmoothedValue] = defaultdict(SmoothedValue)
        self.delimiter = delimiter

    def update(self, **kwargs):
        for k, v in kwargs.items():
            self.meters[k].update(float(v))

    def __getattr__(self, name):
        if name in self.meters:
            return self.meters[name]
        raise AttributeError(name)

    def __str__(self):
        return self.delimiter.join(f"{k}: {m}" for k, m in self.meters.items())

    def log_every(self, iterable, print_freq: int, header: str = ""):
        """Yield items, printing timing + meters every ``print_freq`` iters."""
        i = 0
        start = time.time()
        iter_time = SmoothedValue(fmt="{avg:.4f}")
        data_time = SmoothedValue(fmt="{avg:.4f}")
        end = time.time()
        total = len(iterable) if hasattr(iterable, "__len__") else None
        for obj in iterable:
            data_time.update(time.time() - end)
            yield obj
            iter_time.update(time.time() - end)
            if i % print_freq == 0:
                mem = device_memory_mb()
                msg = (f"{header} [{i}{'/' + str(total) if total else ''}]  "
                       f"{self}  time: {iter_time}  data: {data_time}")
                if mem is not None:
                    msg += f"  mem: {mem:.0f}MB"
                print(msg)
            i += 1
            end = time.time()
        print(f"{header} total: {time.time() - start:.1f}s")


def _host_cache_tag() -> str:
    """Short signature of this host's CPU, mixed into the cache path.

    XLA:CPU executables bake in the compile machine's feature set; an entry
    written on one host can SIGILL (or fail dispatch) on another.  Observed
    in practice: a container migrated between machines left a stale cache
    that crashed one rank of a 2-process run, hanging the other rank's Gloo
    rendezvous for a collective the crashed rank never joined."""
    import hashlib

    sig = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("model name", "flags")):
                    sig += line  # model name AND flags both key the tag
                    if line.startswith("flags"):
                        break
    except OSError:
        pass
    return hashlib.sha1(sig.encode()).hexdigest()[:8]


def enable_compile_cache(
    path: str = "/tmp/jax_grit_cache", min_compile_secs: float = 5.0
) -> None:
    """Persistent XLA compile cache — full-size graphs take ~10 min to build;
    the second run of any CLI should not pay that again.

    The directory is keyed by the host CPU signature: XLA:CPU AOT results
    bake in the compile machine's features, and a container migration would
    otherwise serve stale executables (SIGILL).  The single place for this
    keying — bench.py and tests/conftest.py call here too.
    """
    import jax

    try:
        jax.config.update(
            "jax_compilation_cache_dir", f"{path}-{_host_cache_tag()}"
        )
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", min_compile_secs
        )
    except Exception:
        pass


def seed_host_rngs(seed: int, *, per_process: bool = False) -> None:
    """Seed the HOST-side RNGs (python ``random`` + ``np.random``) that the
    augmentation pipelines draw from (RandAugment, detection crops/flips).

    Device randomness is threaded explicitly via jax PRNG keys; this covers
    the rest, mirroring the reference's startup seeding
    (train_caption.py:30-32 seed; train_detector.py:116-120 seed + rank —
    ``per_process=True`` adds ``jax.process_index()`` so data-parallel
    hosts draw distinct augmentations, as the reference's per-rank seed
    does)."""
    import random

    import numpy as np

    if per_process:
        import jax

        seed = seed + jax.process_index()
    random.seed(seed)
    np.random.seed(seed % (2 ** 32))


def device_memory_mb() -> float | None:
    """Live HBM usage of device 0, if the backend exposes it."""
    try:
        import jax

        stats = jax.devices()[0].memory_stats()
        return stats["bytes_in_use"] / 1e6
    except Exception:
        return None


@contextlib.contextmanager
def trace_annotation(name: str):
    """jax.profiler trace span (the torch.cuda.synchronize-timer equivalent)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield


def start_profiler_trace(logdir: str):
    import jax

    jax.profiler.start_trace(logdir)


def stop_profiler_trace():
    import jax

    jax.profiler.stop_trace()
