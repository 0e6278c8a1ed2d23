"""Tracing / profiling helpers (aux subsystem, SURVEY §5).

The reference's only observability is Instant-based timing in an example
(reference examples/webcam_kamera.rs:55-58) and a commented flamegraph
profile.  Here:

  * ``stage_timer`` — wall-clock stage timing with device-queue draining
    (a 1-element fetch; block_until_ready is unreliable through remote-TPU
    relays for some program sizes).
  * ``trace`` — context manager around ``jax.profiler`` emitting a
    TensorBoard-compatible trace directory when the backend supports it.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax
import jax.numpy as jnp
import numpy as np


def drain(tree) -> None:
    """Force completion of every computation feeding ``tree``.

    Fetches one element of one leaf: the device queue is FIFO, so the
    fetch returning implies all prior work completed.
    """
    leaves = jax.tree_util.tree_leaves(tree)
    if leaves:
        np.asarray(jnp.ravel(leaves[0])[:1])


class StageTimer:
    """Accumulates per-stage wall times; ``report()`` pretty-prints."""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, result=None):
        t0 = time.perf_counter()
        yield
        self.totals[name] += time.perf_counter() - t0
        self.counts[name] += 1

    def time_fn(self, name: str, fn, *args, iters: int = 1):
        """Time ``fn`` over ``iters`` calls, draining once at the end."""
        out = fn(*args)
        drain(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        drain(out)
        self.totals[name] += (time.perf_counter() - t0) / iters
        self.counts[name] += 1
        return out

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            t = self.totals[name]
            n = self.counts[name]
            lines.append(f"{name:32s} {t * 1000:9.2f} ms total  x{n}")
        return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/aruco3_tpu_trace"):
    """jax.profiler trace context (no-op if the backend can't trace)."""
    started = False
    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception:
        pass
    try:
        yield log_dir
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass
