#!/usr/bin/env python
"""Sub-stage cost split of the fused frontend kernel on the real TPU.

Times three variants at the headline geometry (1080p, batch 128):
  full   : emit_packed + grey canvas (the production configuration)
  nopack : threshold + opening + pooling only (no near plane, no packed
           int16 write)
  thresh : threshold + pooling only (open_radius=0)

The deltas split the ~25 ms stage into threshold / morphology / packed-
plane shares, deciding where bit-packing effort goes.  Relay timing per
CLAUDE.md: warm, drain via a one-element fetch, then time N iterations
and drain again.
"""

import sys
import time

import numpy as np

sys.path.insert(0, __import__("os").path.join(
    __import__("os").path.dirname(__file__), ".."))

from aruco3_tpu.runtime.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()  # persist remote-compiler output across runs

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from aruco3_tpu.ops.frontend_pallas import fused_threshold_open_pool  # noqa: E402


def drain(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jnp.ravel(leaf)[:1])


def timeit(fn, frames, iters=8):
    out = fn(frames)
    drain(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(frames)
    drain(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    b, h, w = (int(x) for x in (sys.argv[1:4] or [128, 1080, 1920]))
    rng = np.random.default_rng(0)
    frames = jnp.asarray(
        rng.integers(0, 256, (b, h, w), dtype=np.uint8))

    def prod(f, stop):
        # Production config: SPLIT planes (u8 grey + near words; warp
        # L0 reads the grey plane), min_rows as the detector computes
        # it at 1080p.
        return fused_threshold_open_pool(
            f, ds=10, emit_packed=True, emit_level1=True,
            emit_split=True,
            min_rows=1096 if (h, w) == (1080, 1920) else None,
            _stop_after=stop,
        )

    # Cumulative ladder at the PRODUCTION config: every step keeps the
    # full output-write traffic (stub blocks), so deltas isolate the
    # named stage's compute.  "src" is the host-side canvas zeros+DUS
    # alone (no kernel).
    ladder = [
        "src", "dma", "cast", "colsum", "rowsum", "black", "pack",
        "morph", None,
    ]
    if len(sys.argv) > 4:  # probe_frontend.py B H W stage [stage...]
        ladder = [None if s == "full" else s for s in sys.argv[4:]]
    prev = 0.0
    for stop in ladder:
        jfn = jax.jit(lambda f, s=stop: prod(f, s))
        ms = timeit(jfn, frames)
        name = stop or "full"
        print(
            f"{name:8s} {ms:7.2f} ms/batch{b}  delta {ms - prev:7.2f}",
            flush=True,
        )
        prev = ms

    if len(sys.argv) > 4:
        return
    variants = {
        "nopack": lambda f: fused_threshold_open_pool(
            f, ds=10, emit_packed=False),
        "thresh": lambda f: fused_threshold_open_pool(
            f, ds=10, open_radius=0, emit_packed=False),
    }
    for name, fn in variants.items():
        jfn = jax.jit(fn)
        ms = timeit(jfn, frames)
        print(f"{name:8s} {ms:7.2f} ms/batch{b}", flush=True)


if __name__ == "__main__":
    main()
