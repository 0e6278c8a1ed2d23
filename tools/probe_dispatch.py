#!/usr/bin/env python
"""Separate the relay dispatch floor from single-frame program time.

BASELINE.md config 1 (single 640x480 detect+pose) reports ~474 fps with
round-4 kernels vs ~600 in round 3 — this probe decides whether the
regression is the environment's per-dispatch floor or the program.

Measures, with the same pipelined drain protocol the benches use:
  1. trivial    : x+1 on a (8,128) f32 — pure dispatch floor, no
                  meaningful device time;
  2. vga1       : the config-1 checksum program at batch 1;
  3. vga8       : the same program at batch 8 (device time per frame
                  8x amortized against the same floor).
device-time estimate per VGA frame = (t_vga8 - t_trivial) / 8 assuming
dispatch floor is per-program-invocation; program fixed cost =
t_vga1 - t_trivial - device_frame.
"""

import sys
import time

import numpy as np

sys.path.insert(0, __import__("os").path.join(
    __import__("os").path.dirname(__file__), ".."))

from aruco3_tpu.runtime.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def timeit(fn, args, iters=50):
    out = fn(*args)
    np.asarray(jnp.ravel(jax.tree_util.tree_leaves(out)[0])[:1])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jnp.ravel(jax.tree_util.tree_leaves(out)[0])[:1])
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    from aruco3_tpu import ARDictionary, DetectorConfig, segment
    from aruco3_tpu import pose as pose_mod
    from aruco3_tpu.detector import detect_batch_arrays
    from aruco3_tpu.render import random_marker_scene

    triv = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((8, 128), jnp.float32)
    t_triv = timeit(triv, (x,))
    print(f"trivial dispatch: {t_triv:6.3f} ms", flush=True)

    h, w = 480, 640
    cfg = DetectorConfig()
    d = ARDictionary.new_from_named_dict("ARUCO_DEFAULT")
    ds = cfg.coarse_factor or segment.choose_coarse_factor(h, w)
    params = segment.QuadParams(
        max_candidates=cfg.max_candidates,
        coarse_factor=ds,
        ccl_rounds=cfg.ccl_rounds,
        refine=cfg.refine_corners,
    )
    min_edge = min(w, h) * cfg.min_side_length_factor
    min_sep = min(w, h) * cfg.min_corner_separation_factor

    def chk(frames):
        out = detect_batch_arrays(
            frames, d, cfg, params, min_edge, min_sep, ds
        )
        norm = out["marker_corners"] / jnp.array(
            [float(w), float(h)], jnp.float32
        )
        rot, tr, err = pose_mod.solve_normalized_batch(norm, 40.0)
        return (
            jnp.sum(out["marker_corners"])
            + jnp.sum(out["marker_valid"].astype(jnp.int32))
            + jnp.sum(rot)
            + jnp.sum(tr)
            + jnp.sum(jnp.where(err < 1e30, err, 0.0))
        )

    step = jax.jit(chk)
    rng = np.random.default_rng(0)
    img, _, _ = random_marker_scene(d, 5, (w, h), rng=rng)
    f1 = jnp.asarray(np.asarray(img)[None])
    f8 = jnp.asarray(np.broadcast_to(np.asarray(img), (8, h, w)).copy())
    t1 = timeit(step, (f1,))
    t8 = timeit(step, (f8,))
    dev_frame = max((t8 - t_triv) / 8, 0.0)
    fixed = max(t1 - t_triv - dev_frame, 0.0)
    print(f"vga batch-1: {t1:6.3f} ms  ({1000.0 / t1:7.1f} fps)")
    print(f"vga batch-8: {t8:6.3f} ms  ({8000.0 / t8:7.1f} fps)")
    print(
        f"est device/frame {dev_frame:6.3f} ms; "
        f"program fixed cost over floor {fixed:6.3f} ms; "
        f"dispatch floor {t_triv:6.3f} ms",
        flush=True,
    )


if __name__ == "__main__":
    main()
