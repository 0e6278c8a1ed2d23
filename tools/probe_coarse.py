#!/usr/bin/env python
"""Cost ladder of the coarse mega-kernel on the real TPU.

Times coarse_labels variants with stages disabled via its static round
args, isolating: pass-1 floods, pass-1 CCL, pass-2 floods, pass-2 CCL.
Input is the REAL frontend coarse mask of the bench scene (convergence
skips depend on content, so random masks would mis-profile).

Usage: python tools/probe_coarse.py [batch] [variant-indices...]
(each variant is a separate slow remote compile — run 2-3 per invocation)
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np

from aruco3_tpu.runtime.cache import enable_compilation_cache

enable_compilation_cache()  # persist remote-compiler output across runs

from profile_stages import build_frames


def main():
    import jax
    import jax.numpy as jnp

    from aruco3_tpu import DetectorConfig, ARDictionary, frontend, segment
    from aruco3_tpu.ops.coarse_pallas import coarse_labels
    from aruco3_tpu.ops.frontend_pallas import fused_threshold_open_pool

    h, w = 1080, 1920
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    cfg = DetectorConfig()
    dictionary = ARDictionary.new_from_named_dict("ARUCO_MIP_36H12")
    ds = segment.choose_coarse_factor(h, w)
    params = segment.QuadParams(
        max_candidates=cfg.max_candidates,
        max_inner_candidates=cfg.max_inner_candidates,
        coarse_factor=ds,
        ccl_rounds=cfg.ccl_rounds,
        refine=cfg.refine_corners,
    )
    frames = jnp.asarray(build_frames(h, w, batch, dictionary))
    grey = frontend.rgb_to_luma_u8(frames)
    coarse = fused_threshold_open_pool(
        grey, cfg.threshold_window, params.open_radius, ds,
        emit_packed=True, emit_grey_canvas=True, emit_level1=True,
    )[0]
    coarse = jax.block_until_ready(coarse)
    print(f"coarse grid {coarse.shape}", flush=True)

    VARIANTS = [
        # (name, overrides)
        ("full", {}),
        ("pass1 only", {"inner": False}),
        ("pass1 floods", {"inner": False, "ccl_rounds": 0}),
        ("floods only", {"ccl_rounds": 0, "inner_ccl_rounds": 0}),
        ("depth1 only", {"inner_depths": 1}),
        # Wrapper+pack/unpack+remap floor: no flood/scan rounds at all.
        ("empty", {"bg_rounds": 0, "fill_rounds": 0, "ccl_rounds": 0,
                   "inner_ccl_rounds": 0, "inner_flood_rounds": 0,
                   "inner_fill_rounds": 0, "inner_depths": 1}),
    ]
    which = [int(x) for x in sys.argv[2:]] or list(range(len(VARIANTS)))
    for name, ov in [VARIANTS[i] for i in which]:
        kw = dict(
            bg_rounds=params.bg_rounds,
            fill_rounds=params.fill_rounds,
            ccl_rounds=params.ccl_rounds,
            inner_ccl_rounds=params.inner_ccl_rounds,
            inner_depths=params.inner_depths,
            inner_flood_rounds=params.inner_flood_rounds,
            inner_fill_rounds=params.inner_fill_rounds,
            inner=params.max_inner_candidates > 0,
        )
        kw.update(ov)

        @jax.jit
        def fn(c):
            l1, l2 = coarse_labels(c, **kw)
            return jnp.sum(l1[:, ::7, ::7]) + jnp.sum(l2[:, ::7, ::7])

        out = fn(coarse)
        _ = float(out)  # warm + drain
        t0 = time.perf_counter()
        for _ in range(10):
            out = fn(coarse)
        _ = float(out)
        dt = (time.perf_counter() - t0) / 10 * 1000
        print(f"{name:>14s}: {dt:7.2f} ms", flush=True)
        prev = dt


if __name__ == "__main__":
    main()
