#!/usr/bin/env python
"""Standalone refine-kernel timing on real inputs (bench scene).

Builds the split planes + candidates once, then times ONLY
refine_corners_batch (drained via a one-element fetch).

Usage: python tools/probe_refine.py [batch]
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

    from aruco3_tpu import ARDictionary, DetectorConfig, frontend, segment
    from aruco3_tpu.ops.coarse_pallas import coarse_labels
    from aruco3_tpu.ops.fit_pallas import fit_quads_batch
    from aruco3_tpu.ops.frontend_pallas import (
        fused_threshold_open_pool, split_strip_rows,
    )
    from aruco3_tpu.ops.refine_pallas import refine_corners_batch

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    h, w = 1080, 1920
    cfg = DetectorConfig()
    dictionary = ARDictionary.new_from_named_dict("ARUCO_MIP_36H12")
    ds = segment.choose_coarse_factor(h, w)
    params = segment.QuadParams(
        max_candidates=cfg.max_candidates,
        max_inner_candidates=cfg.max_inner_candidates,
        coarse_factor=ds,
        ccl_rounds=cfg.ccl_rounds,
    )
    th = split_strip_rows(ds)
    wn = segment.refine_window_size(params, ds)
    frames = build_frames(h, w, batch, dictionary)

    @jax.jit
    def front(images):
        grey = frontend.rgb_to_luma_u8(images)
        sh_r = -(-(wn + 31) // 32) * 32
        need_refine = (max(h - wn, 0) // 32) * 32 + sh_r
        coarse, greyp, nearw, _l1 = fused_threshold_open_pool(
            grey, cfg.threshold_window, params.open_radius, ds,
            emit_packed=True, emit_level1=True, emit_split=True,
            min_rows=need_refine,
        )
        labels1, labels2 = coarse_labels(
            coarse, params.bg_rounds, params.fill_rounds, params.ccl_rounds,
            inner_ccl_rounds=params.inner_ccl_rounds,
            inner_depths=params.inner_depths,
            inner_flood_rounds=params.inner_flood_rounds,
            inner_fill_rounds=params.inner_fill_rounds,
        )
        f1 = fit_quads_batch(labels1, ds, params, params.max_candidates)
        f2 = fit_quads_batch(
            labels2, ds, params, params.max_inner_candidates
        )
        cand = jax.vmap(
            lambda la, lb, fa, fb: segment.merge_fits(
                la, lb, fa, fb, params, ds
            )
        )(labels1, labels2, f1, f2)
        return greyp, nearw, cand

    greyp, nearw, cand = front(frames)
    greyp, nearw = jax.block_until_ready((greyp, nearw))[0:2]
    nvalid = float(jnp.mean(jnp.sum(cand["valid"], axis=1)))
    print(f"valid lanes/frame mean: {nvalid:.1f}")

    fn = jax.jit(
        lambda gp, nw, q, c, ii, ic, v: refine_corners_batch(
            gp, q, c, ii, ds, wn, inner_coarse=ic, image_hw=(h, w),
            valid=v, near_words=nw, strip_rows=th,
        )
    )
    args = (
        greyp, nearw, cand["quads"], cand["centroids"],
        cand["is_inner"], cand["inner_coarse"], cand["valid"],
    )
    out = fn(*args)
    _ = np.asarray(jnp.ravel(out)[:1])
    t0 = time.perf_counter()
    for _ in range(30):
        out = fn(*args)
    _ = np.asarray(jnp.ravel(out)[:1])
    print(
        f"refine only: {(time.perf_counter() - t0) / 30 * 1e3:.2f} ms"
    )


if __name__ == "__main__":
    main()
