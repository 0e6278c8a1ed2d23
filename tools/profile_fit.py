#!/usr/bin/env python
"""Micro-profile of the fit+merge stage's sub-steps on the real TPU.

Feeds the REAL label planes (computed once by the coarse kernel from the
bench scene) as device-resident inputs, then times cumulative-prefix
jitted programs over the sub-steps:

  0. rank_roots_kernel on both label planes
  1. + top_k / take_along_axis lane selection (XLA glue)
  2. + fit_lanes_kernel on both planes
  3. + merge_fits

Usage: python tools/profile_fit.py [batch [height width]]
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
    from aruco3_tpu.ops.fit_pallas import fit_lanes_kernel, rank_roots_kernel
    from aruco3_tpu.ops.frontend_pallas import fused_threshold_open_pool

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    h, w = (
        (int(sys.argv[2]), int(sys.argv[3]))
        if len(sys.argv) > 3
        else (1080, 1920)
    )
    cfg = DetectorConfig()
    dictionary = ARDictionary.new_from_named_dict("ARUCO_MIP_36H12")
    ds = cfg.coarse_factor or segment.choose_coarse_factor(h, w)
    params = segment.QuadParams(
        max_candidates=cfg.max_candidates,
        coarse_factor=ds,
        ccl_rounds=cfg.ccl_rounds,
        refine=cfg.refine_corners,
    )
    frames = build_frames(h, w, batch, dictionary)

    @jax.jit
    def labels_fn(images):
        grey = frontend.rgb_to_luma_u8(images)
        coarse, *_ = fused_threshold_open_pool(
            grey, cfg.threshold_window, params.open_radius, ds,
            emit_packed=True, emit_grey_canvas=True, emit_level1=True,
        )
        return coarse_labels(
            coarse, params.bg_rounds, params.fill_rounds, params.ccl_rounds,
            inner_ccl_rounds=params.inner_ccl_rounds,
            inner_depths=params.inner_depths,
            inner_flood_rounds=params.inner_flood_rounds,
            inner_fill_rounds=params.inner_fill_rounds,
            inner=params.max_inner_candidates > 0,
        )

    labels1, labels2 = labels_fn(frames)
    labels1 = jax.device_put(np.asarray(labels1))
    labels2 = jax.device_put(np.asarray(labels2))
    b, hc, wc = labels1.shape
    p = hc * wc
    k1, k2 = params.max_candidates, params.max_inner_candidates
    kr1 = max(k1, min(p, max(4 * k1, 64, min(p // 16, 1024))))
    kr2 = max(k2, min(p, max(4 * k2, 64, min(p // 16, 1024))))
    print(f"grid {hc}x{wc} ds={ds} k1={k1} kr1={kr1} k2={k2} kr2={kr2}")

    def upto(n):
        def fn(l1, l2):
            acc = []
            r1, s1, n1 = rank_roots_kernel(
                l1, kr1, params.min_component_px
            )
            r2, s2, n2 = rank_roots_kernel(
                l2, kr2, params.min_component_px
            )
            acc += [jnp.sum(r1), jnp.sum(s1), jnp.sum(n1),
                    jnp.sum(r2), jnp.sum(s2), jnp.sum(n2)]
            if n >= 1:
                sel_out = []
                for rr, ss, nn, kr, k in (
                    (r1, s1, n1, kr1, k1),
                    (r2, s2, n2, kr2, k2),
                ):
                    used_r = (
                        jnp.arange(kr, dtype=jnp.int32)[None, :]
                        < nn[:, None]
                    )
                    sizes_m = jnp.where(used_r, ss, -1)
                    sizes, sel = jax.lax.top_k(sizes_m, k)
                    roots = jnp.take_along_axis(rr, sel, axis=1)
                    sel_out.append(
                        (roots, jnp.maximum(sizes, 0), sizes >= 0)
                    )
                    acc += [jnp.sum(roots), jnp.sum(sizes)]
            if n >= 2:
                fits = []
                for (roots, sizes, use), lab in zip(sel_out, (l1, l2)):
                    q, c, f = fit_lanes_kernel(
                        lab, roots, sizes, use, ds,
                        params.containment_slack,
                    )
                    fits.append((q, c, f, sizes, use))
                    acc += [jnp.sum(q), jnp.sum(c), jnp.sum(f)]
            if n >= 3:
                def mk(q, c, f, sizes, use):
                    return {
                        "quads": q, "centroids": c,
                        "valid": use & (sizes >= params.min_component_px)
                        & (f >= params.min_containment),
                        "sizes": sizes, "qualifying": jnp.sum(use),
                    }
                f1d = jax.vmap(mk)(*[
                    jnp.stack([x]) if False else x for x in fits[0]
                ])
                f2d = jax.vmap(mk)(*fits[1])
                cand = jax.vmap(
                    lambda la, lb, fa, fb: segment.merge_fits(
                        la, lb, fa, fb, params, ds
                    )
                )(l1, l2, f1d, f2d)
                acc += [jnp.sum(cand["quads"]),
                        jnp.sum(cand["valid"].astype(jnp.int32))]
            out = jnp.float32(0)
            for a in acc:
                out = out + a.astype(jnp.float32)
            return out
        return jax.jit(fn)

    names = ["rank_roots x2", "+ top_k/gather", "+ fit_lanes x2",
             "+ merge_fits"]
    prev = 0.0
    iters = 30
    for n, name in enumerate(names):
        fn = upto(n)
        chk = fn(labels1, labels2)
        _ = float(chk)
        t0 = time.perf_counter()
        for _ in range(iters):
            chk = fn(labels1, labels2)
        _ = float(chk)
        dt = (time.perf_counter() - t0) / iters * 1e3
        print(f"step {n} {name:>16}: cum {dt:7.2f} ms  "
              f"delta {dt - prev:7.2f} ms")
        prev = dt


if __name__ == "__main__":
    main()
