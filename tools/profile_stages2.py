#!/usr/bin/env python
"""Per-stage TPU profile of the CURRENT batched detect+pose pipeline.

Cumulative-prefix jitted programs (each reduced to one scalar so XLA
cannot DCE); stage cost = t[i] - t[i-1].  Mirrors
detector.detect_batch_arrays' Pallas-refine path exactly.

Usage: python tools/profile_stages2.py [batch] [stages...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np

from aruco3_tpu.runtime.cache import enable_compilation_cache

enable_compilation_cache()  # persist remote-compiler output across runs

from profile_stages import build_frames

STAGES = [
    "luma+frontend",  # 0
    "coarsefit_kernel",  # 1
    "merge",          # 2
    "bit9",           # 3
    "refine",         # 4
    "finalize",       # 5
    "homography",     # 6
    "canvas",         # 7
    "warp",           # 8
    "decode+match",   # 9
    "pose",           # 10
]


def make_prefix(upto, dictionary, cfg, params, min_edge, min_sep, ds, h, w):
    import jax
    import jax.numpy as jnp

    from aruco3_tpu import frontend, pose as pose_mod, rectify, segment
    from aruco3_tpu.detector import _num_levels
    from aruco3_tpu.ops.frontend_pallas import fused_threshold_open_pool
    from aruco3_tpu.ops.refine_pallas import refine_corners_batch

    from aruco3_tpu.ops.frontend_pallas import split_strip_rows

    th_split = split_strip_rows(ds)

    def fn(images):
        acc = []
        grey = frontend.rgb_to_luma_u8(images)
        wn = segment.refine_window_size(params, ds)
        al_r = 32 if th_split else 16
        al_w = 8 if th_split else 16
        sh_r = -(-(wn + al_r - 1) // al_r) * al_r
        need_refine = (max(h - wn, 0) // al_r) * al_r + sh_r
        need_warp = ((max(h, 64) - 64) // al_w) * al_w + (
            72 if th_split else 80
        )
        ph0 = max(h + (h % 2), 64)
        h1 = max(ph0 // 2, 64)
        need_l1 = 2 * (((h1 - 64) // 16) * 16 + 80)
        hc, wc = -(-h // ds), -(-w // ds)
        raw_src = (
            th_split is not None
            and h % 8 == 0
            and w % 128 == 0
            and h >= 72
            and w >= 256
        )
        outs = fused_threshold_open_pool(
            grey, cfg.threshold_window, params.open_radius, ds,
            emit_packed=True, emit_level1=True,
            emit_split=th_split is not None,
            emit_split_grey=not raw_src,
            emit_coarse=True,
            min_rows=max(need_refine, need_warp, need_l1),
        )
        if raw_src:
            coarse, near_words, level1 = outs
            packed = grey
        elif th_split is not None:
            coarse, packed, near_words, level1 = outs
        else:
            coarse, packed, level1 = outs
            near_words = None
        acc.append(jnp.sum(coarse[:, :hc, :wc].astype(jnp.int32)))
        acc.append(jnp.sum(level1[:, 64:96, :256].astype(jnp.float32)))
        if near_words is not None:
            acc.append(jnp.sum(near_words[:, :8, :256]))
        if upto >= 1:
            from aruco3_tpu.ops.fit_pallas import fused_coarsefit_batch

            fit1, fit2, ic = fused_coarsefit_batch(
                coarse, params, ds,
                params.max_candidates, params.max_inner_candidates,
                pre_hw=(hc, wc), dup_skip=True,
            )
            acc.append(jnp.sum(fit1["quads"]))
            acc.append(jnp.sum(fit2["quads"]))
            acc.append(jnp.sum(ic.astype(jnp.int32)))
        if upto >= 2:
            cand = jax.vmap(
                lambda f1, f2, icb: segment.merge_fits(
                    None, None, f1, f2, params, ds, inner_coarse=icb
                )
            )(fit1, fit2, ic)
            acc.append(jnp.sum(cand["quads"]))
            acc.append(jnp.sum(cand["valid"].astype(jnp.int32)))
        if upto >= 4:
            quads = refine_corners_batch(
                packed, cand["quads"], cand["centroids"], cand["is_inner"],
                ds, wn, inner_coarse=cand["inner_coarse"], image_hw=(h, w),
                valid=cand["valid"], near_words=near_words,
                strip_rows=th_split or 0, raw_src=raw_src,
            )
            acc.append(jnp.sum(quads))
        if upto >= 5:
            def gate(q, v, sz, ov):
                return segment.finalize_quads(
                    q, v, sz, ov, params, min_edge, min_sep
                )

            quads, valid, stats = jax.vmap(gate)(
                quads, cand["valid"], cand["sizes"], cand["overflow"]
            )
            acc.append(jnp.sum(valid.astype(jnp.int32)))
        if upto >= 6:
            s = cfg.homography_sample_size
            H, h_valid = rectify.homography_square_to_quad(quads, s)
            acc.append(jnp.sum(H))
        if upto >= 7:
            nlv = _num_levels(h, w)
            l1_ok = rectify.l1_direct_ok(
                level1.shape[1:],
                rectify.pyramid_level_shapes(h, w, nlv), nlv,
            )
            canvas, offsets, shapes = rectify.build_packed_pyramid(
                grey, nlv, skip_level0=True, level1=level1,
                skip_level1=l1_ok,
            )
            acc.append(jnp.sum(canvas[:, 128:160, :256].astype(jnp.float32)))
        if upto >= 8:
            # Production configuration: decode FUSED into the warp
            # kernel epilogue (stage 9 then runs only the rotation/
            # border/codebook tail on the emitted cell grids).
            mark_size = dictionary.get_mark_size()
            fuse_mark = (
                mark_size if mark_size * mark_size <= 128 else 0
            )
            warped = rectify.warp_patches_dma(
                canvas, offsets, shapes, H, quads, s, valid=valid & h_valid,
                src=packed, src_halo=(0, 0), image_hw=(h, w),
                l1_plane=level1 if l1_ok else None, raw_src=raw_src,
                fuse_decode_mark=fuse_mark,
            )
            patches, grids = warped if fuse_mark else (warped, None)
            acc.append(jnp.sum(patches))
        if upto >= 9:
            def match(p, g):
                mark_size = dictionary.get_mark_size()
                if g is not None:
                    bits, border_valid = rectify.decode_grids(
                        g, mark_size
                    )
                else:
                    bits, border_valid = rectify.decode_patches(
                        p, mark_size
                    )
                ids_r, dists_r = dictionary.find_nearest_bits(bits)
                rot = jnp.argmin(dists_r, axis=-1).astype(jnp.int32)
                return jnp.sum(ids_r) + jnp.sum(rot), rot

            if grids is not None:
                r = jax.vmap(lambda p, g: match(p, g))(patches, grids)
            else:
                r = jax.vmap(lambda p: match(p, None))(patches)
            acc.append(jnp.sum(r[0]))
            rot = r[1]
        if upto >= 10:
            # Gather-free rotation select (matches detector._match_tail).
            corners_rot = sum(
                jnp.where(
                    (rot == r)[:, :, None, None],
                    jnp.roll(quads, -r, axis=2),
                    0.0,
                )
                for r in range(4)
            )
            norm = corners_rot / jnp.array(
                [float(w), float(h)], dtype=jnp.float32
            )
            rr, t, e = jax.vmap(
                lambda nn: pose_mod.solve_normalized_batch(nn, 40.0)
            )(norm)
            acc.append(jnp.sum(rr) + jnp.sum(t) + jnp.sum(e))
        return sum(x.astype(jnp.float32) for x in acc)

    return fn


def main():
    import jax
    import jax.numpy as jnp

    from aruco3_tpu import ARDictionary, DetectorConfig, segment

    h, w = 1080, 1920
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    which = [int(x) for x in sys.argv[2:]] or list(range(len(STAGES)))
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
    min_edge = min(w, h) * cfg.min_side_length_factor
    min_sep = min(w, h) * cfg.min_corner_separation_factor
    frames = jnp.asarray(build_frames(h, w, batch, dictionary))
    prev = 0.0
    for i in which:
        fn = jax.jit(
            make_prefix(
                i, dictionary, cfg, params, min_edge, min_sep, ds, h, w
            )
        )
        out = fn(frames)
        _ = float(out)
        t0 = time.perf_counter()
        for _ in range(10):
            out = fn(frames)
        _ = float(out)
        dt = (time.perf_counter() - t0) / 10 * 1000
        print(
            f"stage {i:2d} {STAGES[i]:>14s}: cum {dt:7.2f} ms  "
            f"delta {dt - prev:7.2f} ms",
            flush=True,
        )
        prev = dt


if __name__ == "__main__":
    main()
