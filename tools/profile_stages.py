#!/usr/bin/env python
"""Per-stage TPU profile of the detect+pose pipeline (config 3 shape).

Builds cumulative-prefix jitted programs (stage i = everything up to and
including stage i, reduced to one scalar so XLA cannot DCE the work) and
times each with the fetch-forced method (see PERF.md / CLAUDE.md: the
relay's block_until_ready is unreliable; fetching one element of the last
output drains the FIFO queue).  Stage cost = t[i] - t[i-1].

Usage: python tools/profile_stages.py [batch] [stages...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def build_frames(h, w, batch, dictionary):
    from aruco3_tpu.render import random_marker_scene

    rng = np.random.default_rng(0)
    frame = np.full((h, w), 255, dtype=np.uint8)
    for i in range(8):
        img, _, _ = random_marker_scene(
            dictionary,
            int(rng.integers(0, len(dictionary))),
            (480, 360),
            rng=rng,
            min_scale=0.45,
            max_scale=0.7,
            noise_sigma=0.0,
        )
        y0 = (i // 4) * 520 + 40
        x0 = (i % 4) * 470 + 10
        frame[y0 : y0 + 360, x0 : x0 + 480] = np.minimum(
            frame[y0 : y0 + 360, x0 : x0 + 480], img
        )
    frame = np.clip(
        frame.astype(np.float64) + rng.normal(0, 2.0, frame.shape), 0, 255
    ).astype(np.uint8)
    return np.broadcast_to(frame, (batch, h, w)).copy()


STAGES = [
    "frontend",
    "floods+fill1",
    "ccl1",
    "fit1",
    "inner_pass",
    "refine",
    "gates",
    "homography",
    "warp",
    "decode+match",
    "pose",
]


def make_prefix(upto, dictionary, cfg, params, min_edge, min_sep, ds, h, w):
    import math

    import jax
    import jax.numpy as jnp

    from aruco3_tpu import frontend, pose as pose_mod, rectify, segment
    from aruco3_tpu.ops.frontend_pallas import fused_threshold_open_pool

    k1 = params.max_candidates
    k2 = params.max_inner_candidates

    def fn(images):
        acc = []
        grey = frontend.rgb_to_luma_u8(images)
        black, coarse = fused_threshold_open_pool(
            grey, cfg.threshold_window, params.open_radius, ds
        )
        acc.append(jnp.sum(black.astype(jnp.int32)))
        acc.append(jnp.sum(coarse.astype(jnp.int32)))

        def tail(grey, black, coarse, upto):
            a = []

            def done():
                return sum(x.astype(jnp.float32) for x in a)

            if upto < 1:
                return jnp.float32(0)
            bg = segment.flood_from_border(coarse, params.bg_rounds)
            m1 = coarse & ~bg
            outside = segment.flood_from_border(~m1, params.fill_rounds)
            filled1 = m1 | (~m1 & ~outside)
            a.append(jnp.sum(filled1.astype(jnp.int32)))
            if upto < 2:
                return done()
            labels = segment.label_components(filled1, params.ccl_rounds)
            a.append(jnp.sum(labels))
            if upto < 3:
                return done()
            fit = segment.fit_quads(labels, ds, params, k=k1)
            a.append(jnp.sum(fit["quads"]))
            a.append(jnp.sum(fit["valid"].astype(jnp.int32)))
            if upto < 4:
                return done()
            lvl1 = segment.flood(
                m1, segment._dilate3(outside), params.fill_rounds
            )
            m2 = m1 & ~lvl1
            filled2 = segment.fill_holes(m2, params.fill_rounds)
            labels2 = segment.label_components(filled2, params.ccl_rounds)
            fit2 = segment.fit_quads(labels2, ds, params, k=k2)
            cat = lambda x, y: jnp.concatenate([x, y], axis=0)  # noqa: E731
            quads_c = cat(fit["quads"], fit2["quads"])
            valid_c = cat(fit["valid"], fit2["valid"])
            sizes_c = cat(fit["sizes"], fit2["sizes"])
            cents_c = cat(fit["centroids"], fit2["centroids"])
            p = labels.size
            prio = jnp.concatenate(
                [
                    jnp.full((k1,), p + 1, dtype=jnp.int32),
                    jnp.zeros((k2,), dtype=jnp.int32),
                ]
            )
            key = jnp.where(valid_c, sizes_c + 1 + prio, 0)
            _, sel = jax.lax.top_k(key, k1)
            quads = jnp.take(quads_c, sel, axis=0)
            valid = jnp.take(valid_c, sel, axis=0)
            sizes = jnp.take(sizes_c, sel, axis=0)
            centroids = jnp.take(cents_c, sel, axis=0)
            is_inner = sel >= k1
            inner_coarse = segment._dilate3(filled2)
            a.append(jnp.sum(quads))
            a.append(jnp.sum(valid.astype(jnp.int32)))
            if upto < 5:
                return done()
            window = params.refine_window or min(64, max(12, 2 * ds + 8))
            quads = segment.refine_corners(
                black, quads, centroids, ds, window, grey=grey,
                inner_coarse=inner_coarse, is_inner=is_inner,
            )
            a.append(jnp.sum(quads))
            if upto < 6:
                return done()
            quads = segment.enforce_clockwise(quads)
            edge_ok = segment.min_edge_gate(quads, min_edge)
            valid = valid & edge_ok
            valid = segment.discard_too_near(quads, valid, min_sep)
            a.append(jnp.sum(valid.astype(jnp.int32)))
            if upto < 7:
                return done()
            s = cfg.homography_sample_size
            H, h_valid = rectify.homography_square_to_quad(quads, s)
            a.append(jnp.sum(H))
            if upto < 8:
                return done()
            levels = max(
                1, int(math.ceil(math.log2(max(h, w) / 60.0))) + 1
            )
            pyramid = rectify.build_pyramid(grey, levels)
            patches = rectify.warp_patches_mxu(pyramid, H, quads, s)
            a.append(jnp.sum(patches))
            if upto < 9:
                return done()
            mark_size = dictionary.get_mark_size()
            bits, border_valid = rectify.decode_patches(patches, mark_size)
            ids_r, dists_r = dictionary.find_nearest_bits(bits)
            rot = jnp.argmin(dists_r, axis=-1).astype(jnp.int32)
            a.append(jnp.sum(ids_r) + jnp.sum(rot))
            a.append(jnp.sum(border_valid.astype(jnp.int32)))
            if upto < 10:
                return done()
            base = jnp.arange(4, dtype=jnp.int32)[None, :]
            perm = (base + rot[:, None]) % 4
            corners_rot = jnp.take_along_axis(
                quads, perm[..., None].astype(jnp.int32), axis=1
            )
            norm = corners_rot / jnp.array(
                [float(w), float(h)], dtype=jnp.float32
            )
            r, t, e = pose_mod.solve_normalized_batch(norm, 40.0)
            a.append(jnp.sum(r) + jnp.sum(t) + jnp.sum(e))
            return done()

        per = jax.vmap(lambda g, b, c: tail(g, b, c, upto))(
            grey, black, coarse
        )
        return sum(x.astype(jnp.float32) for x in acc) + jnp.sum(per)

    return fn


def main():
    import jax
    import jax.numpy as jnp

    from aruco3_tpu import ARDictionary, DetectorConfig, segment

    h, w = 1080, 1920
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
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
        _ = float(out)  # compile + drain
        iters = 10
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(frames)
        _ = float(out)
        dt = (time.perf_counter() - t0) / iters * 1000
        print(
            f"stage {i:2d} {STAGES[i]:>14s}: cum {dt:7.2f} ms   "
            f"delta {dt - prev:7.2f} ms",
            flush=True,
        )
        prev = dt


if __name__ == "__main__":
    main()
