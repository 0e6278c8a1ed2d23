#!/usr/bin/env python
"""Real-TPU exactness battery for the Pallas kernels.

bench.py's gate compares the full compiled pipelines on one probe frame;
this tool compiles the individual kernels across the geometries that
have historically caught Mosaic lowering bugs (column tiling, 16-word
bit planes, the warp kernel's three DMA sources) and checks each against
its XLA reference bit-for-bit (warp: to bf16 rounding).

Run after any kernel change, before trusting bench numbers:
  python tools/tpu_check.py            # full battery (~10-20 min of
                                       # remote compiles on first run)
  python tools/tpu_check.py frontend coarse   # subset
"""

import math
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from aruco3_tpu.runtime.cache import enable_compilation_cache

enable_compilation_cache()  # persist remote-compiler output across runs


def check_frontend():
    import jax
    import jax.numpy as jnp

    from aruco3_tpu import frontend, segment
    from aruco3_tpu.ops.frontend_pallas import fused_threshold_open_pool

    rng = np.random.default_rng(3)
    ok = True
    # (h, w, ds): headline geometry, odd sizes, column tiling (4K width)
    for h, w, ds in [(1080, 1920, 10), (123, 457, 5), (200, 2600, 10)]:
        g = jnp.asarray(rng.integers(0, 256, (2, h, w), dtype=np.uint8))
        out = fused_threshold_open_pool(
            g, 7, 2, ds, emit_packed=True, emit_grey_canvas=True,
            emit_level1=True,
        )
        coarse, packed = np.asarray(out[0]), np.asarray(out[1])

        def prep(x):
            white = frontend.adaptive_threshold(x, 7)
            b = segment.open_mask(~white, 2)
            return b, segment.pool_black(b, ds)

        blk, crs = jax.vmap(prep)(g)
        ic = jnp.zeros((2,) + crs.shape[1:], bool)
        pk = jax.vmap(
            lambda x, bb, cc: segment.build_packed_plane(x, bb, cc, ds)
        )(g, blk, ic)
        e1 = np.array_equal(coarse, np.asarray(crs))
        e2 = np.array_equal(
            packed[:, :h, :w] & 511, np.asarray(pk) & 511
        )
        # Canvas: image at (halo, halo_c), zero padding everywhere else
        # (the fused-canvas path writes it from the kernel).
        src, hr, hcc = np.asarray(out[3]), out[4], out[5]
        gnp = np.asarray(g)
        e3 = np.array_equal(src[:, hr : hr + h, hcc : hcc + w], gnp)
        e4 = (
            src.astype(np.int64).sum()
            == gnp.astype(np.int64).sum()
        )
        # Production variant: no canvas output (the detector's warp
        # reads level 0 from the packed plane) — the kernel body
        # differs (fuse_input without canvas_ref), so check it too.
        out2 = fused_threshold_open_pool(
            g, 7, 2, ds, emit_packed=True, emit_level1=True
        )
        e5 = np.array_equal(np.asarray(out2[0]), coarse)
        e6 = np.array_equal(np.asarray(out2[1]), packed)
        e7 = np.array_equal(np.asarray(out2[2]), np.asarray(out[2]))
        print(
            f"frontend {h}x{w} ds={ds}: coarse={e1} packed={e2} "
            f"canvas={e3 and e4} nocanvas={e5 and e6 and e7}",
            flush=True,
        )
        ok = ok and e1 and e2 and e3 and e4 and e5 and e6 and e7
    return ok


def check_coarse():
    import jax
    import jax.numpy as jnp

    from aruco3_tpu import segment
    from aruco3_tpu.ops.coarse_pallas import coarse_labels

    p = segment.QuadParams()
    rng = np.random.default_rng(11)
    cases = [
        rng.random((8, 108, 192)) < 0.3,   # full frame pack (f_pack=8)
        rng.random((4, 108, 192)) < 0.3,   # headline grid, noise
        rng.random((2, 108, 192)) < 0.65,  # dense (dark-scene-like)
        rng.random((1, 64, 300)) < 0.35,   # wide (cp > 256)
        rng.random((1, 270, 100)) < 0.35,  # tall (16-word bit planes)
    ]
    m = np.zeros((1, 108, 192), bool)      # nested ring on halo
    m[0, 20:80, 30:110] = True
    m[0, 28:72, 38:102] = False
    m[0, 36:64, 46:94] = True
    m[0, 44:56, 54:86] = False
    cases.append(m)
    ok = True
    for c in cases:
        c = jnp.asarray(c)
        got1, got2 = coarse_labels(
            c, p.bg_rounds, p.fill_rounds, p.ccl_rounds
        )
        ref1, ref2 = jax.vmap(lambda mm: segment.label_planes(mm, p))(c)
        e1 = np.array_equal(np.asarray(got1), np.asarray(ref1))
        e2 = np.array_equal(np.asarray(got2), np.asarray(ref2))
        print(f"coarse {tuple(c.shape)}: l1={e1} l2={e2}", flush=True)
        ok = ok and e1 and e2
    return ok


def check_fit():
    import jax
    import jax.numpy as jnp

    from aruco3_tpu import segment
    from aruco3_tpu.ops.fit_pallas import fit_quads_batch

    p = segment.QuadParams()
    rng = np.random.default_rng(7)
    cases = [
        (rng.random((2, 108, 192)) < 0.3, 32),   # headline grid: hc > 64
        #   exercises the windowed per-lane chain + dense fallback
        (rng.random((2, 108, 192)) < 0.65, 12),  # dense, inner-pass k
        (rng.random((1, 270, 100)) < 0.35, 32),  # tall grid
        (rng.random((1, 40, 54)) < 0.35, 32),    # hc < 64: dense-only
    ]
    from aruco3_tpu.ops.fit_pallas import fused_fit_batch

    def cmp_one(got, ref, tag, shape, k):
        e = True
        for key in ("valid", "sizes", "qualifying", "roots"):
            e = e and np.array_equal(
                np.asarray(got[key]), np.asarray(ref[key])
            )
        # Corners: equal, or an exact extreme-point tie (see
        # tests/test_pallas_kernels.py).
        used = np.asarray(got["sizes"]) > 0
        qa, qb = np.asarray(got["quads"]), np.asarray(ref["quads"])
        ca = np.asarray(got["centroids"])
        for bi, kk in zip(*np.nonzero(used)):
            if np.array_equal(qa[bi, kk], qb[bi, kk]):
                continue
            da = ((qa[bi, kk, 0] - ca[bi, kk]) ** 2).sum()
            db = ((qb[bi, kk, 0] - ca[bi, kk]) ** 2).sum()
            e = e and abs(da - db) < 1e-2
        print(f"fit[{tag}] {shape} k={k}: ok={e}", flush=True)
        return e

    ok = True
    for c, k in cases:
        c = jnp.asarray(c)
        l1, l2 = jax.vmap(lambda m: segment.label_planes(m, p))(c)
        got = fit_quads_batch(l1, 6, p, k)
        ref = jax.vmap(lambda lab: segment.fit_quads(lab, 6, p, k=k))(l1)
        ok = ok and cmp_one(got, ref, "split", tuple(c.shape), k)
        # Fused single-launch path (the detector's production route):
        # both planes, in-kernel top-k selection.
        k2 = p.max_inner_candidates
        f1, f2 = fused_fit_batch(l1, l2, 6, p, k, k2)
        ref2 = jax.vmap(
            lambda lab: segment.fit_quads(lab, 6, p, k=k2)
        )(l2)
        ok = ok and cmp_one(f1, ref, "fused1", tuple(c.shape), k)
        ok = ok and cmp_one(f2, ref2, "fused2", tuple(c.shape), k2)

    # dup_skip=True (production): MERGED candidates must match the
    # dense XLA path on everything downstream reads (dead twin lanes
    # carry zero quads by design — compare valid lanes only).
    c = jnp.asarray(rng.random((2, 108, 192)) < 0.3)
    l1, l2 = jax.vmap(lambda m: segment.label_planes(m, p))(c)
    f1, f2 = fused_fit_batch(
        l1, l2, 6, p, p.max_candidates, p.max_inner_candidates,
        dup_skip=True,
    )
    got = jax.vmap(
        lambda a, b, x, y: segment.merge_fits(a, b, x, y, p, 6)
    )(l1, l2, f1, f2)
    refm = jax.vmap(
        lambda a, b: segment.candidates_from_labels(a, b, p, 6)
    )(l1, l2)
    e = True
    for key in ("valid", "sizes", "is_inner", "overflow"):
        e = e and np.array_equal(
            np.asarray(got[key]), np.asarray(refm[key])
        )
    va = np.asarray(got["valid"])
    qa, qb = np.asarray(got["quads"]), np.asarray(refm["quads"])
    ca = np.asarray(got["centroids"])
    e = e and np.array_equal(ca[va], np.asarray(refm["centroids"])[va])
    for bi, kk in zip(*np.nonzero(va)):
        if np.array_equal(qa[bi, kk], qb[bi, kk]):
            continue
        da = ((qa[bi, kk, 0] - ca[bi, kk]) ** 2).sum()
        db = ((qb[bi, kk, 0] - ca[bi, kk]) ** 2).sum()
        e = e and abs(da - db) < 1e-2
    print(f"fit[dup_skip merged] (2, 108, 192): ok={e}", flush=True)
    ok = ok and e
    return ok


def check_refine():
    import jax
    import jax.numpy as jnp

    from aruco3_tpu import segment
    from aruco3_tpu.ops.refine_pallas import refine_corners_batch

    rng = np.random.default_rng(9)
    ok = True
    # (b, k, h, w, ds): headline-ish, odd lane count, small frame
    for b, k, h, w, ds in [(2, 44, 1080, 1920, 10), (2, 5, 160, 256, 8)]:
        wn = segment.refine_window_size(segment.QuadParams(), ds)
        grey = jnp.asarray(
            rng.integers(0, 256, (b, h, w), dtype=np.uint8)
        )
        black = jnp.asarray(rng.random((b, h, w)) < 0.3)
        hc, wc = -(-h // ds), -(-w // ds)
        inner_coarse = jnp.asarray(rng.random((b, hc, wc)) < 0.5)
        quads = jnp.asarray(
            rng.uniform(10, min(h, w) - 40, (b, k, 4, 2)).astype(
                np.float32
            )
        )
        cents = jnp.mean(quads, axis=2)
        is_inner = jnp.asarray(rng.random((b, k)) < 0.5)
        ref = jax.vmap(
            lambda bl, q, c, g, ic, ii: segment.refine_corners(
                bl, q, c, ds, wn, grey=g, inner_coarse=ic, is_inner=ii
            )
        )(black, quads, cents, grey, inner_coarse, is_inner)
        zero_ic = jnp.zeros_like(inner_coarse)
        packed = jax.vmap(
            lambda g, bl, ic: segment.build_packed_plane(g, bl, ic, ds)
        )(grey, black, zero_ic)
        got = refine_corners_batch(
            packed.astype(jnp.int16), quads, cents, is_inner, ds, wn,
            inner_coarse=inner_coarse,
        )
        e = np.array_equal(np.asarray(got), np.asarray(ref))
        print(f"refine b={b} k={k} {h}x{w} ds={ds}: ok={e}", flush=True)
        ok = ok and e
    return ok


def check_split():
    """SPLIT-plane mode (u8 grey + 32-rows-per-word near sideband):
    frontend emit_split vs the int16 packed plane, the split refine
    kernel vs the XLA refiner, and the warp's level-0 u8 source vs the
    int16 source — all bit-for-bit."""
    import jax
    import jax.numpy as jnp

    from aruco3_tpu import rectify, segment
    from aruco3_tpu.ops.frontend_pallas import (
        fused_threshold_open_pool, split_strip_rows,
    )
    from aruco3_tpu.ops.refine_pallas import refine_corners_batch

    rng = np.random.default_rng(13)
    ok = True
    for h, w, ds in [(1080, 1920, 10), (123, 457, 5), (200, 2600, 10)]:
        th = split_strip_rows(ds)
        g = jnp.asarray(rng.integers(0, 256, (2, h, w), dtype=np.uint8))
        coarse_s, greyp, nearw, l1s = fused_threshold_open_pool(
            g, 7, 2, ds, emit_packed=True, emit_level1=True,
            emit_split=True,
        )
        coarse_p, packed, l1p = fused_threshold_open_pool(
            g, 7, 2, ds, emit_packed=True, emit_level1=True
        )
        pk = np.asarray(packed)
        gp, nw = np.asarray(greyp), np.asarray(nearw)
        e1 = np.array_equal(np.asarray(coarse_s), np.asarray(coarse_p))
        e2 = np.array_equal(gp[:, :h, :w], pk[:, :h, :w] & 255)
        e2 = e2 and (gp[:, h:, :] == 0).all() and (gp[:, :, w:] == 0).all()
        # Reconstruct the near mask from the words (vectorized).
        rows = np.arange(h)
        si, t = rows // th, rows % th
        bits = (nw[:, 8 * si + t // 32, :w] >> (t % 32)[None, :, None]) & 1
        e3 = np.array_equal(bits, (pk[:, :h, :w] >> 8) & 1)
        print(
            f"split-frontend {h}x{w} ds={ds} th={th}: coarse={e1} "
            f"grey={e2} near={e3}",
            flush=True,
        )
        ok = ok and e1 and e2 and e3

    # Split refine on the headline geometry vs the XLA refiner.
    b, k, h, w, ds = 2, 44, 1080, 1920, 10
    th = split_strip_rows(ds)
    wn = segment.refine_window_size(segment.QuadParams(), ds)
    g = jnp.asarray(rng.integers(0, 256, (b, h, w), dtype=np.uint8))
    _, greyp, nearw, _ = fused_threshold_open_pool(
        g, 7, 2, ds, emit_packed=True, emit_level1=True, emit_split=True,
        min_rows=(max(h - wn, 0) // 32) * 32 + (-(-(wn + 31) // 32)) * 32,
    )
    hc, wc = -(-h // ds), -(-w // ds)
    inner_coarse = jnp.asarray(rng.random((b, hc, wc)) < 0.5)
    quads = jnp.asarray(
        rng.uniform(10, min(h, w) - 40, (b, k, 4, 2)).astype(np.float32)
    )
    cents = jnp.mean(quads, axis=2)
    is_inner = jnp.asarray(rng.random((b, k)) < 0.5)
    # XLA reference from the SAME masks the kernel consumed: undo the
    # frontend's dilation is impossible, so derive black_near from the
    # words and feed refine_corners a mask whose 2x dilation equals it.
    # Simpler: reconstruct near and compare the kernel against a
    # packed-plane refine_corners_batch run (already validated above).
    pk = jax.vmap(
        lambda gg, nn: (
            gg.astype(jnp.int32) | (nn.astype(jnp.int32) << 8)
        )
    )(
        g,
        jnp.asarray(
            (
                np.asarray(nearw)[
                    :, 8 * (np.arange(h) // th)
                    + (np.arange(h) % th) // 32, :w
                ]
                >> (np.arange(h) % 32)[None, :, None]
            )
            & 1
        ),
    )
    ref = refine_corners_batch(
        pk.astype(jnp.int16), quads, cents, is_inner, ds, wn,
        inner_coarse=inner_coarse,
    )
    got = refine_corners_batch(
        greyp, quads, cents, is_inner, ds, wn,
        inner_coarse=inner_coarse, image_hw=(h, w),
        near_words=nearw, strip_rows=th,
    )
    e4 = np.array_equal(np.asarray(got), np.asarray(ref))
    print(f"split-refine b={b} k={k} {h}x{w} ds={ds}: ok={e4}", flush=True)
    ok = ok and e4

    # Warp level-0 from the split u8 grey plane vs the int16 plane.
    b, h, w, K, S = 2, 480, 640, 6, 49
    grey = jnp.asarray(rng.integers(0, 256, (b, h, w), dtype=np.uint8))
    c = rng.uniform(130, 350, size=(b, K, 1, 2))
    half = rng.uniform(40, 110, size=(b, K, 1, 1))
    base = np.array([[-1, -1], [1, -1], [1, 1], [-1, 1]], float)
    quads = jnp.asarray((c + half * base).astype(np.float32))
    levels = max(1, int(math.ceil(math.log2(max(h, w) / 60.0))) + 1)
    H, _ = rectify.homography_square_to_quad(quads, S)
    _, greyp, _, l1 = fused_threshold_open_pool(
        grey, 7, 2, 10, emit_packed=True, emit_level1=True,
        emit_split=True,
    )
    _, packed, _ = fused_threshold_open_pool(
        grey, 7, 2, 10, emit_packed=True, emit_level1=True
    )
    c1, o1, s1 = rectify.build_packed_pyramid(
        grey, levels, skip_level0=True, level1=l1, skip_level1=True
    )
    wk = dict(l1_plane=l1, image_hw=(h, w), src_halo=(0, 0))
    a = np.asarray(
        rectify.warp_patches_dma(c1, o1, s1, H, quads, S, src=packed, **wk)
    )
    bb = np.asarray(
        rectify.warp_patches_dma(c1, o1, s1, H, quads, S, src=greyp, **wk)
    )
    e5 = np.array_equal(a, bb)
    print(f"split-warp u8-src == int16-src: {e5}", flush=True)
    return ok and e5


def check_warp():
    import jax.numpy as jnp

    from aruco3_tpu import rectify
    from aruco3_tpu.ops.frontend_pallas import fused_threshold_open_pool

    rng = np.random.default_rng(5)
    b, h, w, K, S = 2, 480, 640, 6, 49
    grey = jnp.asarray(rng.integers(0, 256, (b, h, w), dtype=np.uint8))
    c = rng.uniform(130, 350, size=(b, K, 1, 2))
    half = rng.uniform(40, 110, size=(b, K, 1, 1))
    base = np.array([[-1, -1], [1, -1], [1, 1], [-1, 1]], float)
    quads = jnp.asarray((c + half * base).astype(np.float32))
    levels = max(1, int(math.ceil(math.log2(max(h, w) / 60.0))) + 1)
    H, _ = rectify.homography_square_to_quad(quads, S)
    out = fused_threshold_open_pool(
        grey, 7, 2, 10, emit_packed=True, emit_grey_canvas=True,
        emit_level1=True,
    )
    level1, src, hr, hc_ = out[2], out[3], out[4], out[5]
    packed = out[1]
    kwargs = dict(src=src, src_halo=(hr, hc_), image_hw=(h, w))
    c0, o0, s0 = rectify.build_packed_pyramid(
        grey, levels, skip_level0=True, level1=level1
    )
    a = np.asarray(
        rectify.warp_patches_dma(c0, o0, s0, H, quads, S, **kwargs)
    )
    c1, o1, s1 = rectify.build_packed_pyramid(
        grey, levels, skip_level0=True, level1=level1, skip_level1=True
    )
    bb = np.asarray(
        rectify.warp_patches_dma(
            c1, o1, s1, H, quads, S, l1_plane=level1, **kwargs
        )
    )
    e1 = np.array_equal(a, bb)
    # Production level-0 source: the int16 packed plane (grey in bits
    # 0-7, image at (0, 0)) must reproduce the u8-canvas warp exactly.
    cc = np.asarray(
        rectify.warp_patches_dma(
            c1, o1, s1, H, quads, S, l1_plane=level1,
            src=packed, src_halo=(0, 0), image_hw=(h, w),
        )
    )
    e1 = e1 and np.array_equal(bb, cc)
    ref = np.stack(
        [
            np.asarray(
                rectify.warp_patches_mxu(
                    rectify.build_pyramid(grey[i], levels),
                    H[i], quads[i], S,
                )
            )
            for i in range(b)
        ]
    )
    e2 = bool(np.abs(bb - ref).max() < 2.5)

    # Fused in-kernel decode vs the XLA decode of the SAME kernel's
    # samples: bits and border validity must agree on real TPU (marker
    # content + noise windows; the Mosaic f32 resize matmuls and the
    # integer-exact Otsu are the risk surface here).
    from aruco3_tpu.dictionaries import ARDictionary
    from aruco3_tpu.render import render_marker

    import jax

    d = ARDictionary.new_from_named_dict("ARUCO_DEFAULT")
    m = d.get_mark_size()
    mk = np.array([[150, 120], [420, 140], [400, 390], [130, 370]], float)
    img0 = render_marker(d, 9, (w, h), mk, noise_sigma=2.0)
    grey2 = jnp.asarray(
        np.stack([np.asarray(img0), np.asarray(grey[1])])
    )
    quads2 = np.asarray(quads).copy()
    quads2[0, 0] = mk.astype(np.float32)
    quads2 = jnp.asarray(quads2)
    H2, _ = rectify.homography_square_to_quad(quads2, S)
    c2, o2, s2_ = rectify.build_packed_pyramid(grey2, levels)
    patches, grids = rectify.warp_patches_dma(
        c2, o2, s2_, H2, quads2, S, fuse_decode_mark=m
    )
    # Per-window comparison with tie-equivalent Otsu semantics: the
    # kernel emits its level in grid lane 127.  Where the kernel and
    # XLA levels agree, bits must be identical; where they differ
    # (flat noise histograms — compiler-fusion rounding flips
    # near-ties), (a) the XLA decode re-run AT the kernel's level must
    # reproduce the kernel's grid exactly (functional equivalence given
    # the level) and (b) the two levels' f64 between-class variances
    # must be tie-close (a genuinely wrong level fails loudly).
    pf = np.asarray(patches).reshape(-1, S, S)
    gg = np.asarray(grids).reshape(-1, 128)
    lev_k = gg[:, 127].astype(np.int64)
    lev_x = np.asarray(rectify.otsu_level(jnp.asarray(pf)))
    Lr = rectify._triangle_resize_matrix(S, m)
    e3 = True
    n_tie = 0
    for kk in range(pf.shape[0]):
        grid_k = gg[kk, : m * m].reshape(m, m) > 0.5
        binar = np.where(
            pf[kk] > float(lev_k[kk]), 255.0, 0.0
        ).astype(np.float32)
        red = np.asarray(
            rectify.resize_triangle(
                jnp.asarray(binar[None]), m
            )
        )[0]
        if not np.array_equal(red > 127.0, grid_k):
            print(f"fused decode: window {kk} grid != XLA@kernel-level",
                  flush=True)
            e3 = False
        if int(lev_k[kk]) != int(lev_x[kk]):
            n_tie += 1
            vals = np.clip(np.round(pf[kk]), 0, 255).astype(np.int64)
            hist = np.bincount(vals.ravel(), minlength=256).astype(
                np.float64
            )
            p_ = hist / hist.sum()
            bins = np.arange(256, dtype=np.float64)
            om = p_.cumsum()
            mu = (p_ * bins).cumsum()
            den = om * (1.0 - om)
            sig = np.where(
                den > 0, (mu[-1] * om - mu) ** 2 / np.maximum(den, 1e-300),
                -1.0,
            )
            gap = (sig.max() - sig[lev_k[kk]]) / max(sig.max(), 1e-300)
            if gap > 1e-5:
                print(
                    f"fused decode: window {kk} level {lev_k[kk]} not "
                    f"tie-close to XLA {lev_x[kk]} (rel gap {gap:.2e})",
                    flush=True,
                )
                e3 = False
    gbits, gvalid = jax.vmap(lambda g: rectify.decode_grids(g, m))(grids)
    ids_r, _ = d.find_nearest_bits(np.asarray(gbits[0, 0]))
    e3 = e3 and 9 in np.asarray(ids_r)
    print(f"fused decode: {n_tie} tie-divergent noise levels "
          f"(all tie-close)" if e3 else "", flush=True)
    print(
        f"warp l1-direct==canvas: {e1}; vs MXU oracle<2.5: {e2}; "
        f"fused decode==XLA: {e3}",
        flush=True,
    )
    return e1 and e2 and e3


def check_coarsefit():
    """Fused coarse+fit mega-kernel vs the XLA label_planes ->
    fused_fit_batch pipeline (itself fit_quads-verified), incl. merged
    candidates under the production dup_skip setting and packed frame
    widths (b=8 -> f_pack=8)."""
    import jax
    import jax.numpy as jnp

    from aruco3_tpu import segment
    from aruco3_tpu.ops.coarse_pallas import _round_up
    from aruco3_tpu.ops.fit_pallas import (
        fused_coarsefit_batch, fused_fit_batch,
    )

    p = segment.QuadParams()
    rng = np.random.default_rng(23)
    cases = [
        ((8, 108, 192), 10, 0.3),   # headline grid, full frame pack
        ((2, 108, 192), 10, 0.65),  # dense (dark-scene-like)
        ((4, 60, 80), 8, 0.35),     # small grid, f_pack=4
    ]
    ring = np.zeros((2, 108, 192), bool)
    ring[:, 20:80, 30:110] = True
    ring[:, 28:72, 38:102] = False
    ring[:, 36:64, 46:94] = True
    ring[:, 44:56, 54:86] = False
    ok = True
    k1, k2 = p.max_candidates, p.max_inner_candidates
    for spec in cases + [("ring", 10, None)]:
        if spec[0] == "ring":
            m, ds = ring, spec[1]
        else:
            shape, ds, dens = spec
            m = rng.random(shape) < dens
        c = jnp.asarray(m)
        b, hc, wc = c.shape
        rp = max(_round_up(hc, 8), 8)
        cp = max(256, _round_up(wc + 1, 128))
        pre = np.zeros((b, rp, cp), np.int32)
        pre[:, :hc, :wc] = np.asarray(m).astype(np.int32)
        fit1, fit2, ic = fused_coarsefit_batch(
            jnp.asarray(pre), p, ds, k1, k2, pre_hw=(hc, wc),
            dup_skip=True,
        )
        cand = jax.vmap(
            lambda f1, f2, icb: segment.merge_fits(
                None, None, f1, f2, p, ds, inner_coarse=icb
            )
        )(fit1, fit2, ic)
        l1, l2 = jax.vmap(lambda mm: segment.label_planes(mm, p))(c)
        rf1, rf2 = fused_fit_batch(l1, l2, ds, p, k1, k2, dup_skip=True)
        ref = jax.vmap(
            lambda la, lb, f1, f2: segment.merge_fits(
                la, lb, f1, f2, p, ds
            )
        )(l1, l2, rf1, rf2)
        es = {}
        for key in ("quads", "valid", "sizes", "centroids", "is_inner",
                    "inner_coarse", "overflow"):
            es[key] = np.array_equal(
                np.asarray(cand[key]), np.asarray(ref[key])
            )
        print(
            f"coarsefit {tuple(c.shape)} ds={ds}: "
            + " ".join(f"{k}={v}" for k, v in es.items()),
            flush=True,
        )
        ok = ok and all(es.values())

    # Grids outside the packed fit tail's bf16 exactness envelope
    # (tall portrait-1080p-shaped; wide wc > 255) must be refused by
    # the mega-kernel and handled bit-exactly by the fallback path the
    # detector routes them to (label_planes + fused_fit_batch vs the
    # fit_quads XLA oracle — exercises _rank_prep's wide hi/lo split
    # on real TPU).
    from aruco3_tpu.ops.coarse_pallas import fused_fit_exact

    for hc, wc, ds in [(192, 108, 10), (64, 300, 4)]:
        if fused_fit_exact(hc, wc):
            print(f"envelope: ({hc},{wc}) unexpectedly accepted", flush=True)
            ok = False
            continue
        m = rng.random((2, hc, wc)) < 0.3
        c = jnp.asarray(m)
        rp = max(_round_up(hc, 8), 8)
        cp = max(256, _round_up(wc + 1, 128))
        pre = np.zeros((2, rp, cp), np.int32)
        pre[:, :hc, :wc] = np.asarray(m).astype(np.int32)
        try:
            fused_coarsefit_batch(
                jnp.asarray(pre), p, ds, k1, k2, pre_hw=(hc, wc),
                dup_skip=True,
            )
            print(f"envelope: ({hc},{wc}) did not raise", flush=True)
            ok = False
        except ValueError:
            pass
        l1, l2 = jax.vmap(lambda mm: segment.label_planes(mm, p))(c)
        rf1, rf2 = fused_fit_batch(l1, l2, ds, p, k1, k2)
        es = {}
        for got, lab, k in ((rf1, l1, k1), (rf2, l2, k2)):
            ref = jax.vmap(
                lambda la: segment.fit_quads(la, ds, p, k=k)
            )(lab)
            for key in ("valid", "sizes", "qualifying", "roots"):
                e = np.array_equal(
                    np.asarray(got[key]), np.asarray(ref[key])
                )
                es[key] = es.get(key, True) and e
        print(
            f"coarsefit fallback ({hc},{wc}) ds={ds}: "
            + " ".join(f"{k}={v}" for k, v in es.items()),
            flush=True,
        )
        ok = ok and all(es.values())
    return ok


def check_raw():
    """Raw-src refine/warp (no grey plane in HBM) vs the padded-plane
    split mode, at 1080p with corners pushed to the right/bottom edges
    so the clamped DMA bases and the half-shift folding are exercised."""
    import jax
    import jax.numpy as jnp

    from aruco3_tpu import rectify, segment
    from aruco3_tpu.detector import _num_levels
    from aruco3_tpu.ops.frontend_pallas import (
        fused_threshold_open_pool, split_strip_rows,
    )
    from aruco3_tpu.ops.refine_pallas import refine_corners_batch

    rng = np.random.default_rng(31)
    h, w, b, ds = 1080, 1920, 2, 10
    th = split_strip_rows(ds)
    frames = rng.integers(0, 256, (b, h, w), dtype=np.uint8)
    # Solid rings, one near the bottom-right corner (clamp paths).
    for (y0, x0, s) in ((40, 60, 300), (700, 1500, 360), (40, 1560, 340)):
        frames[:, y0 : y0 + s, x0 : x0 + s] = 255
        frames[:, y0 + 40 : y0 + s - 40, x0 + 40 : x0 + s - 40] = 0
        frames[:, y0 + 80 : y0 + s - 80, x0 + 80 : x0 + s - 80] = 255
    grey = jnp.asarray(frames)
    p = segment.QuadParams(coarse_factor=ds)
    wn = segment.refine_window_size(p, ds)
    sh_r = -(-(wn + 31) // 32) * 32
    need_refine = (max(h - wn, 0) // 32) * 32 + sh_r
    need_warp = ((max(h, 64) - 64) // 8) * 8 + 72
    h1 = max(h // 2, 64)
    need_l1 = 2 * (((h1 - 64) // 16) * 16 + 80)
    min_rows = max(need_refine, need_warp, need_l1)
    kw = dict(
        emit_packed=True, emit_level1=True, emit_split=True,
        emit_coarse=True, min_rows=min_rows,
    )
    coarse_p, packed, nearw, level1 = fused_threshold_open_pool(
        grey, 7, p.open_radius, ds, **kw
    )
    coarse_r, near_r, level1_r = fused_threshold_open_pool(
        grey, 7, p.open_radius, ds, emit_split_grey=False, **kw
    )
    e0 = np.array_equal(np.asarray(coarse_p), np.asarray(coarse_r))
    e0 &= np.array_equal(np.asarray(nearw), np.asarray(near_r))
    e0 &= np.array_equal(np.asarray(level1), np.asarray(level1_r))

    hc, wc = -(-h // ds), -(-w // ds)
    from aruco3_tpu.ops.fit_pallas import fused_coarsefit_batch

    fit1, fit2, ic = fused_coarsefit_batch(
        coarse_p, p, ds, p.max_candidates, p.max_inner_candidates,
        pre_hw=(hc, wc), dup_skip=True,
    )
    cand = jax.vmap(
        lambda f1, f2, icb: segment.merge_fits(
            None, None, f1, f2, p, ds, inner_coarse=icb
        )
    )(fit1, fit2, ic)
    common = dict(
        ds=ds, wn=wn, inner_coarse=cand["inner_coarse"],
        image_hw=(h, w), valid=cand["valid"], strip_rows=th,
    )
    q_pl = refine_corners_batch(
        packed, cand["quads"], cand["centroids"], cand["is_inner"],
        near_words=nearw, **common,
    )
    q_raw = refine_corners_batch(
        grey, cand["quads"], cand["centroids"], cand["is_inner"],
        near_words=near_r, raw_src=True, **common,
    )
    v = np.asarray(cand["valid"])
    e1 = np.array_equal(np.asarray(q_pl)[v], np.asarray(q_raw)[v])

    s = 49
    Hm, h_valid = rectify.homography_square_to_quad(q_pl, s)
    nlv = _num_levels(h, w)
    l1_ok = rectify.l1_direct_ok(
        level1.shape[1:], rectify.pyramid_level_shapes(h, w, nlv), nlv
    )
    canvas, offsets, shapes = rectify.build_packed_pyramid(
        grey, nlv, skip_level0=True, level1=level1, skip_level1=l1_ok
    )
    wv = cand["valid"] & h_valid
    pat_pl = rectify.warp_patches_dma(
        canvas, offsets, shapes, Hm, q_pl, s, valid=wv, src=packed,
        src_halo=(0, 0), image_hw=(h, w),
        l1_plane=level1 if l1_ok else None,
    )
    pat_raw = rectify.warp_patches_dma(
        canvas, offsets, shapes, Hm, q_pl, s, valid=wv, src=grey,
        src_halo=(0, 0), image_hw=(h, w),
        l1_plane=level1 if l1_ok else None, raw_src=True,
    )
    wvn = np.asarray(wv)
    e2 = np.array_equal(np.asarray(pat_pl)[wvn], np.asarray(pat_raw)[wvn])
    nv = int(wvn.sum())
    print(
        f"raw-src 1080p: frontend={e0} refine={e1} warp={e2} "
        f"(valid={nv})",
        flush=True,
    )
    return e0 and e1 and e2 and nv >= 3 * b


def main():
    which = sys.argv[1:] or [
        "frontend", "coarse", "fit", "coarsefit", "refine", "warp",
        "split", "raw",
    ]
    checks = {
        "frontend": check_frontend,
        "coarse": check_coarse,
        "fit": check_fit,
        "coarsefit": check_coarsefit,
        "refine": check_refine,
        "warp": check_warp,
        "split": check_split,
        "raw": check_raw,
    }
    ok = True
    for name in which:
        ok = checks[name]() and ok
    print("TPU CHECK:", "ALL OK" if ok else "MISMATCH")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
