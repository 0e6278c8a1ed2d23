"""Pallas kernels vs their XLA oracles (interpret mode on CPU)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aruco3_tpu import frontend, rectify, segment
from aruco3_tpu.dictionaries import ARDictionary
from aruco3_tpu.ops.frontend_pallas import fused_threshold_open_pool
from aruco3_tpu.ops.warp_pallas import warp_eval
from aruco3_tpu.render import render_marker


@pytest.fixture(autouse=True)
def _clear_jax_caches_per_test():
    """This module compiles the package's biggest interpret-mode
    programs (the fused coarse+fit mega-kernel); the XLA CPU compiler
    segfaults once enough of them accumulate IN-PROCESS (see
    conftest's module-scoped clear and _pytest_stackfix — the round-4
    kernels outgrew both).  Tests here share almost no programs, so a
    per-test clear costs little."""
    yield
    jax.clear_caches()


@pytest.mark.parametrize(
    "shape,ds", [((2, 123, 217), 3), ((1, 480, 640), 4), ((2, 96, 128), 2)]
)
def test_fused_frontend_matches_xla(shape, ds, rng):
    g = rng.integers(0, 256, size=shape, dtype=np.uint8)
    bref = jax.vmap(
        lambda x: segment.open_mask(~frontend.adaptive_threshold(x, 7), 2)
    )(jnp.asarray(g))
    cref = jax.vmap(lambda x: segment.pool_black(x, ds))(bref)
    black, coarse = fused_threshold_open_pool(
        jnp.asarray(g), 7, 2, ds, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(black), np.asarray(bref))
    np.testing.assert_array_equal(np.asarray(coarse), np.asarray(cref))


@pytest.mark.parametrize(
    "shape,ds",
    [((1, 123, 217), 3), ((1, 240, 320), 4), ((1, 270, 2400), 10)],
)
def test_fused_frontend_packed_plane(shape, ds, rng):
    """emit_packed bits 0-8 must equal the XLA packed plane; the padding
    (which the refinement kernel DMAs into) must be written zeros.
    The wide case exercises the column-tiled (4K-class) path."""
    g = rng.integers(0, 256, size=shape, dtype=np.uint8)
    h, w = shape[1], shape[2]
    coarse, packed = fused_threshold_open_pool(
        jnp.asarray(g), 7, 2, ds, interpret=True, emit_packed=True
    )
    bref = jax.vmap(
        lambda x: segment.open_mask(~frontend.adaptive_threshold(x, 7), 2)
    )(jnp.asarray(g))
    cref = jax.vmap(lambda x: segment.pool_black(x, ds))(bref)
    zero_inner = jnp.zeros(
        (shape[0], -(-h // ds), -(-w // ds)), dtype=bool
    )
    pref = jax.vmap(
        lambda gg, bb, ii: segment.build_packed_plane(gg, bb, ii, ds)
    )(jnp.asarray(g), bref, zero_inner)
    got = np.asarray(packed)
    np.testing.assert_array_equal(got[:, :h, :w], np.asarray(pref))
    np.testing.assert_array_equal(np.asarray(coarse), np.asarray(cref))
    assert (got[:, h:, :] == 0).all()
    assert (got[:, :, w:] == 0).all()


@pytest.mark.parametrize(
    "shape,ds",
    [((1, 123, 217), 3), ((2, 200, 330), 10), ((1, 270, 2400), 10)],
)
def test_fused_frontend_split_plane(shape, ds, rng):
    """emit_split must carry the same information as the int16 packed
    plane: a u8 image-masked grey plane (zero padding) and the near
    mask bit-packed 32 rows per int32 word in the per-strip layout."""
    from aruco3_tpu.ops.frontend_pallas import split_strip_rows

    g = rng.integers(0, 256, size=shape, dtype=np.uint8)
    h, w = shape[1], shape[2]
    th = split_strip_rows(ds)
    coarse, greyp, nearw, _l1 = fused_threshold_open_pool(
        jnp.asarray(g), 7, 2, ds, interpret=True, emit_packed=True,
        emit_level1=True, emit_split=True,
    )
    bref = jax.vmap(
        lambda x: segment.open_mask(~frontend.adaptive_threshold(x, 7), 2)
    )(jnp.asarray(g))
    cref = jax.vmap(lambda x: segment.pool_black(x, ds))(bref)
    zero_inner = jnp.zeros(
        (shape[0], -(-h // ds), -(-w // ds)), dtype=bool
    )
    pref = np.asarray(
        jax.vmap(
            lambda gg, bb, ii: segment.build_packed_plane(gg, bb, ii, ds)
        )(jnp.asarray(g), bref, zero_inner)
    )
    gp, nw = np.asarray(greyp), np.asarray(nearw)
    np.testing.assert_array_equal(gp[:, :h, :w], pref & 255)
    assert (gp[:, h:, :] == 0).all() and (gp[:, :, w:] == 0).all()
    rows = np.arange(h)
    si, t = rows // th, rows % th
    bits = (nw[:, 8 * si + t // 32, :w] >> (t % 32)[None, :, None]) & 1
    np.testing.assert_array_equal(bits, (pref >> 8) & 1)
    # Padding rows carry zero near bits (refine windows read into them).
    hp = gp.shape[1]
    rows = np.arange(h, hp)
    si, t = rows // th, rows % th
    bits = (nw[:, 8 * si + t // 32, :] >> (t % 32)[None, :, None]) & 1
    assert (bits == 0).all()
    np.testing.assert_array_equal(np.asarray(coarse), np.asarray(cref))


def test_refine_pallas_split_matches_xla(rng):
    """The split-mode refine kernel (u8 grey plane + near words) must
    reproduce segment.refine_corners exactly, inner lanes included."""
    from aruco3_tpu.ops.refine_pallas import refine_corners_batch

    b, k, h, w, ds, th = 2, 6, 240, 320, 8, 128
    wn = segment.refine_window_size(segment.QuadParams(), ds)
    grey = rng.integers(0, 256, size=(b, h, w), dtype=np.uint8)
    black = rng.random((b, h, w)) < 0.3
    inner_coarse = jnp.asarray(
        rng.random((b, -(-h // ds), -(-w // ds))) < 0.5
    )
    quads = jnp.asarray(
        rng.uniform(10, 200, size=(b, k, 4, 2)).astype(np.float32)
    )
    cents = jnp.mean(quads, axis=2)
    is_inner = jnp.asarray(rng.random((b, k)) < 0.5)
    ref = jax.vmap(
        lambda bl, q, c, g, ic, ii: segment.refine_corners(
            bl, q, c, ds, wn, grey=g, inner_coarse=ic, is_inner=ii
        )
    )(jnp.asarray(black), quads, cents, jnp.asarray(grey), inner_coarse,
      is_inner)

    near = np.asarray(
        jax.vmap(lambda m: segment._dilate3(segment._dilate3(m)))(
            jnp.asarray(black)
        )
    )
    sh = -(-(wn + 31) // 32) * 32
    need_h = (max(h - wn, 0) // 32) * 32 + sh
    hp = -(-max(-(-h // th) * th, need_h) // th) * th
    wp = (max(w - wn, 0) // 128) * 128 + 384  # cover the 256-lane reads
    wp = -(-wp // 128) * 128
    gp = np.zeros((b, hp, wp), np.uint8)
    gp[:, :h, :w] = grey
    nw = np.zeros((b, 8 * (hp // th), wp), np.int32)
    for R in range(h):
        si, t = divmod(R, th)
        nw[:, 8 * si + t // 32, :w] |= near[:, R, :].astype(np.int32) << (
            t % 32
        )
    got = refine_corners_batch(
        jnp.asarray(gp), quads, cents, is_inner, ds, wn,
        inner_coarse=inner_coarse, image_hw=(h, w),
        near_words=jnp.asarray(nw), strip_rows=th, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.parametrize("shape", [(2, 240, 320), (1, 720, 1280)])
def test_fused_frontend_level1(shape, rng):
    """emit_level1 must reproduce build_packed_pyramid's level 1 (same
    bf16 cast chain) so that a canvas built from it is bit-identical to
    one built from the frame.  720p exercises odd level sizes down the
    chain."""
    from aruco3_tpu.detector import _num_levels

    g = jnp.asarray(
        rng.integers(0, 256, size=shape, dtype=np.uint8)
    )
    h, w = shape[1], shape[2]
    out = fused_threshold_open_pool(
        g, 7, 2, 10, interpret=True, emit_packed=True,
        emit_grey_canvas=True, emit_level1=True,
    )
    l1 = out[2]
    levels = _num_levels(h, w)
    c_ref, o_ref, s_ref = rectify.build_packed_pyramid(
        g, levels, skip_level0=True
    )
    c_new, o_new, s_new = rectify.build_packed_pyramid(
        g, levels, skip_level0=True, level1=l1
    )
    assert o_ref == o_new and s_ref == s_new
    np.testing.assert_array_equal(np.asarray(c_ref), np.asarray(c_new))


@pytest.mark.parametrize(
    "shape,ds",
    [
        # 8-aligned H / 128-aligned W single-column: the KERNEL-EMITTED
        # canvas path (fuse_canvas); includes a height not divisible by
        # the strip height so edge strips exercise the clipped DMAs +
        # stale-row zeroing.
        ((2, 720, 1280), 10),
        ((1, 488, 640), 6),
        # Unaligned geometry: host-built canvas fallback.
        ((1, 241, 330), 5),
    ],
)
def test_fused_frontend_grey_canvas(shape, ds, rng):
    """emit_grey_canvas must return the image at (halo, halo_c) with
    zeros EVERYWHERE else (the warp kernel's level-0 window DMAs read
    up to halo+8 rows / 192 lanes past the image and rely on the zero
    slack), on both the kernel-emitted and host-built canvas paths."""
    g = rng.integers(0, 256, size=shape, dtype=np.uint8)
    h, w = shape[1], shape[2]
    out = fused_threshold_open_pool(
        jnp.asarray(g), 7, 2, ds, interpret=True, emit_packed=True,
        emit_grey_canvas=True, emit_level1=True,
    )
    src, halo, halo_c = np.asarray(out[3]), out[4], out[5]
    np.testing.assert_array_equal(
        src[:, halo : halo + h, halo_c : halo_c + w], g
    )
    # Zeros everywhere else: total mass equals the image's.
    assert src.astype(np.int64).sum() == g.astype(np.int64).sum()
    # Enough zero slack below the image for the deepest level-0 window.
    assert src.shape[1] >= h + halo + 8
    assert src.shape[2] >= halo_c + w + 192
    # The canvas-free production variant (fuse_input without canvas_ref)
    # must produce identical coarse/packed/level-1 outputs.
    out2 = fused_threshold_open_pool(
        jnp.asarray(g), 7, 2, ds, interpret=True, emit_packed=True,
        emit_level1=True,
    )
    for a, bb in zip(out2[:3], out[:3]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(bb))


def test_fused_frontend_marker_image(rng):
    d = ARDictionary.new_from_named_dict("ARUCO_DEFAULT")
    corners = np.array([[60, 50], [260, 60], [250, 250], [55, 240]], float)
    img = render_marker(d, 7, (320, 300), corners, noise_sigma=2.0)
    bref = segment.open_mask(
        ~frontend.adaptive_threshold(jnp.asarray(img), 7), 2
    )
    cref = segment.pool_black(bref, 4)
    black, coarse = fused_threshold_open_pool(
        jnp.asarray(img), 7, 2, 4, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(black), np.asarray(bref))
    np.testing.assert_array_equal(np.asarray(coarse), np.asarray(cref))


def test_coarse_labels_matches_xla(rng):
    """The fused coarse kernel must reproduce the XLA flood/fill/CCL label
    planes bit-exactly (outer and inner pass)."""
    import jax.numpy as jnp

    from aruco3_tpu.ops.coarse_pallas import coarse_labels

    p = segment.QuadParams()

    def xla_labels(c):
        return segment.label_planes(c, p)

    cases = []
    # Random blobs (open-ish fields), two grid shapes.
    for shape, density in [((108, 192), 0.3), ((60, 120), 0.5)]:
        cases.append(rng.random((2,) + shape) < density)
    # A marker-on-dark-background style scene: ring inside a halo.
    m = np.zeros((1, 108, 192), bool)
    m[0, 20:80, 30:110] = True   # halo block
    m[0, 28:72, 38:102] = False  # quiet zone
    m[0, 36:64, 46:94] = True    # marker ring
    m[0, 44:56, 54:86] = False   # interior
    cases.append(m)
    # Border-connected closed band enclosing a component: pass 1 merges
    # them (root on the band), so depth 0's pass-1 label reuse must
    # defer the enclosed component to the next peel depth — the rescue
    # gate in both implementations.
    m = np.zeros((1, 108, 192), bool)
    m[0, 20, 30:110] = True
    m[0, 80, 30:110] = True
    m[0, 20:81, 30] = True
    m[0, 20:81, 109] = True
    m[0, 0:20, 60] = True        # strut to the border
    m[0, 40:60, 55:80] = True    # enclosed block
    m[0, 46:54, 61:74] = False   # with a hole (ring-like)
    cases.append(m)

    for c in cases:
        c = jnp.asarray(c)
        ref1, ref2 = jax.vmap(xla_labels)(c)
        got1, got2 = coarse_labels(
            c, p.bg_rounds, p.fill_rounds, p.ccl_rounds, interpret=True
        )
        np.testing.assert_array_equal(np.asarray(got1), np.asarray(ref1))
        np.testing.assert_array_equal(np.asarray(got2), np.asarray(ref2))


def test_coarse_labels_wide_grid(rng):
    """Coarse grids wider than 256 lanes (4K-class frames at small coarse
    factors) must run in the kernel when they fit VMEM, matching the XLA
    label planes; far larger grids report not-fitting so the detector can
    fall back."""
    from aruco3_tpu.ops.coarse_pallas import coarse_fits_vmem, coarse_labels

    p = segment.QuadParams()
    assert coarse_fits_vmem(270, 480)  # 1080p at coarse_factor=4
    assert not coarse_fits_vmem(2160, 3840)  # absurd: factor 1 at 4K

    for shape in [(64, 300), (270, 100)]:  # wide (cp>256) and tall (16
        # packed words in the bit-flood planes)
        c = jnp.asarray(rng.random((1,) + shape) < 0.35)
        ref1, ref2 = jax.vmap(lambda m: segment.label_planes(m, p))(c)
        got1, got2 = coarse_labels(
            c, p.bg_rounds, p.fill_rounds, p.ccl_rounds, interpret=True
        )
        np.testing.assert_array_equal(np.asarray(got1), np.asarray(ref1))
        np.testing.assert_array_equal(np.asarray(got2), np.asarray(ref2))


@pytest.mark.parametrize(
    "shape,ds",
    [((2, 200, 330), 10), ((1, 123, 217), 3), ((1, 270, 2400), 10)],
)
def test_fused_frontend_emit_coarse(shape, ds, rng):
    """emit_coarse must return the coarse-label kernel's PRE-PADDED plane
    ((B, >=hc rows, cp) int32 0/1: cells at [:hc, :wc], zeros elsewhere)
    on both the in-kernel geometry (single column tile) and the
    column-tiled 4K-class XLA fallback (the 2400-wide case)."""
    from aruco3_tpu.ops.frontend_pallas import coarse_pad_shape

    g = rng.integers(0, 256, size=shape, dtype=np.uint8)
    h, w = shape[1], shape[2]
    hc, wc = -(-h // ds), -(-w // ds)
    _rp, cp = coarse_pad_shape(hc, wc)
    plane, _packed = fused_threshold_open_pool(
        jnp.asarray(g), 7, 2, ds, interpret=True, emit_packed=True,
        emit_coarse=True,
    )
    bref = jax.vmap(
        lambda x: segment.open_mask(~frontend.adaptive_threshold(x, 7), 2)
    )(jnp.asarray(g))
    cref = np.asarray(jax.vmap(lambda x: segment.pool_black(x, ds))(bref))
    got = np.asarray(plane)
    assert got.dtype == np.int32 and got.shape[2] == cp
    assert got.shape[1] >= hc
    np.testing.assert_array_equal(got[:, :hc, :wc] != 0, cref)
    assert (got[:, :, wc:] == 0).all()
    assert (got[:, hc:, :] == 0).all()
    assert ((got == 0) | (got == 1)).all()


def test_coarse_labels_pre_hw(rng):
    """coarse_labels(pre_hw=...) on the frontend's emit_coarse plane must
    match the bool-mask entry point bit-exactly (this is the detector's
    fused frontend->coarse handoff)."""
    from aruco3_tpu.ops.coarse_pallas import coarse_labels

    p = segment.QuadParams()
    ds, h, w = 10, 200, 330
    g = rng.integers(0, 256, size=(2, h, w), dtype=np.uint8)
    hc, wc = -(-h // ds), -(-w // ds)
    plane, _packed = fused_threshold_open_pool(
        jnp.asarray(g), 7, 2, ds, interpret=True, emit_packed=True,
        emit_coarse=True,
    )
    cmask = plane[:, :hc, :wc] != 0
    ref1, ref2 = coarse_labels(
        cmask, p.bg_rounds, p.fill_rounds, p.ccl_rounds, interpret=True
    )
    got1, got2 = coarse_labels(
        plane, p.bg_rounds, p.fill_rounds, p.ccl_rounds,
        pre_hw=(hc, wc), interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(got1), np.asarray(ref1))
    np.testing.assert_array_equal(np.asarray(got2), np.asarray(ref2))


def test_fit_pallas_matches_fit_quads(rng):
    """The lane-skipping fit kernels must reproduce segment.fit_quads on
    every downstream-consumed field.  Corners may differ ONLY on exact
    extreme-point ties (two cells equidistant from the centroid /
    anchor), where XLA fusion rounding legitimately picks either; the
    check verifies any differing corner is such a tie."""
    from aruco3_tpu.ops.fit_pallas import fit_quads_batch

    p = segment.QuadParams()
    for shape, density, k in [
        ((40, 54), 0.35, 32),   # sparse
        ((40, 54), 0.6, 32),    # dense: few merged components
        ((30, 40), 0.3, 12),    # inner-pass config
        ((60, 80), 0.45, 96),   # 4K config: KR > 128
        # hc > 64: exercises the 64-row windowed per-lane chain —
        # sparse has window-sized components, dense has percolated
        # components taller than the window (dense fallback).
        ((80, 54), 0.35, 32),
        ((80, 54), 0.6, 32),
    ]:
        c = jnp.asarray(rng.random((3,) + shape) < density)
        l1, _ = jax.vmap(lambda m: segment.label_planes(m, p))(c)
        ref = jax.vmap(lambda lab: segment.fit_quads(lab, 6, p, k=k))(l1)
        got = fit_quads_batch(l1, 6, p, k, interpret=True)
        for key in ("valid", "sizes", "qualifying", "roots"):
            np.testing.assert_array_equal(
                np.asarray(got[key]), np.asarray(ref[key]), err_msg=key
            )
        used = np.asarray(got["sizes"]) > 0
        qa, qb = np.asarray(got["quads"]), np.asarray(ref["quads"])
        ca = np.asarray(got["centroids"])
        for bi in range(qa.shape[0]):
            for kk in range(k):
                if not used[bi, kk]:
                    continue
                if np.array_equal(qa[bi, kk], qb[bi, kk]):
                    continue
                # Differing corners must be distance ties (same d2 from
                # the shared centroid for corner A; remaining corners
                # derive from the flipped anchor, so just check A).
                da = ((qa[bi, kk, 0] - ca[bi, kk]) ** 2).sum()
                db = ((qb[bi, kk, 0] - ca[bi, kk]) ** 2).sum()
                assert abs(da - db) < 1e-2, (bi, kk, qa[bi, kk], qb[bi, kk])


def test_fused_fit_matches_fit_quads(rng):
    """The single-launch fused fit (rank + top-k select + fit for both
    label planes in one kernel) must reproduce segment.fit_quads on
    each plane exactly like the split kernels do — including the
    in-kernel top-k selection's stable descending order with
    lower-index tie-breaks."""
    from aruco3_tpu.ops.fit_pallas import fused_fit_batch

    p = segment.QuadParams()
    for shape, density, k1, k2 in [
        ((40, 54), 0.35, 32, 12),
        ((40, 54), 0.6, 32, 12),   # dense: many equal-size components
        ((30, 40), 0.3, 12, 8),
        ((80, 54), 0.45, 32, 0),   # single-pass variant (k2 == 0)
        ((40, 300), 0.35, 16, 8),  # wide: row totals can exceed 256
                                   # (exercises _rank_prep's hi/lo split)
    ]:
        c = jnp.asarray(rng.random((3,) + shape) < density)
        l1, l2 = jax.vmap(lambda m: segment.label_planes(m, p))(c)
        got1, got2 = fused_fit_batch(
            l1, l2 if k2 else None, 6, p, k1, k2, interpret=True
        )
        checks = [(got1, l1, k1)] + ([(got2, l2, k2)] if k2 else [])
        assert (got2 is None) == (k2 == 0)
        for got, lab, k in checks:
            ref = jax.vmap(
                lambda la: segment.fit_quads(la, 6, p, k=k)
            )(lab)
            for key in ("valid", "sizes", "qualifying", "roots"):
                np.testing.assert_array_equal(
                    np.asarray(got[key]), np.asarray(ref[key]),
                    err_msg=key,
                )
            used = np.asarray(got["sizes"]) > 0
            qa = np.asarray(got["quads"])
            qb = np.asarray(ref["quads"])
            ca = np.asarray(got["centroids"])
            for bi in range(qa.shape[0]):
                for kk in range(k):
                    if not used[bi, kk]:
                        continue
                    if np.array_equal(qa[bi, kk], qb[bi, kk]):
                        continue
                    da = ((qa[bi, kk, 0] - ca[bi, kk]) ** 2).sum()
                    db = ((qb[bi, kk, 0] - ca[bi, kk]) ** 2).sum()
                    assert abs(da - db) < 1e-2, (
                        bi, kk, qa[bi, kk], qb[bi, kk],
                    )


def test_fused_fit_dup_skip_matches_merged_candidates(rng):
    """With dup_skip=True (the detector's production setting) the fused
    kernel skips inner lanes whose (root, size) match a valid outer
    lane; merge_fits' exact-twin rule kills those lanes in both paths,
    so the MERGED candidate dicts must agree on everything downstream
    reads: valid, sizes, is_inner, overflow, and quads/centroids on
    valid lanes (dead lanes carry zero quads on the kernel path by
    design)."""
    from aruco3_tpu.ops.fit_pallas import fused_fit_batch

    p = segment.QuadParams()
    for shape, density in [((40, 54), 0.35), ((40, 54), 0.6)]:
        c = jnp.asarray(rng.random((3,) + shape) < density)
        l1, l2 = jax.vmap(lambda m: segment.label_planes(m, p))(c)
        f1, f2 = fused_fit_batch(
            l1, l2, 6, p, p.max_candidates, p.max_inner_candidates,
            dup_skip=True, interpret=True,
        )
        got = jax.vmap(
            lambda a, b, x, y: segment.merge_fits(a, b, x, y, p, 6)
        )(l1, l2, f1, f2)
        ref = jax.vmap(
            lambda a, b: segment.candidates_from_labels(a, b, p, 6)
        )(l1, l2)
        for key in ("valid", "sizes", "is_inner", "overflow"):
            np.testing.assert_array_equal(
                np.asarray(got[key]), np.asarray(ref[key]), err_msg=key
            )
        va = np.asarray(got["valid"])
        qa = np.asarray(got["quads"])
        qb = np.asarray(ref["quads"])
        ca = np.asarray(got["centroids"])
        cb = np.asarray(ref["centroids"])
        np.testing.assert_array_equal(ca[va], cb[va])
        for bi, kk in zip(*np.nonzero(va)):
            if np.array_equal(qa[bi, kk], qb[bi, kk]):
                continue
            da = ((qa[bi, kk, 0] - ca[bi, kk]) ** 2).sum()
            db = ((qb[bi, kk, 0] - ca[bi, kk]) ** 2).sum()
            assert abs(da - db) < 1e-2, (bi, kk, qa[bi, kk], qb[bi, kk])


def test_fused_coarsefit_matches_pipeline(rng):
    """The coarse+fit mega-kernel (labels never leave VMEM; fit runs in
    the kernel's packed padded space) must bit-match the label_planes ->
    fused_fit_batch -> merge_fits pipeline on everything downstream
    reads, including the dilated inner footprint it emits in-kernel."""
    from aruco3_tpu.ops.coarse_pallas import _round_up
    from aruco3_tpu.ops.fit_pallas import (
        fused_coarsefit_batch, fused_fit_batch,
    )

    p = segment.QuadParams()
    k1, k2, ds = p.max_candidates, p.max_inner_candidates, 8
    ring = np.zeros((1, 60, 80), bool)
    ring[0, 10:50, 10:70] = True
    ring[0, 16:44, 16:64] = False
    ring[0, 22:38, 22:58] = True
    for m in (rng.random((2, 40, 54)) < 0.35, ring):
        c = jnp.asarray(m)
        b, hc, wc = c.shape
        rp = max(_round_up(hc, 8), 8)
        cp = max(256, _round_up(wc + 1, 128))
        pre = np.zeros((b, rp, cp), np.int32)
        pre[:, :hc, :wc] = np.asarray(m).astype(np.int32)
        fit1, fit2, ic = fused_coarsefit_batch(
            jnp.asarray(pre), p, ds, k1, k2, pre_hw=(hc, wc),
            dup_skip=True, interpret=True,
        )
        got = jax.vmap(
            lambda f1, f2, icb: segment.merge_fits(
                None, None, f1, f2, p, ds, inner_coarse=icb
            )
        )(fit1, fit2, ic)
        l1, l2 = jax.vmap(lambda mm: segment.label_planes(mm, p))(c)
        rf1, rf2 = fused_fit_batch(
            l1, l2, ds, p, k1, k2, dup_skip=True, interpret=True
        )
        ref = jax.vmap(
            lambda a, bb, x, y: segment.merge_fits(a, bb, x, y, p, ds)
        )(l1, l2, rf1, rf2)
        for key in ("quads", "valid", "sizes", "centroids", "is_inner",
                    "inner_coarse", "overflow"):
            np.testing.assert_array_equal(
                np.asarray(got[key]), np.asarray(ref[key]), err_msg=key
            )


def test_fused_coarsefit_bf16_envelope(rng):
    """Grids whose packed fit tail would round its bf16 MXU integrands
    (wc > 255 or rp*cp > 32768 — e.g. portrait 1080p at default coarse,
    or 1080p at coarse_factor=4) must be rejected by fused_fit_exact and
    refused by fused_coarsefit_batch; the detector routes them to the
    bit-exact label_planes + fused_fit_batch fallback instead."""
    from aruco3_tpu.ops.coarse_pallas import (
        _round_up, coarse_fits_vmem, fused_fit_exact,
    )
    from aruco3_tpu.ops.fit_pallas import fused_coarsefit_batch

    # Production landscape-1080p geometry stays on the fused path.
    assert fused_fit_exact(108, 192)
    assert fused_fit_exact(60, 80)
    # Portrait 1080p at default coarse: rp*cp = 192*256 > 32768.
    assert not fused_fit_exact(192, 108)
    # Wide: wc > 255 (cm / row totals round in bf16).
    assert not fused_fit_exact(64, 300)
    # 1080p at coarse_factor=4 fits VMEM but NOT the bf16 envelope.
    assert coarse_fits_vmem(270, 480) and not fused_fit_exact(270, 480)

    p = segment.QuadParams()
    for hc, wc in [(192, 108), (64, 300)]:
        rp = max(_round_up(hc, 8), 8)
        cp = max(256, _round_up(wc + 1, 128))
        pre = np.zeros((1, rp, cp), np.int32)
        pre[0, :hc, :wc] = (rng.random((hc, wc)) < 0.3).astype(np.int32)
        with pytest.raises(ValueError, match="exactness envelope"):
            fused_coarsefit_batch(
                jnp.asarray(pre), p, 8, p.max_candidates,
                p.max_inner_candidates, pre_hw=(hc, wc),
                dup_skip=True, interpret=True,
            )


def test_raw_src_refine_warp_match_plane_mode(rng):
    """RAW-src mode (no padded grey plane in HBM; refine DMAs frames
    into a padded VMEM scratch, warp level-0 clamps its bases) must
    bit-match the padded-plane split mode on every consumed output."""
    from aruco3_tpu import rectify
    from aruco3_tpu.detector import _num_levels
    from aruco3_tpu.ops.fit_pallas import fused_fit_batch
    from aruco3_tpu.ops.frontend_pallas import (
        fused_threshold_open_pool, split_strip_rows,
    )
    from aruco3_tpu.ops.refine_pallas import refine_corners_batch

    h, w, b, ds = 160, 256, 2, 10
    th = split_strip_rows(ds)
    assert th is not None
    frames = (rng.random((b, h, w)) * 255).astype(np.uint8)
    frames[:, 40:120, 60:200] = 255
    frames[:, 56:104, 76:184] = 0
    frames[:, 72:88, 92:168] = 255
    grey = jnp.asarray(frames)
    p = segment.QuadParams(coarse_factor=ds)
    wn = segment.refine_window_size(p, ds)
    kw = dict(
        emit_packed=True, emit_level1=True, emit_split=True,
        emit_coarse=True, min_rows=200, interpret=True,
    )
    coarse_p, packed, nearw, level1 = fused_threshold_open_pool(
        grey, 7, p.open_radius, ds, **kw
    )
    coarse_r, near_r, level1_r = fused_threshold_open_pool(
        grey, 7, p.open_radius, ds, emit_split_grey=False, **kw
    )
    np.testing.assert_array_equal(np.asarray(coarse_p), np.asarray(coarse_r))
    np.testing.assert_array_equal(np.asarray(nearw), np.asarray(near_r))
    np.testing.assert_array_equal(np.asarray(level1), np.asarray(level1_r))

    hc, wc = -(-h // ds), -(-w // ds)
    l1x, l2x = jax.vmap(lambda m: segment.label_planes(m, p))(
        coarse_p[:, :hc, :wc] != 0
    )
    f1, f2 = fused_fit_batch(
        l1x, l2x, ds, p, p.max_candidates, p.max_inner_candidates,
        dup_skip=True, interpret=True,
    )
    cand = jax.vmap(
        lambda a, bb, x, y: segment.merge_fits(a, bb, x, y, p, ds)
    )(l1x, l2x, f1, f2)
    assert int(np.asarray(cand["valid"]).sum()) >= 2

    common = dict(
        ds=ds, wn=wn, inner_coarse=cand["inner_coarse"],
        image_hw=(h, w), valid=cand["valid"], strip_rows=th,
        interpret=True,
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
    np.testing.assert_array_equal(np.asarray(q_pl)[v], np.asarray(q_raw)[v])

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
        l1_plane=level1 if l1_ok else None, interpret=True,
    )
    pat_raw = rectify.warp_patches_dma(
        canvas, offsets, shapes, Hm, q_pl, s, valid=wv, src=grey,
        src_halo=(0, 0), image_hw=(h, w),
        l1_plane=level1 if l1_ok else None, raw_src=True, interpret=True,
    )
    wvn = np.asarray(wv)
    np.testing.assert_array_equal(
        np.asarray(pat_pl)[wvn], np.asarray(pat_raw)[wvn]
    )


def test_refine_pallas_odd_candidate_count(rng):
    """Odd max_candidates (public DetectorConfig knob) must work: the
    batched kernel pads each frame's window list to the DMA group width."""
    from aruco3_tpu.ops.refine_pallas import refine_corners_batch

    b, k, h, w, ds = 2, 5, 160, 256, 8
    wn = segment.refine_window_size(segment.QuadParams(), ds)
    grey = jnp.asarray(rng.integers(0, 256, size=(b, h, w), dtype=np.uint8))
    black = jnp.asarray(rng.random((b, h, w)) < 0.3)
    quads = jnp.asarray(
        rng.uniform(10, 140, size=(b, k, 4, 2)).astype(np.float32)
    )
    cents = jnp.mean(quads, axis=2)
    is_inner = jnp.zeros((b, k), dtype=bool)
    ref = jax.vmap(
        lambda bl, q, c, g: segment.refine_corners(bl, q, c, ds, wn, grey=g)
    )(black, quads, cents, grey)
    zero_ic = jnp.zeros((b, -(-h // ds), -(-w // ds)), dtype=bool)
    packed = jax.vmap(
        lambda g, bl, ic: segment.build_packed_plane(g, bl, ic, ds)
    )(grey, black, zero_ic)
    got = refine_corners_batch(
        packed, quads, cents, is_inner, ds, wn, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_refine_pallas_matches_xla(rng):
    from aruco3_tpu.ops.refine_pallas import refine_corners_batch

    b, k, h, w, ds = 2, 6, 240, 320, 8
    wn = segment.refine_window_size(segment.QuadParams(), ds)
    grey = jnp.asarray(rng.integers(0, 256, size=(b, h, w), dtype=np.uint8))
    black = jnp.asarray(rng.random((b, h, w)) < 0.3)
    inner_coarse = jnp.asarray(
        rng.random((b, -(-h // ds), -(-w // ds))) < 0.5
    )
    quads = jnp.asarray(
        rng.uniform(10, 200, size=(b, k, 4, 2)).astype(np.float32)
    )
    cents = jnp.mean(quads, axis=2)
    is_inner = jnp.asarray(rng.random((b, k)) < 0.5)

    ref = jax.vmap(
        lambda bl, q, c, g, ic, ii: segment.refine_corners(
            bl, q, c, ds, wn, grey=g, inner_coarse=ic, is_inner=ii
        )
    )(black, quads, cents, grey, inner_coarse, is_inner)

    # The batched kernel takes the footprint at coarse resolution and
    # upsamples in VMEM; the packed plane carries bits 0-8 only.
    zero_ic = jnp.zeros_like(inner_coarse)
    packed = jax.vmap(
        lambda g, bl, ic: segment.build_packed_plane(g, bl, ic, ds)
    )(grey, black, zero_ic)
    got = refine_corners_batch(
        packed,
        quads,
        cents,
        is_inner,
        ds,
        wn,
        inner_coarse=inner_coarse,
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.parametrize("src_l0", [False, True])
def test_warp_dma_matches_mxu(rng, src_l0):
    """The batched DMA warp must match the XLA MXU warp to bf16 rounding
    (same level selection, same bilinear weights, black outside) — both
    with the full bf16 canvas and with level 0 read from the u8 grey
    canvas (the detector's configuration)."""
    b, h, w, K, S = 2, 240, 320, 5, 49
    grey = jnp.asarray(rng.integers(0, 256, size=(b, h, w), dtype=np.uint8))
    # Quads safely inside the frame and within their warp windows.
    c = rng.uniform(80, 220, size=(b, K, 1, 2))
    half = rng.uniform(15, 60, size=(b, K, 1, 1))
    base = np.array([[-1, -1], [1, -1], [1, 1], [-1, 1]], float)
    quads = jnp.asarray((c + half * base).astype(np.float32))
    levels = max(1, int(math.ceil(math.log2(max(h, w) / 60.0))) + 1)
    H, _ = rectify.homography_square_to_quad(quads, S)

    ref = np.stack(
        [
            np.asarray(
                rectify.warp_patches_mxu(
                    rectify.build_pyramid(grey[i], levels), H[i], quads[i], S
                )
            )
            for i in range(b)
        ]
    )
    canvas, offsets, shapes = rectify.build_packed_pyramid(
        grey, levels, skip_level0=src_l0
    )
    kwargs = {}
    if src_l0:
        kwargs = dict(src=rectify.build_grey_src(grey), image_hw=(h, w))
    got = np.asarray(
        rectify.warp_patches_dma(
            canvas, offsets, shapes, H, quads, S, interpret=True, **kwargs
        )
    )
    # The DMA path's pyramid accumulates bf16 rounding per level (~0.25
    # grey each) where the reference pyramid is f32; both are far below
    # the Otsu contrast margin.
    assert np.abs(got - ref).max() < 2.5


def test_warp_dma_fused_decode_matches_xla(rng):
    """The warp kernel's fused decode epilogue (in-VMEM Otsu + binarize
    + flattened Triangle resize + >127 cell rule) must reproduce
    rectify.decode_patches on the kernel's own samples: same cell grid,
    same bits, same border validity.  Uses marker-bearing windows (the
    decision margins of real content) plus pure-noise windows (exercise
    Otsu plateaus/ties)."""
    from aruco3_tpu.dictionaries import ARDictionary
    from aruco3_tpu.render import render_marker

    d = ARDictionary.new_from_named_dict("ARUCO_DEFAULT")
    m = d.get_mark_size()
    b, h, w, K, S = 2, 240, 320, 5, 49
    img0 = render_marker(
        d, 9,
        (w, h),
        np.array([[90, 70], [210, 80], [205, 190], [85, 185]], float),
        noise_sigma=2.0,
    )
    img1 = (rng.random((h, w)) * 255).astype(np.uint8)
    grey = jnp.asarray(np.stack([np.asarray(img0), img1]))
    c = rng.uniform(80, 220, size=(b, K, 1, 2))
    half = rng.uniform(15, 60, size=(b, K, 1, 1))
    base = np.array([[-1, -1], [1, -1], [1, 1], [-1, 1]], float)
    quads = (c + half * base).astype(np.float32)
    quads[0, 0] = np.array(
        [[90, 70], [210, 80], [205, 190], [85, 185]], np.float32
    )
    quads = jnp.asarray(quads)
    levels = max(1, int(math.ceil(math.log2(max(h, w) / 60.0))) + 1)
    H, _ = rectify.homography_square_to_quad(quads, S)
    canvas, offsets, shapes = rectify.build_packed_pyramid(grey, levels)
    patches, grids = rectify.warp_patches_dma(
        canvas, offsets, shapes, H, quads, S, interpret=True,
        fuse_decode_mark=m,
    )
    gbits, gvalid = jax.vmap(
        lambda g: rectify.decode_grids(g, m)
    )(grids)
    rbits, rvalid = jax.vmap(
        lambda p: rectify.decode_patches(p, m)
    )(patches)
    np.testing.assert_array_equal(np.asarray(gvalid), np.asarray(rvalid))
    np.testing.assert_array_equal(np.asarray(gbits), np.asarray(rbits))
    # The marker window must actually decode (guards against a
    # trivially-all-black grid making the comparison vacuous).
    ids_r, _ = d.find_nearest_bits(np.asarray(gbits[0, 0]))
    assert 9 in np.asarray(ids_r)


def test_warp_dma_l1_direct(rng):
    """Routing level-1 windows straight to the frontend's emitted level-1
    plane (warp kernel source 2, canvas starting at level 2) must be
    bit-identical to reading level 1 from the canvas, and match the XLA
    MXU warp within bf16 rounding."""
    b, h, w, K, S = 2, 480, 640, 6, 49
    grey = jnp.asarray(rng.integers(0, 256, size=(b, h, w), dtype=np.uint8))
    c = rng.uniform(130, 350, size=(b, K, 1, 2))
    half = rng.uniform(40, 110, size=(b, K, 1, 1))  # levels 1 and 2
    base = np.array([[-1, -1], [1, -1], [1, 1], [-1, 1]], float)
    quads = jnp.asarray((c + half * base).astype(np.float32))
    levels = max(1, int(math.ceil(math.log2(max(h, w) / 60.0))) + 1)
    H, _ = rectify.homography_square_to_quad(quads, S)

    out = fused_threshold_open_pool(
        grey, 7, 2, 10, interpret=True, emit_packed=True,
        emit_grey_canvas=True, emit_level1=True,
    )
    level1, src, halo_r, halo_c = out[2], out[3], out[4], out[5]
    assert rectify.l1_direct_ok(
        level1.shape[1:], rectify.pyramid_level_shapes(h, w, levels), levels
    )
    kwargs = dict(
        src=src, src_halo=(halo_r, halo_c), image_hw=(h, w), interpret=True
    )

    canvas0, off0, shp0 = rectify.build_packed_pyramid(
        grey, levels, skip_level0=True, level1=level1
    )
    base_out = np.asarray(
        rectify.warp_patches_dma(canvas0, off0, shp0, H, quads, S, **kwargs)
    )
    canvas1, off1, shp1 = rectify.build_packed_pyramid(
        grey, levels, skip_level0=True, level1=level1, skip_level1=True
    )
    assert canvas1.shape[1] < canvas0.shape[1]
    l1_out = np.asarray(
        rectify.warp_patches_dma(
            canvas1, off1, shp1, H, quads, S, l1_plane=level1, **kwargs
        )
    )
    assert np.array_equal(base_out, l1_out)

    # Production level-0 source: the int16 packed plane (grey in bits
    # 0-7, image at (0, 0), zero outside the image; the warp kernel
    # masks off the near flag) must reproduce the u8-canvas warp
    # bit-for-bit — this is the detector's configuration.
    packed = out[1]
    pk_out = np.asarray(
        rectify.warp_patches_dma(
            canvas1, off1, shp1, H, quads, S, l1_plane=level1,
            src=packed, src_halo=(0, 0), image_hw=(h, w), interpret=True,
        )
    )
    assert np.array_equal(l1_out, pk_out)

    ref = np.stack(
        [
            np.asarray(
                rectify.warp_patches_mxu(
                    rectify.build_pyramid(grey[i], levels), H[i], quads[i], S
                )
            )
            for i in range(b)
        ]
    )
    assert np.abs(l1_out - ref).max() < 2.5


def test_warp_pallas_matches_mxu(rng):
    h, w, K, S = 480, 640, 8, 49
    grey = jnp.asarray(rng.integers(0, 256, size=(h, w), dtype=np.uint8))
    quads = jnp.asarray(
        rng.uniform(50, 400, size=(K, 4, 2)).astype(np.float32)
    )
    levels = max(1, int(math.ceil(math.log2(max(h, w) / 60.0))) + 1)
    pyr = rectify.build_pyramid(grey, levels)
    H, _ = rectify.homography_square_to_quad(quads, S)
    a = np.asarray(rectify.warp_patches_mxu(pyr, H, quads, S))
    windows, ux, uy, bad = rectify._warp_setup(pyr, H, quads, S)
    v = warp_eval(windows, ux, uy, interpret=True)
    b = np.asarray(jnp.where(bad, 0.0, v).reshape(K, S, S))
    # Both paths round through bf16; agreement within one grey level.
    assert np.abs(a - b).max() < 1.5
