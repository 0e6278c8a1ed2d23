"""Pallas coarse-segmentation kernel: every flood/CCL round in VMEM.

The XLA coarse stage (segment.extract_candidates' flood/fill/label steps)
runs ~26 rounds of segmented scans over the (Hc, Wc) grid; every roll and
select materializes a (B, Hc, Wc) int32 tensor in HBM, making the stage
HBM-round-trip-bound (~17 ms of the 1080p batch-128 profile).  This
kernel holds one frame's coarse grid (~128 KB) in VMEM for the whole
computation: background flood, outside flood + hole fill, outer CCL,
level-1 flood, inner-mask fill, inner CCL — reading the grid once and
writing the two label planes once.

Semantics match segment.flood_from_border / fill_holes /
label_components exactly (same shift-doubling segmented min-scans, same
8-neighbour steps); tested bit-exact in interpret mode.

Lane axis shifts are pltpu.roll (wraps are masked or land in padding);
row shifts are concat-with-fill (int32 sublane rolls lower
pathologically in Mosaic).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..segment import ADMIT_OFFSETS as _ADMIT_OFFSETS
from .frontend_pallas import _unpack_bits_halving, _unpack_row_order


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _words_down(wp):
    """Word-granularity shift: out word i = in word i-1 (zeros in)."""
    return jnp.concatenate([jnp.zeros_like(wp[:1]), wp[:-1]], axis=0)


def _words_up(wp):
    return jnp.concatenate([wp[1:], jnp.zeros_like(wp[:1])], axis=0)


def _bit_fwd(wp, s: int):
    """Row-bit-packed shift FORWARD: out bit k = in bit k-s (zeros in).

    Words pack 32 grid rows in bits 0..31; word index rides sublanes.
    """
    q, r = divmod(s, 32)
    for _ in range(q):
        wp = _words_down(wp)
    if r:
        prv = _words_down(wp)
        wp = (wp << r) | ((prv >> (32 - r)) & ((1 << r) - 1))
    return wp


def _bit_bwd(wp, s: int):
    """out bit k = in bit k+s (zeros in)."""
    q, r = divmod(s, 32)
    for _ in range(q):
        wp = _words_up(wp)
    if r:
        nxt = _words_up(wp)
        wp = ((wp >> r) & ((1 << (32 - r)) - 1)) | (nxt << (32 - r))
    return wp


def _chain_levels(rp: int, cp: int) -> int:
    """Live (rp, cp) planes held by the precomputed seg-scan accept
    chains (both directions, lane + row doubling levels)."""
    lv = 0
    s = 1
    while s < cp:
        lv += 2
        s *= 2
    s = 1
    while s < rp:
        lv += 2
        s *= 2
    return lv


def _fit_pool_size(k: int, p: int) -> int:
    # fit_quads' grid-scaled ranking-pool formula (segment.py) — p is the
    # CROPPED cell count (pool-size parity with the XLA path).
    return max(k, min(p, max(4 * k, 64, min(p // 16, 1024))))


def _packed_fit_tail(
    l1,
    l2,  # None when the inner pass is disabled
    out_ref,  # (F, rp_out, 128) f32 fit rows (fused_fit_batch layout)
    ic_ref,  # (F, rp, cp) i32 inner_coarse (dilated inner footprint)
    *,
    F,
    rp,
    cp,
    hc,
    wc,
    w_all,
    ds,
    k1,
    k2,
    min_px,
    slack,
    min_cont,
    dup_skip,
    riota,
    cm,
    pack_bits,
    unpack_bits,
    dil8_b,
    interpret,
):
    """In-kernel fit stage over the PACKED padded label planes.

    Reproduces ops.fit_pallas._fused_fit_call (rank pool -> top-k-by-size
    selection -> per-lane fit chain, dup_skip twin pre-kill) bit-for-bit
    on the downstream-consumed values, but with F frames packed side by
    side along lanes — every plane op serves F frames, and the per-frame
    scalar reductions become one matmul/row-reduce pair or a per-segment
    Kogge-Stone tree instead of F serialized full-plane reductions.

    Exactness in PADDED space (labels hold per-frame padded linear
    indices row*cp + col, sentinel rp*cp):
      * raster/rank order: padding cells are never roots, and padded
        linear order restricted to in-image cells equals cropped raster
        order, so ranks, roots (as cells) and argmax tie-breaks (min
        linear index of the tie set) pick identical cells.
      * sums (sizes, centroid sums, containment counts) are integers or
        0.5-multiples < 2^24: exact in f32 at any order, and the MXU
        frame-indicator contractions use bf16-EXACT integrands (0/1
        masks, cm < 256, riota < 128, lin split into <256 halves).
      * per-frame scalar broadcasts split f32 into three bf16 chunks
        (x = a+b+c exactly, 8+8+8 mantissa bits >= f32's 24), broadcast
        each with a 0/1 indicator matmul and re-sum — bit-exact.
      * the admission pre-filter emulates fit_quads' CROPPED jnp.roll
        wrap with a second lane roll + per-frame select (a padded roll
        alone would miss legitimate same-component wrap hits of
        full-width components).
    Final roots are remapped to cropped linear indices in-kernel; quad
    coords computed from padded cm/riota equal the cropped values at
    every member cell.  Reference: bounded candidate list of
    /root/reference/src/aruco.rs:124-166.
    """
    two = l2 is not None and k2 > 0
    p_crop = hc * wc
    P = rp * cp  # padded sentinel
    pf = float(P)
    kr1 = _fit_pool_size(k1, p_crop)
    kr2 = _fit_pool_size(k2, p_crop) if two else 0
    kp1 = _round_up(k1, 8)
    kp2 = _round_up(k2, 8) if two else 0
    nstat = 6 if two else 3
    srow = kp1 + kp2
    krp1 = _round_up(kr1, 128)
    krp2 = _round_up(kr2, 128) if two else 0
    slack_px = slack * ds
    c0 = (ds - 1) * 0.5
    t_adm = min(int(min_px), 3)

    f32 = jnp.float32
    bf = jnp.bfloat16

    # ---- shared geometry planes (once per grid step) ----
    cm_f = cm.astype(f32)
    ri_f = riota.astype(f32)
    lin = riota * cp + cm  # padded per-frame linear index == label space
    lin_f = lin.astype(f32)
    lin_hi = (lin // 128).astype(f32)  # <= 255: bf16-exact matmul halves
    lin_lo = (lin % 128).astype(f32)
    cxp = cm_f * ds + c0
    cyp = ri_f * ds + c0
    cm_row = cm[:1]  # (1, w_all) per-frame lane index
    neg_inf = jnp.float32(-jnp.inf)
    pos_inf = jnp.float32(jnp.inf)

    # Frame-indicator matmul weights (0/1, bf16-exact).
    find = (
        jax.lax.broadcasted_iota(jnp.int32, (w_all, F), 0) // cp
        == jax.lax.broadcasted_iota(jnp.int32, (w_all, F), 1)
    )
    ind = find.astype(f32).astype(bf)  # (w_all, F)
    findT = (
        jax.lax.broadcasted_iota(jnp.int32, (F, w_all), 1) // cp
        == jax.lax.broadcasted_iota(jnp.int32, (F, w_all), 0)
    )
    indT = findT.astype(f32).astype(bf)  # (F, w_all)

    def seg_sum(integrand):
        """(rp, w_all) f32 bf16-exact-valued -> (1, F) per-frame sums.

        Stage 1 contracts lanes on the MXU (bf16 x 0/1 -> f32 accum),
        stage 2 sums the (rp, F) partials over sublanes in f32 — exact
        for integer-valued data with per-frame sums < 2^24."""
        a = jax.lax.dot_general(
            integrand.astype(bf), ind, (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        )  # (rp, F)
        return jnp.sum(a, axis=0, keepdims=True)  # (1, F)

    def seg_sum_multi(integrands):
        """[(rp, w_all)] -> [(1, F)]: C per-frame sums through ONE
        stacked (C*rp, w_all) MXU contraction (each output row depends
        only on its own input row — bit-identical to C separate
        seg_sum calls), then per-chain f32 row-reduces."""
        x = (
            jnp.concatenate(integrands, axis=0)
            if len(integrands) > 1
            else integrands[0]
        )
        a = jax.lax.dot_general(
            x.astype(bf), ind, (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        )  # (C*rp, F)
        return [
            jnp.sum(a[i * rp : (i + 1) * rp], axis=0, keepdims=True)
            for i in range(len(integrands))
        ]

    def bcast_rows(xs):
        """[(1, F) f32 (any value)] -> [(1, w_all)] per-frame
        broadcasts, bit-exact: three-way bf16 split (x = a+b+c exactly;
        24 mantissa bits covered), each chunk broadcast by a 0/1
        indicator matmul, re-summed in f32 (a+b exact at 16 bits, +c
        exact at 24).  The C inputs ride ONE stacked (C, F) operand —
        each output row depends only on its own input row, so batching
        is bit-neutral, and 3 matmuls serve all C broadcasts."""
        x = jnp.concatenate(xs, axis=0) if len(xs) > 1 else xs[0]
        a = x.astype(bf).astype(f32)
        r1 = x - a
        b_ = r1.astype(bf).astype(f32)
        c_ = r1 - b_

        def mm(t):
            return jax.lax.dot_general(
                t.astype(bf), indT, (((1,), (0,)), ((), ())),
                preferred_element_type=f32,
            )  # (C, w_all)

        out = (mm(a) + mm(b_)) + mm(c_)
        return [out[i : i + 1] for i in range(len(xs))]

    def bcast_row(x):
        return bcast_rows([x])[0]

    # Per-frame lane reductions on (1, w_all) rows: Kogge-Stone suffix
    # scan within frames + log-broadcast from lane 0.  A (1, w_all) row
    # uses one sublane of its 16 vregs, so R <= 8 independent
    # reductions stacked into an (R, w_all) plane cost the SAME vreg
    # issue count as one — the chain stage batches its reductions
    # across lockstep chains (min via negation: -max(-x), exact).
    # Measured NO-GO: folding lanes into sublanes with a
    # (1, w_all) -> (w_all//128, 128) reshape (one cross-lane reduce
    # for every frame, ~12 ops) — Mosaic rejects the shape cast
    # ("infer-vector-layout: unsupported shape cast").
    def seg_scan_max_rows(rows):
        """[(1, w_all) f32 max-oriented rows (out-of-frame fill -inf)]
        -> per-row per-frame max broadcast over each frame's lanes.
        Identical op sequence to the single-row scan; stacking is
        bit-neutral (lane ops never mix sublanes)."""
        r = jnp.concatenate(rows, axis=0) if len(rows) > 1 else rows[0]
        s = 1
        while s < cp:
            nxt = pltpu.roll(r, (-s) % w_all, axis=1)
            r = jnp.maximum(r, jnp.where(cm_row + s < cp, nxt, neg_inf))
            s *= 2
        s = 1
        while s < cp:
            prev = pltpu.roll(r, s % w_all, axis=1)
            r = jnp.where(cm_row >= s, prev, r)
            s *= 2
        return [r[i : i + 1] for i in range(len(rows))]

    def col(x_1f):
        return jnp.reshape(x_1f, (F, 1))

    def row(x_f1):
        return jnp.reshape(x_f1, (1, F))

    def crop_roll(x, dy, dx):
        """Per-frame CROPPED jnp.roll(jnp.roll(x, -dy, 0), -dx, 1) on the
        padded packed plane (wraps at hc rows / wc lanes, exactly like
        fit_quads' admission rolls; padding rows/lanes read garbage but
        the count is only consumed at root cells, which never sit in
        padding)."""
        if dy:
            parts = [x[dy:hc], x[:dy]]
            if rp > hc:
                parts.append(jnp.full((rp - hc, w_all), P, jnp.int32))
            x = jnp.concatenate(parts, axis=0)
        if dx:
            main = pltpu.roll(x, (-dx) % w_all, axis=1)
            if dx > 0:
                wrap = pltpu.roll(x, (wc - dx) % w_all, axis=1)
                x = jnp.where(cm < wc - dx, main, wrap)
            else:
                wrap = pltpu.roll(x, (-(wc + dx)) % w_all, axis=1)
                x = jnp.where(cm >= -dx, main, wrap)
        return x

    # ---- rank prep (admission pre-filter + per-frame MXU cumsum) ----
    tri_lane = (
        jax.lax.broadcasted_iota(jnp.int32, (cp, cp), 0)
        <= jax.lax.broadcasted_iota(jnp.int32, (cp, cp), 1)
    ).astype(f32).astype(bf)
    tri_row = (
        jax.lax.broadcasted_iota(jnp.int32, (rp, rp), 1)
        < jax.lax.broadcasted_iota(jnp.int32, (rp, rp), 0)
    ).astype(f32).astype(bf)

    def rank_prep(lab):
        is_root = lab == lin
        if t_adm > 1:
            cnt = jnp.zeros((rp, w_all), jnp.int32)
            by_dy: dict[int, list[int]] = {}
            for dy, dx in _ADMIT_OFFSETS[t_adm]:
                by_dy.setdefault(dy, []).append(dx)
            for dy, dxs in by_dy.items():
                rowr = crop_roll(lab, dy, 0)
                for dx in dxs:
                    sh = crop_roll(rowr, 0, dx)
                    cnt = cnt + (sh == lab).astype(jnp.int32)
            is_root = is_root & (cnt >= t_adm - 1)
        ir_f = is_root.astype(f32)
        n_1f = seg_sum(ir_f)  # (1, F) root counts
        root_bf = ir_f.astype(bf)
        blocks = []
        for f in range(F):
            blk = root_bf[:, f * cp : (f + 1) * cp]  # (rp, cp)
            pref = jax.lax.dot_general(
                blk, tri_lane, (((1,), (0,)), ((), ())),
                preferred_element_type=f32,
            )  # inclusive lane prefix
            rowtot = pref[:, cp - 1 : cp]  # (rp, 1) row totals (<= wc)
            rpex = jax.lax.dot_general(
                tri_row, rowtot.astype(bf), (((1,), (0,)), ((), ())),
                preferred_element_type=f32,
            )  # exclusive row prefix
            blocks.append(
                (pref + rpex - 1.0).astype(jnp.int32)
            )
        rank = jnp.concatenate(blocks, axis=1)
        ranked = jnp.where(is_root, rank, -1)
        return ranked, n_1f

    # ---- per-rank (root, size) extraction ----
    def rank_pool(lab, ranked, n_1f, kr, krp):
        t_1f = jnp.minimum(n_1f, float(kr))
        h_1f = jnp.floor((t_1f + 1.0) * 0.5)  # per-frame half split
        st = {
            "lab": lab,
            "ranked": ranked,
            "krp": krp,
            "t_col": col(t_1f),  # f32 (Mosaic can't reshape i1)
            "h_col": col(h_1f),
            "h_row": bcast_row(h_1f),
            "trips": jnp.max(h_1f).astype(jnp.int32),
            "lane_kr": jax.lax.broadcasted_iota(jnp.int32, (F, krp), 1),
        }
        rv = jnp.zeros((F, krp), f32)
        sv = jnp.full((F, krp), -1.0, f32)
        return st, rv, sv

    def rank_extract(lab, hit):
        hi = seg_sum(jnp.where(hit, lin_hi, 0.0))
        lo = seg_sum(jnp.where(hit, lin_lo, 0.0))
        root_1f = hi * 128.0 + lo  # (1, F) f32, exact (< 2^15)
        root_row = bcast_row(root_1f).astype(jnp.int32)
        size_1f = seg_sum((lab == root_row).astype(f32))
        return root_1f, size_1f

    def rank_round(st, r, rv, sv):
        # Two interleaved chains per plane (ranks r and r + h_f); the
        # caller interleaves both planes' rounds as well — the stage is
        # latency-bound on serialized seg-reductions, and the chains
        # touch disjoint lanes so values are order-independent.
        rf = jnp.float32(r)
        hit_a = st["ranked"] == r
        ra_1f, sa_1f = rank_extract(st["lab"], hit_a)
        va_col = st["h_col"] > rf
        tgt_a = jnp.where(va_col, r, st["krp"])
        rv = jnp.where(st["lane_kr"] == tgt_a, col(ra_1f), rv)
        sv = jnp.where(st["lane_kr"] == tgt_a, col(sa_1f), sv)
        r2_row = st["h_row"] + rf  # (1, w_all) per-frame rank index
        hit_b = st["ranked"].astype(f32) == r2_row
        rb_1f, sb_1f = rank_extract(st["lab"], hit_b)
        vb_col = st["t_col"] > st["h_col"] + rf
        tgt_b = jnp.where(
            vb_col, (st["h_col"] + rf).astype(jnp.int32), st["krp"]
        )
        rv = jnp.where(st["lane_kr"] == tgt_b, col(rb_1f), rv)
        sv = jnp.where(st["lane_kr"] == tgt_b, col(sb_1f), sv)
        return rv, sv

    # ---- top-k-by-size selection (packed root key; see fit_pallas) ----
    p2 = 1 << max(P - 1, 1).bit_length()
    root_key = (P + 1) * p2 < 2**31
    p2log = p2.bit_length() - 1

    def select_state(rv, sv, n_1f, k, krp):
        ns_1f = jnp.minimum(n_1f, float(k))
        if root_key:
            key0 = sv.astype(jnp.int32) * p2 + (
                (p2 - 1) - rv.astype(jnp.int32)
            )
        else:
            lane_kr = jax.lax.broadcasted_iota(jnp.int32, (F, krp), 1)
            key0 = sv.astype(jnp.int32) * 1024 + (1023 - lane_kr)
        st = {
            "rv": rv,
            "ns_1f": ns_1f,
            "ns_col": col(ns_1f),
            "rounds": jnp.max(ns_1f).astype(jnp.int32),
        }
        sr8 = jnp.zeros((F, 128), f32)
        ss8 = jnp.full((F, 128), -1.0, f32)
        return st, key0, sr8, ss8

    def select_round(st, j, key, sr8, ss8):
        m_col = jnp.max(key, axis=1, keepdims=True)  # (F, 1)
        valid_col = st["ns_col"] > jnp.float32(j)
        if root_key:
            root_col = ((p2 - 1) - (m_col & (p2 - 1))).astype(f32)
        else:
            pick = key == m_col
            root_col = jnp.sum(
                jnp.where(pick, st["rv"], 0.0), axis=1, keepdims=True
            )
        size_col = jnp.right_shift(
            m_col, p2log if root_key else 10
        ).astype(f32)
        tgt = jnp.where(valid_col, j, 128)
        sr8 = jnp.where(lane128 == tgt, root_col, sr8)
        ss8 = jnp.where(lane128 == tgt, size_col, ss8)
        key = jnp.where(
            (key == m_col) & valid_col, jnp.int32(-(2**30)), key
        )
        return key, sr8, ss8

    # ---- per-lane fit chain (packed rows; fit_quads' f32 expressions) --
    lane128 = jax.lax.broadcasted_iota(jnp.int32, (F, 128), 1)

    def fetch(sr8, ss8, kk):
        hit = lane128 == kk
        r_col = jnp.sum(jnp.where(hit, sr8, 0.0), axis=1, keepdims=True)
        s_col = jnp.sum(jnp.where(hit, ss8, 0.0), axis=1, keepdims=True)
        return r_col, s_col

    def chain_rows_multi(lab, roots_1f, sizes_1f):
        """C lockstep fit chains on one label plane: returns, per
        chain, the 11 per-frame value rows [(1, w_all)] (ax..dy, frac,
        cenx, ceny) and frac_1f — fit_quads' exact f32 expressions
        evaluated per frame segment.

        The C chains' segmented reductions ride stacked (<= 2C, w_all)
        Kogge-Stone scans and their per-frame broadcasts / sums share
        indicator matmuls — C-for-the-price-of-one on the (1, w_all)
        issue-bound parts (each stacked row computes exactly what its
        standalone scan computed; mins run as -max(-x), exact)."""
        C = len(roots_1f)
        root_rows = [
            rr.astype(jnp.int32) for rr in bcast_rows(roots_1f)
        ]
        members = [lab == rr for rr in root_rows]
        szf = [jnp.maximum(s, 1.0) for s in sizes_1f]
        # sum(cxp over member) == ds*sum(cm) + c0*size exactly (both
        # are exact f32 computations of the same 0.5-multiple < 2^24);
        # the passed selection size IS the member count on valid lanes.
        s_cmri = seg_sum_multi(
            [jnp.where(m, cm_f, 0.0) for m in members]
            + [jnp.where(m, ri_f, 0.0) for m in members]
        )
        cen_1f = []
        for i in range(C):
            size_m = jnp.maximum(sizes_1f[i], 0.0)
            cen_1f.append((ds * s_cmri[i] + c0 * size_m) / szf[i])
            cen_1f.append((ds * s_cmri[C + i] + c0 * size_m) / szf[i])
        cen_rows = bcast_rows(cen_1f)

        def cx_of(i_row):
            ii = i_row.astype(jnp.int32)
            return (ii % cp).astype(f32) * ds + c0

        def cy_of(i_row):
            ii = i_row.astype(jnp.int32)
            return (ii // cp).astype(f32) * ds + c0

        def argmax_rows(scores):
            """Per chain: (max score row, min-lin-of-tie-set row) — the
            two dependent scans batched across chains.  Score planes
            carry -inf outside members; the tie-break min runs negated
            (values in [0, pf]: -max(-cand) == min(cand), exact)."""
            m_rows = seg_scan_max_rows(
                [jnp.max(s, axis=0, keepdims=True) for s in scores]
            )
            negmins = seg_scan_max_rows(
                [
                    -jnp.min(
                        jnp.where(s == m_rows[i], lin_f, pf),
                        axis=0,
                        keepdims=True,
                    )
                    for i, s in enumerate(scores)
                ]
            )
            return m_rows, [-nm for nm in negmins]

        # Farthest-from-centroid (A), then farthest-from-A (C).
        s1s = [
            jnp.where(
                members[i],
                (cxp - cen_rows[2 * i]) ** 2
                + (cyp - cen_rows[2 * i + 1]) ** 2,
                neg_inf,
            )
            for i in range(C)
        ]
        _, ias = argmax_rows(s1s)
        axs = [cx_of(ia) for ia in ias]
        ays = [cy_of(ia) for ia in ias]
        s2s = [
            jnp.where(
                members[i],
                (cxp - axs[i]) ** 2 + (cyp - ays[i]) ** 2,
                neg_inf,
            )
            for i in range(C)
        ]
        _, ics = argmax_rows(s2s)
        qcxs = [cx_of(ic_) for ic_ in ics]
        qcys = [cy_of(ic_) for ic_ in ics]

        # Extreme cross products (B / D): the per-chain max and min of
        # the same cross plane are independent — one 2C-row scan for
        # the extremes, one for their tie-break mins.
        crosses = []
        for i in range(C):
            dx = qcxs[i] - axs[i]
            dy = qcys[i] - ays[i]
            crosses.append(
                (cxp - axs[i]) * dy - (cyp - ays[i]) * dx
            )
        s3s = [
            jnp.where(members[i], crosses[i], neg_inf) for i in range(C)
        ]
        s3n = [
            jnp.where(members[i], -crosses[i], neg_inf)
            for i in range(C)
        ]
        ext = seg_scan_max_rows(
            [jnp.max(s, axis=0, keepdims=True) for s in s3s]
            + [jnp.max(s, axis=0, keepdims=True) for s in s3n]
        )
        cands = []
        for i in range(C):
            cands.append(
                -jnp.min(
                    jnp.where(s3s[i] == ext[i], lin_f, pf),
                    axis=0,
                    keepdims=True,
                )
            )
        for i in range(C):
            # min-cross tie set: s4 == min4 with s4 = +inf off-members
            # (empty frames degenerate to lin 0, as before).
            s4 = jnp.where(members[i], crosses[i], pos_inf)
            cands.append(
                -jnp.min(
                    jnp.where(s4 == -ext[C + i], lin_f, pf),
                    axis=0,
                    keepdims=True,
                )
            )
        bd = seg_scan_max_rows(cands)
        ibs = [-bd[i] for i in range(C)]
        idds = [-bd[C + i] for i in range(C)]

        out = []
        frac_ins = []
        geoms = []
        for i in range(C):
            ax, ay = axs[i], ays[i]
            qcx, qcy = qcxs[i], qcys[i]
            bx, by = cx_of(ibs[i]), cy_of(ibs[i])
            ddx, ddy = cx_of(idds[i]), cy_of(idds[i])
            area2 = (
                ax * by - bx * ay
                + bx * qcy - qcx * by
                + qcx * ddy - ddx * qcy
                + ddx * ay - ax * ddy
            )
            sgn = jnp.where(area2 >= 0, 1.0, -1.0)
            inside = None
            for efx, efy, etx, ety in (
                (ax, ay, bx, by),
                (bx, by, qcx, qcy),
                (qcx, qcy, ddx, ddy),
                (ddx, ddy, ax, ay),
            ):
                ex = etx - efx
                ey = ety - efy
                elen = jnp.sqrt(ex * ex + ey * ey) + 1e-6
                av = sgn * ex
                bv = sgn * ey
                c0e = bv * efx - av * efy
                rhs = -slack_px * elen - c0e  # (1, w_all) row RHS
                cmp = cyp * av - cxp * bv >= rhs
                inside = cmp if inside is None else inside & cmp
            frac_ins.append((members[i] & inside).astype(f32))
            geoms.append((ax, ay, bx, by, qcx, qcy, ddx, ddy))
        frac_sums = seg_sum_multi(frac_ins)
        frac_1fs = [frac_sums[i] / szf[i] for i in range(C)]
        frac_rows = bcast_rows(frac_1fs)
        for i in range(C):
            ax, ay, bx, by, qcx, qcy, ddx, ddy = geoms[i]
            out.append(
                (
                    [ax, ay, bx, by, qcx, qcy, ddx, ddy, frac_rows[i],
                     cen_rows[2 * i], cen_rows[2 * i + 1]],
                    frac_1fs[i],
                )
            )
        return out

    def write_rows(vals, gate_row, kk, row0):
        """Assemble the 11 values into each frame's output row (value fi
        at lane f*cp+fi), zero gated-off frames, store per frame."""
        acc = jnp.zeros((1, w_all), f32)
        for fi, v in enumerate(vals):
            acc = jnp.where(cm_row == fi, v, acc)
        acc = jnp.where(gate_row > 0.5, acc, 0.0)
        for f in range(F):
            out_ref[f, row0 + kk] = acc[0, f * cp : f * cp + 128]

    # ================= driver =================
    # Rank + select rounds for both planes run INTERLEAVED in shared
    # loops: each plane's rounds are serialized on their own reduction
    # chains, but the two planes are independent, so the scheduler can
    # overlap their latencies (measured win in the standalone fused fit
    # kernel, PERF.md).
    ranked1, n1_1f = rank_prep(l1)
    st1, rv1, sv1 = rank_pool(l1, ranked1, n1_1f, kr1, krp1)
    if two:
        ranked2, n2_1f = rank_prep(l2)
        st2, rv2, sv2 = rank_pool(l2, ranked2, n2_1f, kr2, krp2)

        def rank_body(r, carry):
            rv1, sv1, rv2, sv2 = carry
            rv1, sv1 = rank_round(st1, r, rv1, sv1)
            rv2, sv2 = rank_round(st2, r, rv2, sv2)
            return rv1, sv1, rv2, sv2

        rv1, sv1, rv2, sv2 = jax.lax.fori_loop(
            0,
            jnp.maximum(st1["trips"], st2["trips"]),
            rank_body,
            (rv1, sv1, rv2, sv2),
        )
    else:
        rv1, sv1 = jax.lax.fori_loop(
            0,
            st1["trips"],
            lambda r, c: rank_round(st1, r, *c),
            (rv1, sv1),
        )

    sst1, key1, sr1, ss1 = select_state(rv1, sv1, n1_1f, k1, krp1)
    if two:
        sst2, key2, sr2, ss2 = select_state(rv2, sv2, n2_1f, k2, krp2)

        def sel_body(j, carry):
            key1, sr1, ss1, key2, sr2, ss2 = carry
            key1, sr1, ss1 = select_round(sst1, j, key1, sr1, ss1)
            key2, sr2, ss2 = select_round(sst2, j, key2, sr2, ss2)
            return key1, sr1, ss1, key2, sr2, ss2

        _, sr1, ss1, _, sr2, ss2 = jax.lax.fori_loop(
            0,
            jnp.maximum(sst1["rounds"], sst2["rounds"]),
            sel_body,
            (key1, sr1, ss1, key2, sr2, ss2),
        )
        ns2_1f = sst2["ns_1f"]
        ns2_row = bcast_row(ns2_1f)
        trips2 = sst2["rounds"]
    else:
        _, sr1, ss1 = jax.lax.fori_loop(
            0,
            sst1["rounds"],
            lambda j, c: select_round(sst1, j, *c),
            (key1, sr1, ss1),
        )
    ns1_1f = sst1["ns_1f"]
    ns1_row = bcast_row(ns1_1f)
    trips1 = sst1["rounds"]

    # Zero the whole output block once (unused lanes/rows stay zero).
    rp_out = out_ref.shape[1]
    for f in range(F):
        out_ref[f] = jnp.zeros((rp_out, 128), f32)

    # ---- pass-1 fit chains: FOUR lockstep chains per trip (lanes kk,
    # kk+qa, kk+2qa, kk+3qa with qa = ceil(trips1/4)); chain_rows_multi
    # batches the four chains' seg-reductions/broadcasts, so a trip
    # costs little more than one chain used to.  Coverage: the four
    # quarter segments tile [0, 4*qa) >= [0, trips1); out-of-range
    # lanes (kk >= per-frame ns) are gated off at the write (their row
    # index stays < kp1: 4*ceil(k/4) <= round_up(k, 8)). ----
    qa = jnp.right_shift(trips1 + 3, 2)  # ceil(trips1 / 4)

    def lane1_body(kk, frac1_8):
        idxs = [kk, kk + qa, kk + 2 * qa, kk + 3 * qa]
        rs, ss = [], []
        for i in idxs:
            r_col, s_col = fetch(sr1, ss1, i)
            rs.append(row(r_col))
            ss.append(row(s_col))
        for i, (vals, frac_1f) in zip(
            idxs, chain_rows_multi(l1, rs, ss)
        ):
            kf = jnp.float32(i)
            valid_row = (ns1_row > kf).astype(f32)
            write_rows(vals, valid_row, i, 0)
            valid_col = col(ns1_1f) > kf
            tgt = jnp.where(valid_col, i, 128)
            frac1_8 = jnp.where(lane128 == tgt, col(frac_1f), frac1_8)
        return frac1_8

    frac1_8 = jax.lax.fori_loop(
        0, qa, lane1_body, jnp.zeros((F, 128), f32)
    )

    # ---- pass-2 fit chains (twin pre-kill per merge_fits; ADJACENT
    # groups of four so homogeneous batches skip whole trips) ----
    if two:
        if dup_skip:
            valid1v = (ss1 >= float(min_px)) & (frac1_8 >= min_cont)

        def gate2(kk_idx):
            r_col, s_col = fetch(sr2, ss2, kk_idx)
            valid_col = col(ns2_1f) > jnp.float32(kk_idx)
            if dup_skip:
                twin_col = jnp.any(
                    (sr1 == r_col) & (ss1 == s_col) & valid1v,
                    axis=1,
                    keepdims=True,
                )
                run_col = valid_col & jnp.logical_not(twin_col)
            else:
                run_col = valid_col
            return r_col, s_col, run_col

        def lane2_body(kk, carry):
            idxs = [4 * kk, 4 * kk + 1, 4 * kk + 2, 4 * kk + 3]
            gs = [gate2(i) for i in idxs]
            run_any = jnp.max(
                jnp.concatenate(
                    [g[2].astype(jnp.int32) for g in gs], axis=1
                )
            )

            @pl.when(run_any > 0)
            def _():
                results = chain_rows_multi(
                    l2,
                    [row(g[0]) for g in gs],
                    [row(g[1]) for g in gs],
                )
                run_rows = bcast_rows(
                    [row(g[2].astype(f32)) for g in gs]
                )
                for i, rr, (vals, _) in zip(idxs, run_rows, results):
                    write_rows(vals, rr, i, kp1)
            return carry

        hb = jnp.right_shift(trips2 + 3, 2)
        jax.lax.fori_loop(0, hb, lane2_body, 0)

    # ---- stats rows (selection results; roots remapped to cropped) ----
    def remap8(v8):
        vi = v8.astype(jnp.int32)
        return ((vi // cp) * wc + vi % cp).astype(f32)

    n1_row = bcast_row(n1_1f)
    sr1c = remap8(sr1)
    for f in range(F):
        out_ref[f, srow] = sr1c[f]
        out_ref[f, srow + 1] = ss1[f]
        # bcast_row already filled every frame lane with n — slice it.
        out_ref[f, srow + 2] = n1_row[0, f * cp : f * cp + 128]
    if two:
        n2_row = bcast_row(n2_1f)
        sr2c = remap8(sr2)
        for f in range(F):
            out_ref[f, srow + 3] = sr2c[f]
            out_ref[f, srow + 4] = ss2[f]
            out_ref[f, srow + 5] = n2_row[0, f * cp : f * cp + 128]

    # ---- inner_coarse: dilated inner footprint (merge_fits' _dilate3
    # of labels2 < sentinel; consumer crops to (hc, wc)) ----
    if two:
        filled2 = (l2 != P).astype(jnp.int32)
        dil = unpack_bits(dil8_b(pack_bits(filled2)))
        for f in range(F):
            ic_ref[f] = dil[:, f * cp : (f + 1) * cp]
    else:
        for f in range(F):
            ic_ref[f] = jnp.zeros((rp, cp), jnp.int32)


def _pack_fits_vmem(rp: int, cp: int, f: int) -> bool:
    """Frame-packing VMEM budget: the seg-scan accept chains and the
    ~12 live int planes scale with the packed width f*cp; keep them
    under the raised 100 MB scoped-vmem limit with headroom."""
    planes = 12 + _chain_levels(rp, cp)
    return rp * (f * cp) * 4 * planes <= 64 * 1024 * 1024


def fused_fit_exact(hc: int, wc: int) -> bool:
    """True when the packed fit tail's bf16 MXU reductions are exact on
    the (hc, wc) grid.

    The tail contracts several integer-valued planes against 0/1
    indicator matrices in bf16 (8 mantissa bits: integers <= 256 exact):
      * lin_hi = lin // 128 with lin < rp*cp  ->  needs rp*cp <= 32768,
      * cm (per-frame lane index < cp)        ->  needs cp == 256
        (wc <= 255; cp is always >= 256 by padding),
      * riota (< rp) and per-row root totals (<= wc) are then subsumed.
    Grids beyond this envelope (portrait 1080p at default coarse, or
    user coarse factors with wc > 255) silently round those integrands
    in bf16, corrupting roots/sizes/quads — route them to the
    label_planes + fused_fit_batch fallback instead (bit-exact there;
    its rank prep splits wide row totals, see fit_pallas._rank_prep).
    """
    rp = max(_round_up(hc, 8), 8)
    cp = max(256, _round_up(wc + 1, 128))
    return wc <= 255 and rp <= 256 and rp * cp <= 128 * 256


def coarse_fits_vmem(hc: int, wc: int) -> bool:
    """True when the (hc, wc) coarse grid fits the kernel's VMEM budget.

    The scan machinery keeps roughly a dozen (rp, cp) int32 planes live
    plus the precomputed seg-scan accept chains (~2 planes per doubling
    level); cap their footprint under the raised 100 MB scoped-vmem
    limit with headroom.  Grids beyond this (8K+ frames at small coarse
    factors) route to the XLA label path (segment.label_planes) instead
    of failing.
    """
    rp = max(_round_up(hc, 8), 8)
    cp = max(256, _round_up(wc + 1, 128))
    # rp <= 512: the bit-packed flood planes hold the grid rows of one
    # column in at most sixteen 32-bit words.
    planes = 12 + _chain_levels(rp, cp)
    return rp <= 512 and rp * cp * 4 * planes <= 48 * 1024 * 1024


@functools.partial(
    jax.jit,
    static_argnames=(
        "bg_rounds", "fill_rounds", "ccl_rounds", "inner_ccl_rounds",
        "inner_depths", "inner_flood_rounds", "inner_fill_rounds",
        "inner", "pre_hw", "fit_cfg", "interpret",
    ),
)
def coarse_labels(
    coarse: jnp.ndarray,  # (B, Hc, Wc) bool, or pre-padded (see pre_hw)
    bg_rounds: int,
    fill_rounds: int,
    ccl_rounds: int,
    inner_ccl_rounds: int = 3,  # keep in sync with QuadParams.inner_ccl_rounds
    inner_depths: int = 2,
    inner_flood_rounds: int = 3,
    inner_fill_rounds: int = 4,
    inner: bool = True,
    pre_hw: tuple[int, int] | None = None,
    fit_cfg: tuple | None = None,
    interpret: bool = False,
):
    """-> (labels1, labels2) (B, Hc, Wc) int32 in Hc*Wc-cropped linear
    index space (sentinel Hc*Wc), exactly as segment.extract_candidates'
    label planes: labels1 = CCL over the hole-filled black mask, labels2 =
    depth-peeled labelling of the non-border-connected black components
    (segment.label_planes pass-2 semantics).

    ``pre_hw=(hc, wc)``: ``coarse`` is already the kernel's PRE-PADDED
    int32 0/1 plane — (B, >=rows, cp) with cell values at [:hc, :wc] and
    zeros elsewhere, (rows, cp) = frontend_pallas.coarse_pad_shape — as
    the fused frontend's ``emit_coarse`` output emits it.  Skips this
    function's zeros+dynamic_update_slice pad (an HBM round trip of the
    plane per batch)."""
    if pre_hw is None:
        b, hc, wc = coarse.shape
    else:
        hc, wc = pre_hw
        b = coarse.shape[0]
    if not coarse_fits_vmem(hc, wc):
        raise ValueError(
            "coarse grid exceeds the VMEM kernel budget; route to "
            "segment.label_planes (detector does this automatically)"
        )
    rp = max(_round_up(hc, 8), 8)
    # >=1 padding column to the right of every frame: lane rolls then can
    # never carry image values across packed-frame boundaries (padding
    # lanes hold 0 / sentinel in every scan state, the identities of the
    # or- and min-propagations).
    cp = max(256, _round_up(wc + 1, 128))
    sent = rp * cp
    if pre_hw is not None and (
        coarse.shape[2] != cp or coarse.dtype != jnp.int32
    ):
        raise ValueError(
            f"pre-padded coarse plane must be (B, >=rows, {cp}) int32; "
            f"got {coarse.shape} {coarse.dtype}"
        )

    # The grid is tiny relative to vector width ((108, 192) grids fill
    # two vregs of lanes), so per-op overhead dominates a one-frame-per-
    # step kernel.  Pack F frames side by side along lanes; frame
    # separation falls out of the per-frame wrap masks (cm = lane % cp)
    # plus the padding-column invariant above.
    # The BIT-PACKED flood domain made this pay: flood planes are
    # (8, cp) = 2 vregs, so the ~4 ms of flood work per 1080p batch-128
    # was pure op-issue overhead; packing 8 frames per grid step issues
    # 1/8th the flood ops (measured 5.6 -> 2.8 ms for the stage).  The
    # earlier packing no-go (13.2 ms fori+pack4 vs 11.1 unrolled f=1)
    # predates bit-packing, when every flood op was already 28 vregs.
    # Frame counts that don't divide B fall back to smaller packs; the
    # int-domain CCL planes are vreg-bound either way (cost-neutral).
    f_pack = 1
    if not interpret:
        for cand_f in (8, 4, 2):
            if b % cand_f == 0 and _pack_fits_vmem(rp, cp, cand_f):
                f_pack = cand_f
                break
    bp = _round_up(b, f_pack)
    w_all = f_pack * cp

    if pre_hw is not None:
        src = coarse
        rows_blk = min(rp, coarse.shape[1])
    else:
        src = jnp.zeros((bp, rp, cp), jnp.int32)
        src = jax.lax.dynamic_update_slice(
            src, coarse.astype(jnp.int32), (0, 0, 0)
        )
        rows_blk = rp

    def kernel(src_ref, wpack_ref, usel_ref, inimg_ref, border_ref,
               l1_ref, l2_ref):
        if f_pack > 1:
            black = jnp.concatenate(
                [src_ref[f] for f in range(f_pack)], axis=1
            )
        else:
            black = src_ref[0]  # (rows_blk, w_all) int32 0/1
        if rows_blk < rp:
            # Pre-padded planes may carry fewer rows than rp (they are
            # always >= hc, so the missing rows are pure padding).
            black = jnp.concatenate(
                [black, jnp.zeros((rp - rows_blk, w_all), jnp.int32)],
                axis=0,
            )
        riota = jax.lax.broadcasted_iota(jnp.int32, (rp, w_all), 0)
        ciota = jax.lax.broadcasted_iota(jnp.int32, (rp, w_all), 1)
        cm = jnp.remainder(ciota, jnp.int32(cp))  # per-frame lane index

        def roll(a, s):
            return pltpu.roll(a, s % w_all, axis=1)

        def shift_rows(a, s, fill):
            # out[i] = a[i - s] for s > 0 (down), a[i + |s|] for s < 0.
            f = jnp.full((abs(s), w_all), fill, jnp.int32)
            if s > 0:
                return jnp.concatenate([f, a[: rp - s]], axis=0)
            return jnp.concatenate([a[-s:], f], axis=0)

        # Segmented min-scans (Kogge-Stone doubling).  The boundary
        # tracking depends only on the MASK, never on the evolving label
        # values: the step-s forward update accepts lane i-s's value iff
        # lanes (i-s, i] are all in-mask (the classic bf/bb boundary-OR
        # planes compute exactly this window test).  So the per-level
        # accept masks are PRECOMPUTED once per label_ccl call and
        # reused across every CCL round and both scan directions —
        # bit-exact vs the inline-boundary form (the accepted source
        # lane i-s itself may be out-of-mask in both forms; it then
        # holds s_val and the min is a no-op), at ~3 VPU ops per
        # doubling level instead of ~8.
        def make_lane_chain(m):
            # 0/1 masks: AND instead of * (int32 vector multiplies are
            # emulated on the VPU; bitwise ops are native).
            wf, wb = [], []
            cf = m
            cb = m
            shift = 1
            while shift < cp:
                # Chains are stored as BOOLEANS so every scan round's
                # select skips the == compare (chains are built once and
                # reused across all rounds of a label_ccl call).
                wf.append(cf != 0)
                wb.append(cb != 0)
                nf = jnp.where(cm < shift, 0, roll(cf, shift))
                cf = cf & nf
                nb = jnp.where(cm >= cp - shift, 0, roll(cb, -shift))
                cb = cb & nb
                shift *= 2
            return wf, wb

        def make_row_chain(m):
            wf, wb = [], []
            cf = m
            cb = m
            shift = 1
            while shift < rp:
                wf.append(cf != 0)
                wb.append(cb != 0)
                cf = cf & shift_rows(cf, shift, 0)
                cb = cb & shift_rows(cb, -shift, 0)
                shift *= 2
            return wf, wb

        def seg_min_lanes(l, mb, chain, s_val):
            # ``mb`` and the chain levels are booleans (hoisted compares).
            wf, wb = chain
            lf = jnp.where(mb, l, s_val)
            lb = lf
            shift = 1
            k = 0
            while shift < cp:
                lf = jnp.minimum(
                    lf, jnp.where(wf[k], roll(lf, shift), s_val)
                )
                lb = jnp.minimum(
                    lb, jnp.where(wb[k], roll(lb, -shift), s_val)
                )
                shift *= 2
                k += 1
            return jnp.where(mb, jnp.minimum(lf, lb), s_val)

        def seg_min_rows(l, mb, chain, s_val):
            wf, wb = chain
            lf = jnp.where(mb, l, s_val)
            lb = lf
            shift = 1
            k = 0
            while shift < rp:
                lf = jnp.minimum(
                    lf,
                    jnp.where(
                        wf[k], shift_rows(lf, shift, s_val), s_val
                    ),
                )
                lb = jnp.minimum(
                    lb,
                    jnp.where(
                        wb[k], shift_rows(lb, -shift, s_val), s_val
                    ),
                )
                shift *= 2
                k += 1
            return jnp.where(mb, jnp.minimum(lf, lb), s_val)

        # ------- bit-packed mask domain (floods/dilations) -------
        # Masks pack 32 grid ROWS per int32 word (word index in
        # sublanes, grid columns in lanes): every flood transport and
        # run-fill partial is a bitwise op on an (8, cp) plane — 1/32
        # the rows of the int domain.  Pack/unpack ride the MXU (same
        # selector machinery as the fused frontend).  Labels stay int
        # (CCL below is unchanged).
        def pack_bits(plane_int):
            pb = plane_int.astype(jnp.float32).astype(jnp.bfloat16)
            pw = jax.lax.dot_general(
                wpack_ref[...], pb, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (2*nwp, cp): first nwp rows low 16 bits, rest high
            return pw[:nwp].astype(jnp.int32) | (
                pw[nwp:].astype(jnp.int32) << 16
            )

        def unpack_bits(wp):
            sb = (
                _unpack_bits_halving(wp)
                .astype(jnp.float32)
                .astype(jnp.bfloat16)
            )  # (256, cp) 0/1
            return jax.lax.dot_general(
                usel_ref[...], sb, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(jnp.int32)  # (rp, cp)

        inb = inimg_ref[...]  # (nwp, cp) in-image bit masks
        borb = border_ref[...]

        lane_i = jnp.remainder(
            jax.lax.broadcasted_iota(jnp.int32, (nwp, w_all), 1),
            jnp.int32(cp),
        )  # per-frame lane index (frames pack side by side)
        mfw = {}
        mbw = {}
        _s = 1
        while _s < cp:
            # Run-fill shifts must not wrap across the lane axis (the
            # int-domain seg scans mask wraps the same way); the masks
            # are per-frame, so a roll that crosses a packed-frame
            # boundary is killed exactly like an image-edge wrap.
            mfw[_s] = jnp.where(lane_i >= _s, -1, 0)
            mbw[_s] = jnp.where(lane_i < cp - _s, -1, 0)
            _s *= 2

        def lane_fwd(x, sh):
            return pltpu.roll(x, sh % w_all, axis=1) & mfw[sh]

        def lane_bwd(x, sh):
            return pltpu.roll(x, (-sh) % w_all, axis=1) & mbw[sh]

        row_lim = 1
        while row_lim < rp:
            row_lim *= 2

        # The Kogge-Stone propagation masks depend only on the medium
        # mask M, never on the evolving fill front, so each flood call
        # computes its doubling chains ONCE and reuses them across every
        # round (bit-exact refactor of the inline pm updates).
        def make_fill_chain(M):
            chain = []
            for sh, lim in (
                (lane_fwd, cp),
                (lane_bwd, cp),
                (_bit_fwd, row_lim),
                (_bit_bwd, row_lim),
            ):
                pms = []
                pm = M
                step = 1
                while step < lim:
                    pms.append(pm)
                    pm = pm & sh(pm, step)
                    step *= 2
                chain.append(pms)
            return chain

        def fill_lanes_b(F, M, chain):
            # Complete run-fill of F through M along grid columns:
            # Kogge-Stone doubling with a propagation mask, forward then
            # backward (runs are intervals, so the two passes compose).
            F = F & M
            for sh, pms in ((lane_fwd, chain[0]), (lane_bwd, chain[1])):
                step = 1
                for pm in pms:
                    F = F | (sh(F, step) & pm)
                    step *= 2
            return F

        def fill_rows_b(F, M, chain):
            F = F & M
            for sh, pms in ((_bit_fwd, chain[2]), (_bit_bwd, chain[3])):
                step = 1
                for pm in pms:
                    F = F | (sh(F, step) & pm)
                    step *= 2
            return F

        def n8_b(x):
            # 8-neighbour OR excluding centre; lane rolls wrap exactly
            # like the int domain's (wraps land in the padding columns,
            # which every frame keeps at its right edge — so packed-
            # frame crossings carry zeros, same as image-edge wraps).
            h = x | pltpu.roll(x, 1, axis=1) | pltpu.roll(
                x, w_all - 1, axis=1
            )
            side = pltpu.roll(x, 1, axis=1) | pltpu.roll(
                x, w_all - 1, axis=1
            )
            return _bit_fwd(h, 1) | _bit_bwd(h, 1) | side

        def n4_b(x):
            side = pltpu.roll(x, 1, axis=1) | pltpu.roll(
                x, w_all - 1, axis=1
            )
            return _bit_fwd(x, 1) | _bit_bwd(x, 1) | side

        def dil8_b(x):
            return x | n8_b(x)

        def rounds_loop(body, init, rounds):
            # On the TPU the rounds are FULLY Python-unrolled: a
            # fori_loop measured ~30-60% slower per round, and the old
            # convergence-skip (lax.cond per round past round 2) is a
            # net LOSS now that the mask-chain hoisting made rounds
            # cheap — a Mosaic cond copies its whole carry through both
            # branches (~2-5 us for an int label plane), more than the
            # ~0.4 us a converged bit-domain round costs.  Interpret
            # mode (CPU tests) lowers through the XLA CPU backend, where
            # ~45 unrolled rounds x ~300 ops overflow the compiler
            # (segfault) — use fori_loop there; semantics are identical.
            if interpret:
                return jax.lax.fori_loop(
                    0, rounds, lambda _, c: body(c), init
                )
            x = init
            for _ in range(rounds):
                x = body(x)
            return x

        def flood_b(M, seed, rounds, diag=True):
            # One round == the int-domain flood body: one 8-/4-neighbour
            # transport, then COMPLETE run-fills along lanes, then rows
            # (the segmented min-scans' reach, in bitwise form).
            n = n8_b if diag else n4_b
            chain = make_fill_chain(M)

            def body(R):
                r1 = (R | n(R)) & M
                return fill_rows_b(fill_lanes_b(r1, M, chain), M, chain)

            return rounds_loop(body, seed & M, rounds)

        def label_ccl(mask, rounds):
            # 4-connected (black components; see segment.label_components).
            # Per-frame-local linear indices (riota*cp + cm): identical in
            # every packed frame, exactly segment.label_components' space.
            idx = riota * cp + cm
            lbl = jnp.where(mask == 1, idx, sent)
            lane_chain = make_lane_chain(mask)
            row_chain = make_row_chain(mask)

            def neighbor_min(l):
                # Horizontal neighbours are deliberately ABSENT: the
                # lane seg-min that follows takes the min over each
                # cell's whole lane RUN, which contains every in-mask
                # lane neighbour (off-mask neighbours hold the sentinel
                # — every round leaves off-mask cells at s_val — so
                # they were no-ops in the old 8-neighbour form).
                # Bit-exact with the previous min(l, l±1lane, l±1row).
                up = shift_rows(l, 1, sent)
                dn = shift_rows(l, -1, sent)
                m = jnp.minimum(jnp.minimum(l, up), dn)
                return jnp.where(mask == 1, m, sent)

            def body(l):
                l = neighbor_min(l)
                l = seg_min_lanes(l, mask, lane_chain, jnp.int32(sent))
                return seg_min_rows(l, mask, row_chain, jnp.int32(sent))

            return rounds_loop(body, lbl, rounds)

        # ---- pass 1: plain hole fill + CCL over ALL black --------------
        # (border-connected black stays in: clipped markers keep their
        # open ring; dark scenes yield one merged blob and pass 2 below
        # recovers the markers — segment.extract_candidates semantics.)
        m1b = pack_bits(black) & inb
        notm1b = ~m1b  # == (1-m1)*in + (1-in): padding counts as medium
        wrb = flood_b(notm1b, borb, fill_rounds)
        filled1b = (m1b | (~wrb & notm1b)) & inb
        filled1 = unpack_bits(filled1b)
        l1 = label_ccl(filled1, ccl_rounds)
        if fit_cfg is None:
            for f in range(f_pack):
                l1_ref[f] = l1[:, f * cp : (f + 1) * cp]

        # ---- pass 2: depth-peeled inner labelling ----------------------
        # (segment.label_planes semantics: peel nesting levels off the
        # known-outside white; each level's components are labelled on
        # their hole-FILLED plane — O(1) convergence at any ring size or
        # rotation — then labels restrict back to the level cells.)
        if inner:
            bgb = flood_b(m1b, borb, bg_rounds, diag=False)
            m2b = m1b & ~bgb
            whiteb = ~m1b & inb

            knownb = flood_b(
                whiteb, (borb | dil8_b(bgb)) & whiteb, fill_rounds
            )
            l2 = jnp.full((rp, w_all), sent, jnp.int32)
            remaining = m2b

            def peel(carry):
                l2, rem, kn = carry
                levelb = flood_b(
                    rem, rem & dil8_b(kn), inner_flood_rounds, diag=False
                )
                notlevb = ~levelb & inb
                reach_ob = flood_b(notlevb, kn, inner_fill_rounds)
                filledb = ~reach_ob & inb
                lab = label_ccl(unpack_bits(filledb), inner_ccl_rounds)
                l2 = jnp.where(unpack_bits(levelb) == 1, lab, l2)
                rem = rem & ~levelb
                kn = flood_b(
                    whiteb,
                    kn | (whiteb & dil8_b(levelb)),
                    inner_flood_rounds,
                )
                return l2, rem, kn

            # DEPTH 0 reuses the pass-1 labels (segment.label_planes
            # mirrors this): a level-0 component's hole-filled plane is
            # its pass-1 filled blob, and segmented label propagation
            # depends only on the component's own cell set, so depth-0
            # labels equal l1 restricted to the level cells (same
            # roots) — skipping depth 0's enclosure flood + whole
            # label_ccl.  Gated per blob: a component inside a filled
            # hole of a BORDER-CONNECTED blob merged with it in pass 1
            # (root on the bg band, outside the level cells), so reuse
            # applies only to level cells filled-blob-connected
            # (4-conn) to a properly-rooted root; the rest stay in
            # ``remaining`` and the next peel depth labels them
            # exactly (see segment.label_planes).
            level0b = flood_b(
                remaining, remaining & dil8_b(knownb),
                inner_flood_rounds, diag=False,
            )
            # Bit-domain ok-flood: the seed (level-0 pass-1 roots) ANDs
            # in packed form, and ccl_rounds suffices — flooding a
            # filled blob from its root converges like the CCL on the
            # same plane, and under-convergence only defers (exact).
            rootsb = pack_bits((l1 == riota * cp + cm).astype(jnp.int32))
            okb = level0b & flood_b(
                filled1b, level0b & rootsb, ccl_rounds, diag=False,
            )
            l2 = jnp.where(unpack_bits(okb) == 1, l1, l2)
            remaining = remaining & ~okb
            knownb = flood_b(
                whiteb,
                knownb | (whiteb & dil8_b(level0b)),
                inner_flood_rounds,
            )
            carry = (l2, remaining, knownb)
            for depth in range(1, inner_depths):
                if depth <= 1:
                    # Depth 1 is nonempty whenever any marker is
                    # present (a marker's interior code bits are black
                    # components enclosed by white that only becomes
                    # known-outside after the depth-0 peel) — a runtime
                    # gate would be pure overhead (the Mosaic cond
                    # copies the ~130 KB carry even when it skips).
                    carry = peel(carry)
                else:
                    # Depth >= 2 exists only for nested markers; skip
                    # its ~11 scan rounds at runtime when the peel is
                    # already exhausted.  An empty `remaining` makes
                    # peel() a no-op, so the skip is exact.
                    carry = jax.lax.cond(
                        jnp.any(carry[1] != 0), peel, lambda c: c, carry
                    )
            l2 = carry[0]
            if fit_cfg is None:
                for f in range(f_pack):
                    l2_ref[f] = l2[:, f * cp : (f + 1) * cp]
        else:
            l2 = None
            if fit_cfg is None:
                for f in range(f_pack):
                    l2_ref[f] = jnp.full((rp, cp), sent, jnp.int32)

        if fit_cfg is not None:
            # Fused fit stage: consume the label planes in VMEM (they
            # never reach HBM); l1_ref carries the fit output rows,
            # l2_ref the dilated inner footprint for merge_fits.
            k1f, k2f, ds_fit, min_pxf, slackf, min_contf, dup_skipf = (
                fit_cfg
            )
            _packed_fit_tail(
                l1,
                l2 if (inner and k2f > 0) else None,
                l1_ref,
                l2_ref,
                F=f_pack,
                rp=rp,
                cp=cp,
                hc=hc,
                wc=wc,
                w_all=w_all,
                ds=ds_fit,
                k1=k1f,
                k2=k2f,
                min_px=min_pxf,
                slack=slackf,
                min_cont=min_contf,
                dup_skip=dup_skipf,
                riota=riota,
                cm=cm,
                pack_bits=pack_bits,
                unpack_bits=unpack_bits,
                dil8_b=dil8_b,
                interpret=interpret,
            )

    # Constants for the bit-packed flood domain: the row-packing MXU
    # weights + halving-unpack selector (same scheme as the fused
    # frontend), and the in-image / border seeds as packed bit masks.
    nw = -(-rp // 32)
    nwp = 8 if nw <= 8 else 16  # padded word rows of the bit planes
    assert nw <= 16 and b % f_pack == 0
    wpack = np.zeros((2 * nwp, rp), np.float32)
    for i in range(nw):
        for j in range(16):
            if 32 * i + j < rp:
                wpack[i, 32 * i + j] = float(1 << j)
            if 32 * i + 16 + j < rp:
                wpack[nwp + i, 32 * i + 16 + j] = float(1 << j)
    bitpos = {wb: k for k, wb in enumerate(_unpack_row_order(nwp))}
    usel = np.zeros((rp, 32 * nwp), np.float32)
    for t in range(rp):
        usel[t, bitpos[(t // 32, t % 32)]] = 1.0
    inb = np.zeros((nwp, cp), np.int64)
    for r in range(hc):
        inb[r // 32, :wc] |= 1 << (r % 32)
    borb = np.zeros((nwp, cp), np.int64)
    for r in (0, hc - 1):
        borb[r // 32, :wc] |= 1 << (r % 32)
    for c in (0, wc - 1):
        for r in range(rp):  # mirrors the int domain's riota extent
            borb[r // 32, c] |= 1 << (r % 32)
    # Packed frames tile the per-frame seed masks along lanes.
    inb = np.tile(inb, (1, f_pack))
    borb = np.tile(borb, (1, f_pack))

    def as_i32(a):
        return jnp.asarray(a.astype(np.uint64).astype(np.uint32).view(np.int32))

    spec = pl.BlockSpec(
        (f_pack, rp, cp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    if fit_cfg is not None:
        _k1, _k2, *_rest = fit_cfg
        _two = inner and _k2 > 0
        _kp1 = _round_up(_k1, 8)
        _kp2 = _round_up(_k2, 8) if _two else 0
        _nstat = 6 if _two else 3
        rp_out = _round_up(_kp1 + _kp2 + _nstat + 1, 8)
        o1_spec = pl.BlockSpec(
            (f_pack, rp_out, 128),
            lambda i: (i, 0, 0),
            memory_space=pltpu.VMEM,
        )
        o1_shape = jax.ShapeDtypeStruct((bp, rp_out, 128), jnp.float32)
    else:
        o1_spec = spec
        o1_shape = jax.ShapeDtypeStruct((bp, rp, cp), jnp.int32)
    in_spec = pl.BlockSpec(
        (f_pack, rows_blk, cp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )

    def const_spec(shape):
        return pl.BlockSpec(
            shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
        )

    # Large grids exceed Mosaic's default 16 MB scoped-vmem budget with
    # the unrolled scan rounds; raise the limit for them (v5e VMEM is
    # large enough) and keep the default for the common sizes.  Scoped
    # usage is driven by the ROW count (deeper row-fill/seg-scan
    # doubling chains), not the plane bytes: a 272x256 grid needs ~21 MB
    # while 112x512 fits the default.
    params = (
        dict(
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            )
        )
        if (f_pack > 1 or rp > 128 or rp * cp * 4 * 12 > 4 * 1024 * 1024)
        else {}
    )
    l1p, l2p = pl.pallas_call(
        kernel,
        grid=(bp // f_pack,),
        in_specs=[
            in_spec,
            const_spec((2 * nwp, rp)),
            const_spec((rp, 32 * nwp)),
            const_spec((nwp, f_pack * cp)),
            const_spec((nwp, f_pack * cp)),
        ],
        out_specs=[o1_spec, spec],
        out_shape=[
            o1_shape,
            jax.ShapeDtypeStruct((bp, rp, cp), jnp.int32),
        ],
        interpret=interpret,
        **params,
    )(
        src,
        jnp.asarray(wpack, jnp.bfloat16),
        jnp.asarray(usel, jnp.bfloat16),
        as_i32(inb),
        as_i32(borb),
    )
    l1p = l1p[:b]
    l2p = l2p[:b]

    if fit_cfg is not None:
        # (fit output rows, dilated inner footprint) — roots already
        # remapped to cropped linear indices in-kernel.
        return l1p, l2p[:, :hc, :wc] != 0

    # Remap padded linear indices (row*cp + col) to cropped (row*wc + col);
    # cp is a compile-time constant so the div/mod strength-reduce.
    def remap(l):
        l = l[:, :hc, :wc]
        row = l // cp
        col = l % cp
        return jnp.where(l >= sent, hc * wc, row * wc + col)

    return remap(l1p), remap(l2p)
