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


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def coarse_fits_vmem(hc: int, wc: int) -> bool:
    """True when the (hc, wc) coarse grid fits the kernel's VMEM budget.

    The scan machinery keeps roughly a dozen (rp, cp) int32 planes live;
    cap their footprint well under the ~16 MB of VMEM.  Grids beyond this
    (8K+ frames at small coarse factors) route to the XLA label path
    (segment.label_planes) instead of failing.
    """
    rp = max(_round_up(hc, 8), 8)
    cp = max(256, _round_up(wc + 1, 128))
    return rp * cp * 4 * 12 <= 12 * 1024 * 1024


@functools.partial(
    jax.jit,
    static_argnames=(
        "bg_rounds", "fill_rounds", "ccl_rounds", "inner_ccl_rounds",
        "inner_depths", "inner_flood_rounds", "inner_fill_rounds",
        "inner", "interpret",
    ),
)
def coarse_labels(
    coarse: jnp.ndarray,  # (B, Hc, Wc) bool
    bg_rounds: int,
    fill_rounds: int,
    ccl_rounds: int,
    inner_ccl_rounds: int = 4,
    inner_depths: int = 2,
    inner_flood_rounds: int = 3,
    inner_fill_rounds: int = 4,
    inner: bool = True,
    interpret: bool = False,
):
    """-> (labels1, labels2) (B, Hc, Wc) int32 in Hc*Wc-cropped linear
    index space (sentinel Hc*Wc), exactly as segment.extract_candidates'
    label planes: labels1 = CCL over the hole-filled black mask, labels2 =
    depth-peeled labelling of the non-border-connected black components
    (segment.label_planes pass-2 semantics)."""
    b, hc, wc = coarse.shape
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

    # The grid is tiny relative to vector width ((108, 192) grids fill
    # two vregs of lanes), so per-op overhead dominates a one-frame-per-
    # step kernel.  Pack F frames side by side along lanes; frame
    # separation falls out of the per-frame wrap masks (cm = lane % cp)
    # plus the padding-column invariant above.
    # Measured on v5e: packing >1 frame only pays under fori_loop round
    # bodies, which are themselves slower than unrolled rounds (13.2 ms
    # fori+pack4 vs 11.1 ms unrolled f=1 per 1080p batch 128), and the
    # unrolled body at packed width blows Mosaic's 16 MB scoped-vmem
    # stack (no slot reuse across unrolled rounds).  Keep one frame per
    # step; the machinery below stays frame-count-generic.
    f_pack = 1
    bp = _round_up(b, f_pack)
    w_all = f_pack * cp

    src = jnp.zeros((bp, rp, cp), jnp.int32)
    src = jax.lax.dynamic_update_slice(
        src, coarse.astype(jnp.int32), (0, 0, 0)
    )

    def kernel(src_ref, l1_ref, l2_ref):
        if f_pack > 1:
            black = jnp.concatenate(
                [src_ref[f] for f in range(f_pack)], axis=1
            )
        else:
            black = src_ref[0]  # (rp, w_all) int32 0/1
        riota = jax.lax.broadcasted_iota(jnp.int32, (rp, w_all), 0)
        ciota = jax.lax.broadcasted_iota(jnp.int32, (rp, w_all), 1)
        cm = jnp.remainder(ciota, jnp.int32(cp))  # per-frame lane index
        in_img = jnp.where(
            (riota < hc) & (cm < wc), jnp.int32(1), jnp.int32(0)
        )

        def roll(a, s):
            return pltpu.roll(a, s % w_all, axis=1)

        def shift_rows(a, s, fill):
            # out[i] = a[i - s] for s > 0 (down), a[i + |s|] for s < 0.
            f = jnp.full((abs(s), w_all), fill, jnp.int32)
            if s > 0:
                return jnp.concatenate([f, a[: rp - s]], axis=0)
            return jnp.concatenate([a[-s:], f], axis=0)

        def seg_min_lanes(l, m, s_val):
            lf = jnp.where(m == 1, l, s_val)
            lb = lf
            bf = 1 - m
            bb = bf
            shift = 1
            while shift < cp:
                # Wrap masks are per-frame (cm): lanes near a frame's
                # left/right edge must not receive the neighbouring
                # packed frame's (or the array wrap's) values.
                sl = roll(lf, shift)
                sb = roll(bf, shift)
                wrap = cm < shift
                sl = jnp.where(wrap, s_val, sl)
                sb = jnp.maximum(sb, wrap.astype(jnp.int32))
                lf = jnp.where(bf == 1, lf, jnp.minimum(lf, sl))
                bf = jnp.maximum(bf, sb)

                sl = roll(lb, -shift)
                sb = roll(bb, -shift)
                wrap = cm >= cp - shift
                sl = jnp.where(wrap, s_val, sl)
                sb = jnp.maximum(sb, wrap.astype(jnp.int32))
                lb = jnp.where(bb == 1, lb, jnp.minimum(lb, sl))
                bb = jnp.maximum(bb, sb)
                shift *= 2
            return jnp.where(m == 1, jnp.minimum(lf, lb), s_val)

        def seg_min_rows(l, m, s_val):
            lf = jnp.where(m == 1, l, s_val)
            lb = lf
            bf = 1 - m
            bb = bf
            shift = 1
            while shift < rp:
                sl = shift_rows(lf, shift, s_val)
                sb = shift_rows(bf, shift, 1)
                lf = jnp.where(bf == 1, lf, jnp.minimum(lf, sl))
                bf = jnp.maximum(bf, sb)

                sl = shift_rows(lb, -shift, s_val)
                sb = shift_rows(bb, -shift, 1)
                lb = jnp.where(bb == 1, lb, jnp.minimum(lb, sl))
                bb = jnp.maximum(bb, sb)
                shift *= 2
            return jnp.where(m == 1, jnp.minimum(lf, lb), s_val)

        def neigh8_or(x):
            # 8-neighbour OR *excluding* centre (flood transport step).
            h = jnp.maximum(jnp.maximum(roll(x, 1), x), roll(x, -1))
            up = shift_rows(h, 1, 0)
            dn = shift_rows(h, -1, 0)
            side = jnp.maximum(roll(x, 1), roll(x, -1))
            return jnp.maximum(jnp.maximum(up, dn), side)

        def neigh4_or(x):
            side = jnp.maximum(roll(x, 1), roll(x, -1))
            up = shift_rows(x, 1, 0)
            dn = shift_rows(x, -1, 0)
            return jnp.maximum(jnp.maximum(up, dn), side)

        def rounds_loop(body, init, rounds):
            # On the TPU the rounds are Python-unrolled: a fori_loop
            # measured ~30-60% slower per round (loop overhead is not
            # amortized by packing more frames per step — measured 13.2
            # vs 11.1 ms/batch-128 even at 4 packed frames).  Interpret
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

        def flood(medium, seed, rounds, diag=True):
            norm = neigh8_or if diag else neigh4_or

            def body(reach):
                r = jnp.maximum(reach, norm(reach))
                r = jnp.minimum(r, medium)
                v = jnp.where(r == 1, 0, 1)
                v = seg_min_lanes(v, medium, jnp.int32(2))
                r = jnp.minimum(medium, jnp.where(v == 0, 1, 0))
                v = jnp.where(r == 1, 0, 1)
                v = seg_min_rows(v, medium, jnp.int32(2))
                return jnp.minimum(medium, jnp.where(v == 0, 1, 0))

            return rounds_loop(body, jnp.minimum(medium, seed), rounds)

        border = jnp.where(
            (riota == 0)
            | (riota == hc - 1)
            | (cm == 0)
            | (cm == wc - 1),
            jnp.int32(1),
            jnp.int32(0),
        )

        def label_ccl(mask, rounds):
            # 4-connected (black components; see segment.label_components).
            # Per-frame-local linear indices (riota*cp + cm): identical in
            # every packed frame, exactly segment.label_components' space.
            idx = riota * cp + cm
            lbl = jnp.where(mask == 1, idx, sent)

            def neighbor_min(l):
                h = jnp.minimum(
                    jnp.minimum(roll(l, 1), l), roll(l, -1)
                )
                h = jnp.where(cm == 0, jnp.minimum(l, roll(l, -1)), h)
                h = jnp.where(
                    cm == cp - 1, jnp.minimum(l, roll(l, 1)), h
                )
                up = shift_rows(l, 1, sent)
                dn = shift_rows(l, -1, sent)
                m = jnp.minimum(jnp.minimum(h, up), dn)
                return jnp.where(mask == 1, m, sent)

            def body(l):
                l = neighbor_min(l)
                l = seg_min_lanes(l, mask, jnp.int32(sent))
                return seg_min_rows(l, mask, jnp.int32(sent))

            return rounds_loop(body, lbl, rounds)

        # ---- pass 1: plain hole fill + CCL over ALL black --------------
        # (border-connected black stays in: clipped markers keep their
        # open ring; dark scenes yield one merged blob and pass 2 below
        # recovers the markers — segment.extract_candidates semantics.)
        m1 = jnp.minimum(black, in_img)
        not_m1 = (1 - m1) * in_img + (1 - in_img)  # pad counts as medium
        white_reach = flood(not_m1, border, fill_rounds)
        filled1 = jnp.minimum(
            jnp.maximum(m1, (1 - white_reach) * not_m1), in_img
        )
        l1 = label_ccl(filled1, ccl_rounds)
        for f in range(f_pack):
            l1_ref[f] = l1[:, f * cp : (f + 1) * cp]

        # ---- pass 2: depth-peeled inner labelling ----------------------
        # (segment.label_planes semantics: peel nesting levels off the
        # known-outside white; each level's components are labelled on
        # their hole-FILLED plane — O(1) convergence at any ring size or
        # rotation — then labels restrict back to the level cells.)
        if inner:
            bg = flood(m1, border, bg_rounds, diag=False)
            m2 = m1 * (1 - bg)
            white = (1 - m1) * in_img

            def dil8(x):
                return jnp.maximum(x, neigh8_or(x))

            known = flood(
                white,
                jnp.minimum(jnp.maximum(border, dil8(bg)), white),
                fill_rounds,
            )
            l2 = jnp.full((rp, w_all), sent, jnp.int32)
            remaining = m2

            def peel(carry):
                l2, remaining, known = carry
                level = flood(
                    remaining,
                    jnp.minimum(remaining, dil8(known)),
                    inner_flood_rounds,
                    diag=False,
                )
                notlev = (1 - level) * in_img
                reach_o = flood(notlev, known, inner_fill_rounds)
                filled = (1 - reach_o) * in_img
                lab = label_ccl(filled, inner_ccl_rounds)
                l2 = jnp.where(level == 1, lab, l2)
                remaining = remaining * (1 - level)
                known = flood(
                    white,
                    jnp.maximum(known, jnp.minimum(white, dil8(level))),
                    inner_flood_rounds,
                )
                return l2, remaining, known

            carry = (l2, remaining, known)
            for depth in range(inner_depths):
                if depth == 0:
                    # Depth 0 is nonempty in any scene with candidates.
                    carry = peel(carry)
                else:
                    # Deeper levels exist only for nested markers; skip
                    # their ~11 scan rounds at runtime when the peel is
                    # already exhausted.  An empty `remaining` makes
                    # peel() a no-op, so the skip is exact.
                    carry = jax.lax.cond(
                        jnp.any(carry[1] == 1), peel, lambda c: c, carry
                    )
            l2 = carry[0]
            for f in range(f_pack):
                l2_ref[f] = l2[:, f * cp : (f + 1) * cp]
        else:
            for f in range(f_pack):
                l2_ref[f] = jnp.full((rp, cp), sent, jnp.int32)

    spec = pl.BlockSpec(
        (f_pack, rp, cp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    l1p, l2p = pl.pallas_call(
        kernel,
        grid=(bp // f_pack,),
        in_specs=[spec],
        out_specs=[spec, spec],
        out_shape=[
            jax.ShapeDtypeStruct((bp, rp, cp), jnp.int32),
            jax.ShapeDtypeStruct((bp, rp, cp), jnp.int32),
        ],
        interpret=interpret,
    )(src)
    l1p = l1p[:b]
    l2p = l2p[:b]

    # Remap padded linear indices (row*cp + col) to cropped (row*wc + col);
    # cp is a compile-time constant so the div/mod strength-reduce.
    def remap(l):
        l = l[:, :hc, :wc]
        row = l // cp
        col = l % cp
        return jnp.where(l >= sent, hc * wc, row * wc + col)

    return remap(l1p), remap(l2p)
