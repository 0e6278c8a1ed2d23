"""Pallas warp kernel: per-candidate window DMA + bilinear eval on MXU.

The XLA warp (rectify.warp_patches_mxu) extracts one 64x64 window per
candidate with vmapped dynamic_slice (row gathers — the dominant cost)
and materializes (B, K, S^2, 64) bf16 weight tensors in HBM.  This kernel
DMAs each candidate's window, builds the separable bilinear weights in
VMEM, and runs the two contractions on the MXU — windows and weights
never touch HBM; only the (S^2,) sample vector per candidate does.

Three window sources (selected per window by ``srcsel``):
  * 1: pyramid LEVEL 0 windows come straight from the frontend's padded
    u8 grey canvas (ops.frontend_pallas emit_grey_canvas) — the bf16
    canvas therefore never carries a full-resolution level;
  * 2: LEVEL 1 windows come straight from the frontend's emitted bf16
    level-1 plane (emit_level1) when its padding admits the aligned
    DMAs — the canvas then starts at level 2 and canvas assembly never
    touches a full- or half-resolution plane;
  * 0: remaining levels come from the packed bf16 pyramid canvas
    (rectify.build_packed_pyramid).
Level-1 window bases may be clamped to keep the 256-lane buffer in
bounds, so the 64-lane window can start at offset 0, 64 OR 128 in the
buffer (``half`` in {0, 1, 2}).

Window geometry: the bf16 DMA reads an (80, 256)-aligned block (64-row
window + <=15-row alignment); the u8 DMA reads (72, 256) (<=7-row
alignment: u8 rows align to 8).  The true 64-lane window starts at a
64-multiple inside the 256-lane block (selected by a static half-shift);
row alignment offsets are folded into the sample coordinates host-side.
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


_G = 8  # windows per grid step
_SH = 80  # bf16 buffer rows: 64-row window + <=15 alignment + pad to 16
_SHU = 72  # u8 buffer rows: 64-row window + <=7 alignment (8-aligned)
_SW = 256  # buffer lanes: 128-lane span + <=64 alignment + pad to 128


@functools.partial(jax.jit, static_argnames=("interpret", "decode_n"))
def warp_gather_eval(
    canvas: jnp.ndarray,  # (B, Hc, Wc) bfloat16, Hc % 16 == 0, Wc % 128 == 0
    src: jnp.ndarray,  # (B, Hs, Ws) level-0 source: uint8 padded grey OR
    #                    the int16 packed refinement plane (grey = bits
    #                    0-7, already zero outside the image)
    l1: jnp.ndarray,  # (B, H1, W1) bfloat16 level-1 plane (source 2)
    bidx: jnp.ndarray,  # (N,) int32 frame index
    by: jnp.ndarray,  # (N,) int32 row base (bf16: %16; src: %8)
    bx: jnp.ndarray,  # (N,) int32 lane base (multiple of 128)
    half: jnp.ndarray,  # (N,) int32 in {0,1,2}: window starts at bx+64*half
    srcsel: jnp.ndarray,  # (N,) int32: 0 = canvas, 1 = src (u8), 2 = l1
    valid: jnp.ndarray,  # (N,) bool — invalid windows skip their DMA
    ux: jnp.ndarray,  # (N, S2) f32 sample x relative to the 128-lane window
    uy: jnp.ndarray,  # (N, S2) f32 sample y relative to row base
    w1: jnp.ndarray | None = None,  # (S2P, R1) f32 flattened row-resize
    w2: jnp.ndarray | None = None,  # (R1, 128) f32 flattened col-resize
    interpret: bool = False,
    decode_n: int = 0,  # in-image sample count for the fused decode
) -> jnp.ndarray:
    """Bilinear samples (N, S2): sum_xy wx[s,x] wy[s,y] window[y,x].

    Invalid windows return garbage — mask downstream.

    With ``decode_n`` > 0 (and w1/w2 given), a fused DECODE epilogue
    additionally returns a per-window binary cell grid (N, 128): Otsu
    threshold over the first ``decode_n`` samples (imageproc otsu_level
    semantics, integer-exact 256-bin histogram via a nibble-one-hot MXU
    contraction), 0/255 binarization, flattened two-stage Triangle
    resize (the host-built w1/w2 operators, rectify._decode_resize_ops)
    and the >127 cell rule — grid lane yo*m+xo = cell (yo, xo), matching
    rectify.decode_patches up to f32 summation-order rounding in the
    resize.  The (N, S2) samples are still emitted (debug surface /
    Detection.homographies); the decode's XLA round trips over them are
    what this kills.  Reference: /root/reference/src/aruco.rs:263-293.
    """
    n, s2 = ux.shape
    s2p = _round_up(s2, 128)
    npad = _round_up(max(n, _G), _G)
    src_i16 = src.dtype == jnp.int16
    al0 = 16 if src_i16 else 8  # source-0 row alignment follows dtype
    shu = _SH if src_i16 else _SHU
    decode = decode_n > 0
    if decode:
        assert w1 is not None and w2 is not None
        assert w1.shape[0] == s2p and w1.shape[1] == w2.shape[0]
        assert w2.shape[1] == 128

    def padi(a):
        return jnp.zeros((npad,), jnp.int32).at[:n].set(a.astype(jnp.int32))

    bidx_p, by_p, bx_p = padi(bidx), padi(by), padi(bx)
    half_p = padi(half)
    srcsel_p = padi(srcsel)
    valid_p = padi(valid)
    # Per-step any-valid flags: valid lanes are a size-sorted prefix of
    # each frame's K lanes (merge_fits top-k), so most steps hold only
    # invalid windows — those skip the whole step body (weights iotas,
    # per-window scalar reads, branches), not just per-window work.
    step_any = jnp.max(
        valid_p.reshape(npad // _G, _G), axis=1
    ).astype(jnp.int32)
    uxp = jnp.full((npad, s2p), -1e6, jnp.float32).at[:n, :s2].set(ux)
    uyp = jnp.full((npad, s2p), -1e6, jnp.float32).at[:n, :s2].set(uy)

    grid = (npad // _G,)

    def kernel(*refs):
        (
            bidx_ref, by_ref, bx_ref, half_ref, srcsel_ref, valid_ref,
            step_any_ref, ux_ref, uy_ref, canvas_ref, src_ref, l1_ref,
        ) = refs[:12]
        if decode:
            w1_ref, w2_ref, out_ref, grid_ref = refs[12:16]
            scratch_bf, scratch_u8, sems_bf, sems_u8 = refs[16:]
        else:
            out_ref = refs[12]
            scratch_bf, scratch_u8, sems_bf, sems_u8 = refs[13:]
        i = pl.program_id(0)
        nsteps = pl.num_programs(0)

        def dma_bf(step, slot, g):
            widx = step * _G + g
            return pltpu.make_async_copy(
                canvas_ref.at[
                    bidx_ref[widx],
                    pl.ds(pl.multiple_of(by_ref[widx], 16), _SH),
                    pl.ds(pl.multiple_of(bx_ref[widx], 128), _SW),
                ],
                scratch_bf.at[slot, g],
                sems_bf.at[slot, g],
            )

        def dma_l1(step, slot, g):
            widx = step * _G + g
            return pltpu.make_async_copy(
                l1_ref.at[
                    bidx_ref[widx],
                    pl.ds(pl.multiple_of(by_ref[widx], 16), _SH),
                    pl.ds(pl.multiple_of(bx_ref[widx], 128), _SW),
                ],
                scratch_bf.at[slot, g],
                sems_bf.at[slot, g],
            )

        def dma_u8(step, slot, g):
            widx = step * _G + g
            return pltpu.make_async_copy(
                src_ref.at[
                    bidx_ref[widx],
                    pl.ds(pl.multiple_of(by_ref[widx], al0), shu),
                    pl.ds(pl.multiple_of(bx_ref[widx], 128), _SW),
                ],
                scratch_u8.at[slot, g],
                sems_u8.at[slot, g],
            )

        def start_group(step, slot):
            # Invalid lanes skip their DMA: issue overhead dominates and
            # most candidate lanes are invalid in typical frames.
            for g in range(_G):
                is_valid = valid_ref[step * _G + g] != 0
                ssel = srcsel_ref[step * _G + g]

                @pl.when(is_valid & (ssel == 1))
                def _():
                    dma_u8(step, slot, g).start()

                @pl.when(is_valid & (ssel == 2))
                def _():
                    dma_l1(step, slot, g).start()

                @pl.when(is_valid & (ssel == 0))
                def _():
                    dma_bf(step, slot, g).start()

        slot = i % 2

        @pl.when((i == 0) & (step_any_ref[0] != 0))
        def _():
            start_group(0, 0)

        # Clamp the lookahead index: the predicate short-circuits the
        # last step, but the scalar read itself must stay in bounds.
        nxt = jnp.minimum(i + 1, nsteps - 1)

        @pl.when((i + 1 < nsteps) & (step_any_ref[nxt] != 0))
        def _():
            start_group(i + 1, 1 - slot)

        @pl.when(step_any_ref[i] != 0)
        def _step_body():
            # Transposed formulation: every tensor keeps S2 (128-multiple)
            # in the lane dimension — (s2p, 80)-shaped lanes would force
            # ragged relayouts.
            ic = jax.lax.broadcasted_iota(jnp.int32, (128, 1), 0).astype(
                jnp.float32
            )
            ir = jax.lax.broadcasted_iota(jnp.int32, (_SH, 1), 0).astype(
                jnp.float32
            )

            for g in range(_G):
                # Invalid windows skip compute too (their out rows are
                # garbage, masked downstream).
                is_valid = valid_ref[i * _G + g] != 0
                ssel = srcsel_ref[i * _G + g]
                is_l0 = ssel == 1

                @pl.when(is_valid)
                def _():
                    @pl.when(is_l0)
                    def _():
                        dma_u8(i, slot, g).wait()

                    @pl.when(jnp.logical_not(is_l0))
                    def _():
                        dma_bf(i, slot, g).wait()

                    widx = i * _G + g
                    bufb = scratch_bf[slot, g]  # (_SH, _SW) bf16
                    bufu = scratch_u8[slot, g]  # (_SHU, _SW) u8
                    winb = jnp.where(
                        half_ref[widx] == 0,
                        bufb[:, :128],
                        jnp.where(
                            half_ref[widx] == 1,
                            bufb[:, 64:192],
                            bufb[:, 128:256],
                        ),
                    )  # (_SH, 128)
                    # source-0 window -> bf16 via i32/f32 (Mosaic has no
                    # direct sub-32-bit casts); grey values <= 255 are
                    # exact in bf16.  int16 packed-plane sources carry
                    # grey in bits 0-7 (bit 8 = the refine near flag) —
                    # mask it off.
                    winu = jnp.where(
                        half_ref[widx] == 0,
                        bufu[:, :128],
                        jnp.where(
                            half_ref[widx] == 1,
                            bufu[:, 64:192],
                            bufu[:, 128:256],
                        ),
                    ).astype(jnp.int32)
                    if src_i16:
                        winu = winu & 255
                    winu = winu.astype(jnp.float32)
                    if shu < _SH:
                        # Pad 72 -> 80 rows with zeros (uy alignment
                        # slack for u8 is <= 7, so rows beyond 71 carry
                        # zero weight).
                        winu = jnp.concatenate(
                            [
                                winu,
                                jnp.zeros((_SH - shu, 128), jnp.float32),
                            ],
                            axis=0,
                        )
                    winu = winu.astype(jnp.bfloat16)
                    win = jnp.where(is_l0, winu, winb)
                    # wxT[x, s] = weight of window column x for sample s.
                    wxt = jnp.maximum(
                        0.0, 1.0 - jnp.abs(ux_ref[g][None, :] - ic)
                    ).astype(jnp.bfloat16)  # (128, s2p)
                    t = jnp.dot(
                        win, wxt, preferred_element_type=jnp.float32
                    )  # (_SH, s2p)
                    wy = jnp.maximum(
                        0.0, 1.0 - jnp.abs(uy_ref[g][None, :] - ir)
                    )
                    out_ref[g] = jnp.sum(wy * t, axis=0)

            if decode:
                # ---- fused decode epilogue (all G windows' samples are
                # in the VMEM out block) ----
                sm = out_ref[...]  # (G, s2p) f32
                # Padding lanes get value 256: outside every hi-nibble,
                # so they vanish from the histogram without an i1
                # broadcast AND (whose (1,s2p)x(16,s2p) relayout Mosaic
                # rejects).
                pad = (
                    jax.lax.broadcasted_iota(jnp.int32, (_G, s2p), 1)
                    >= decode_n
                )
                vals = jnp.where(
                    pad,
                    256,
                    jnp.clip(jnp.round(sm), 0.0, 255.0).astype(
                        jnp.int32
                    ),
                )
                nib16 = jax.lax.broadcasted_iota(
                    jnp.int32, (16, s2p), 0
                )
                sub16 = jax.lax.broadcasted_iota(
                    jnp.int32, (16, 16), 0
                )
                lane16 = jax.lax.broadcasted_iota(
                    jnp.int32, (16, 16), 1
                )
                bins = (16 * sub16 + lane16).astype(jnp.float32)
                # Cumsum triangles: the flattened-256-bin prefix runs as
                # tiny matmuls (inclusive lane prefix, exclusive sublane
                # prefix of row totals) — free of the 16-lane rolls /
                # (s, 1) sublane-shift concats Mosaic can't lower.
                # EXACTNESS: Mosaic's f32 matmul decomposes into bf16
                # passes that ROUND >8-bit integer operands (measured:
                # Otsu levels corrupted on real TPU while interpret mode
                # passed), so every operand is explicitly split into
                # <128 chunks (bf16-exact) against 0/1 bf16 triangles
                # with f32 accumulation — integer-exact by construction.
                t_inc = (sub16 <= lane16).astype(jnp.float32).astype(
                    jnp.bfloat16
                )
                # Block-diagonal strict-lower triangle: one matvec
                # computes all five chunks' exclusive row prefixes.
                sub80 = jax.lax.broadcasted_iota(jnp.int32, (80, 80), 0)
                lane80 = jax.lax.broadcasted_iota(
                    jnp.int32, (80, 80), 1
                )
                tri_blk = (
                    (lane80 < sub80) & (lane80 // 16 == sub80 // 16)
                ).astype(jnp.float32).astype(jnp.bfloat16)

                def flatcums(w_in, m_in):
                    """Exact flattened-256-bin inclusive cumsums of the
                    count histogram (< 2^12) and the value histogram
                    (< 2^20), via <128 chunks (bf16-exact) against 0/1
                    bf16 triangles with f32 accumulation: the five
                    chunks ride ONE stacked (80, 16) lane-prefix matmul
                    and one block-diagonal hi/lo row-prefix matvec."""
                    w_hi = jnp.floor(w_in * (1.0 / 128.0))
                    w_lo = w_in - w_hi * 128.0
                    t_ = jnp.floor(m_in * (1.0 / 128.0))
                    c0 = m_in - t_ * 128.0
                    c2 = jnp.floor(t_ * (1.0 / 128.0))
                    c1 = t_ - c2 * 128.0
                    x = jnp.concatenate(
                        [w_lo, w_hi, c0, c1, c2], axis=0
                    )  # (80, 16) all ints < 128
                    r = jax.lax.dot_general(
                        x.astype(jnp.bfloat16), t_inc,
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )  # stacked inclusive lane prefixes
                    rt = r[:, 15:16]  # (80, 1) row totals (< 2^11)
                    rt_hi = jnp.floor(rt * (1.0 / 128.0))
                    rt_lo = rt - rt_hi * 128.0

                    def mv(c):
                        return jax.lax.dot_general(
                            tri_blk, c.astype(jnp.bfloat16),
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )

                    cum = r + 128.0 * mv(rt_hi) + mv(rt_lo)
                    w_ = cum[0:16] + 128.0 * cum[16:32]
                    m_ = (
                        cum[32:48]
                        + 128.0 * cum[48:64]
                        + 16384.0 * cum[64:80]
                    )
                    return w_, m_
                nf = jnp.float32(decode_n)
                subg = jax.lax.broadcasted_iota(jnp.int32, (_G, 1), 0)
                level_col = jnp.zeros((_G, 1), jnp.float32)
                for g in range(_G):
                    vg = vals[g : g + 1]  # (1, s2p)
                    # 256-bin histogram = <hi one-hot, lo one-hot>
                    # contracted over samples (0/1 entries: bf16-exact;
                    # counts <= decode_n accumulate exactly in f32).
                    # i1 -> f32 -> bf16 cast chain: a direct i1-cond
                    # where to bf16 forces an (8,128)->(16,128)-tile i1
                    # relayout Mosaic can't do.
                    oh_hi = (
                        ((vg >> 4) == nib16)
                        .astype(jnp.float32)
                        .astype(jnp.bfloat16)
                    )
                    oh_lo = (
                        ((vg & 15) == nib16)
                        .astype(jnp.float32)
                        .astype(jnp.bfloat16)
                    )
                    hist = jax.lax.dot_general(
                        oh_hi, oh_lo, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )  # (16, 16): hist[h, l] = #pixels valued 16h+l
                    w_, m_ = flatcums(hist, hist * bins)
                    # Total value sum as a 0-d reduce (a (1,1) slice of
                    # m_ would need an offset scalar->2D broadcast,
                    # unsupported in Mosaic); exact: integer < 2^24.
                    mt = jnp.sum(hist * bins)
                    # Between-class variance, unnormalized: sigma(t) =
                    # (MT*W - M*n)^2 / (n^2 * W * (n-W)) — argmax equals
                    # imageproc otsu_level's; plateau ties (W, M
                    # unchanged across empty bins) compare exactly
                    # equal, lowest level wins (min flattened index).
                    den = w_ * (nf - w_)
                    num = mt * w_ - m_ * nf
                    f = jnp.where(den > 0.0, num * num / den, -1.0)
                    fmax = jnp.max(f)
                    level = jnp.min(jnp.where(f == fmax, bins, 256.0))
                    level_col = jnp.where(subg == g, level, level_col)
                # Binarize (0/255, strict >), then the flattened
                # two-stage Triangle resize for all G windows in two
                # matmuls, then the >127 white-cell rule
                # (reference aruco.rs:273-283).
                binar = jnp.where(sm > level_col, 255.0, 0.0)

                def dotf(a, bb):
                    return jax.lax.dot_general(
                        a, bb, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )

                def split_bf(x):
                    h_ = x.astype(jnp.bfloat16)
                    return h_, (x - h_.astype(jnp.float32)).astype(
                        jnp.bfloat16
                    )

                # Controlled-precision resize (don't trust Mosaic's f32
                # matmul default — see the Otsu note above): stage 1 is
                # bf16-EXACT on the {0, 255} binar side, two passes
                # cover 16 weight mantissa bits; stage 2 splits both
                # sides (4 passes, ~f32-faithful like XLA HIGHEST).
                b_bf = binar.astype(jnp.bfloat16)
                w1h, w1l = split_bf(w1_ref[...])
                t1 = dotf(b_bf, w1h) + dotf(b_bf, w1l)  # (G, R1)
                t1h, t1l = split_bf(t1)
                w2h, w2l = split_bf(w2_ref[...])
                red = (
                    (dotf(t1h, w2h) + dotf(t1h, w2l))
                    + (dotf(t1l, w2h) + dotf(t1l, w2l))
                )  # (G, 128)
                # Lane 127 carries the window's Otsu level (m*m <= 121
                # cell lanes never reach it): near-ties on flat noise
                # histograms can resolve differently than the XLA
                # otsu_level under compiler fusion (FMA) — emitting the
                # level lets checks verify functional equivalence given
                # the picked level (cf. the fit kernel's tie-equivalent
                # corner semantics).
                lane_g = jax.lax.broadcasted_iota(
                    jnp.int32, (_G, 128), 1
                )
                grid_ref[...] = jnp.where(
                    lane_g == 127,
                    level_col,
                    (red > 127.0).astype(jnp.float32),
                )

    in_specs = [
        pl.BlockSpec(
            (_G, s2p),
            lambda i, *_refs: (i, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (_G, s2p),
            lambda i, *_refs: (i, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    out_specs = pl.BlockSpec(
        (_G, s2p), lambda i, *_refs: (i, 0), memory_space=pltpu.VMEM
    )
    out_shape = jax.ShapeDtypeStruct((npad, s2p), jnp.float32)
    operands = [
        bidx_p, by_p, bx_p, half_p, srcsel_p, valid_p, step_any, uxp, uyp,
        canvas, src, l1,
    ]
    if decode:
        r1 = w1.shape[1]
        in_specs = in_specs + [
            pl.BlockSpec(
                (s2p, r1), lambda i, *_refs: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (r1, 128), lambda i, *_refs: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ]
        out_specs = [
            out_specs,
            pl.BlockSpec(
                (_G, 128), lambda i, *_refs: (i, 0),
                memory_space=pltpu.VMEM,
            ),
        ]
        out_shape = [
            out_shape,
            jax.ShapeDtypeStruct((npad, 128), jnp.float32),
        ]
        operands = operands + [
            w1.astype(jnp.float32), w2.astype(jnp.float32)
        ]

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=7,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=[
                pltpu.VMEM((2, _G, _SH, _SW), jnp.bfloat16),
                pltpu.VMEM((2, _G, shu, _SW), src.dtype),
                pltpu.SemaphoreType.DMA((2, _G)),
                pltpu.SemaphoreType.DMA((2, _G)),
            ],
        ),
        out_shape=out_shape,
        interpret=interpret,
    )(*operands)

    if decode:
        samples, grids = out
        return samples[:n, :s2], grids[:n]
    return out[:n, :s2]
