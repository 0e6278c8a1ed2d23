"""Pallas corner-refinement kernel: per-corner window gather + argmax.

The XLA refinement (segment.refine_corners) extracts K*4 dynamic windows
per frame from the packed grey/ink plane; vmapped dynamic_slice lowers to
row gathers whose per-row latency dominates the stage (~20 ms of the
1080p batch-64 profile).  This kernel instead DMAs each window from HBM
explicitly — G windows per grid step, double-buffered across steps so the
copies hide behind compute — and reduces each window to its refined
corner entirely in VMEM.  Only 3 scalars per window return to HBM.

Numerics match segment.refine_corners exactly: same local-mean ink test,
same clamp box, same first-maximum (row-major) tie-break.
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


_G = 8  # windows per grid step (DMA pipeline width)


@functools.partial(
    jax.jit, static_argnames=("wn", "clamp_r", "ds", "interpret")
)
def refine_eval(
    packed: jnp.ndarray,  # (B, Hp, Wp) int16/int32, aligned rows/lanes
    inner_plane: jnp.ndarray,  # (B, Hcp, Wcp) int32 coarse inner footprint
    bidx: jnp.ndarray,  # (N,) int32 frame index per window
    tly: jnp.ndarray,  # (N,) int32 window top (in-bounds for wn)
    tlx: jnp.ndarray,  # (N,) int32 window left
    dirs: jnp.ndarray,  # (N, 2) float32 outward corner direction
    corners: jnp.ndarray,  # (N, 2) float32 coarse corner (x, y)
    inner: jnp.ndarray,  # (N,) bool — restrict ink to the inner footprint
    valid: jnp.ndarray,  # (N,) bool — invalid windows skip their DMA
    wn: int,
    clamp_r: int,
    ds: int,
    interpret: bool = False,
):
    """Refined corners for N windows.

    Returns (x (N,), y (N,), has (N,) bool); outputs of invalid windows
    are garbage — mask with ``valid`` downstream.  ``packed`` must be
    padded so [align8(tly), +SH) x [align128(tlx), +SW) stays in bounds,
    with pad pixels carrying zero mask bits.

    Inner-lane windows additionally AND their ink with the coarse inner
    footprint, upsampled in-kernel from the per-frame ``inner_plane``
    block via separable one-hot matmuls — merging a full-resolution bit
    plane in XLA costs a ~10 ms read-modify-write of the packed plane.
    N must be arranged so each group of _G windows shares one frame.
    """
    n = tly.shape[0]
    npad = _round_up(max(n, _G), _G)
    # Row alignment follows the plane dtype: int16 tiles are (16, 128),
    # int32 tiles (8, 128).
    align = 16 if packed.dtype == jnp.int16 else 8
    sh = _round_up(wn + align - 1, align)
    sw = _round_up(wn + 127, 128)
    hcp, wcp = inner_plane.shape[1], inner_plane.shape[2]

    by = (tly // align) * align
    bx = (tlx // 128) * 128

    def padi(a):
        return jnp.zeros((npad,), jnp.int32).at[:n].set(a.astype(jnp.int32))

    bidx_p = padi(bidx)
    by_p = padi(by)
    bx_p = padi(bx)
    valid_p = padi(valid)

    params = jnp.zeros((npad, 128), jnp.float32)
    params = params.at[:n, 0].set(dirs[:, 0])
    params = params.at[:n, 1].set(dirs[:, 1])
    params = params.at[:n, 2].set(corners[:, 0])
    params = params.at[:n, 3].set(corners[:, 1])
    params = params.at[:n, 4].set(inner.astype(jnp.float32))
    params = params.at[:n, 5].set(tly.astype(jnp.float32))
    params = params.at[:n, 6].set(tlx.astype(jnp.float32))

    grid = (npad // _G,)

    def kernel(
        bidx_ref, by_ref, bx_ref, valid_ref, params_ref, inner_ref,
        packed_ref, out_ref, scratch, sems,
    ):
        i = pl.program_id(0)
        nsteps = pl.num_programs(0)

        def dma(step, slot, g):
            widx = step * _G + g
            return pltpu.make_async_copy(
                packed_ref.at[
                    bidx_ref[widx],
                    pl.ds(pl.multiple_of(by_ref[widx], align), sh),
                    pl.ds(pl.multiple_of(bx_ref[widx], 128), sw),
                ],
                scratch.at[slot, g],
                sems.at[slot, g],
            )

        def start_group(step, slot):
            # Invalid lanes skip their DMA — the issue overhead, not the
            # bytes, dominates this kernel, and most candidate lanes are
            # invalid in typical frames.
            for g in range(_G):

                @pl.when(valid_ref[step * _G + g] != 0)
                def _():
                    dma(step, slot, g).start()

        slot = i % 2

        @pl.when(i == 0)
        def _():
            start_group(0, 0)

        @pl.when(i + 1 < nsteps)
        def _():
            start_group(i + 1, 1 - slot)

        rows_i = jax.lax.broadcasted_iota(jnp.int32, (sh, sw), 0)
        cols_i = jax.lax.broadcasted_iota(jnp.int32, (sh, sw), 1)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        inv_area = 1.0 / float(wn * wn)
        inner_bf = inner_ref[0].astype(jnp.bfloat16)  # (hcp, wcp)

        for g in range(_G):
            # Invalid windows skip compute as well as their DMA (their out
            # rows are garbage, masked downstream): the per-window
            # upsample contractions and reductions dominate this kernel
            # and most candidate lanes are invalid in typical frames.
            @pl.when(valid_ref[i * _G + g] != 0)
            def _():
                dma(i, slot, g).wait()

                win = scratch[slot, g].astype(jnp.int32)  # (sh, sw)
                widx = i * _G + g
                p = params_ref[g]
                dirx, diry = p[0], p[1]
                cx, cy = p[2], p[3]
                is_inner = p[4] > 0.5
                ty = p[5].astype(jnp.int32)
                tx = p[6].astype(jnp.int32)
                byv = by_ref[widx]
                bxv = bx_ref[widx]
                rows = rows_i + byv
                cols = cols_i + bxv
                sel = (
                    (rows >= ty)
                    & (rows < ty + wn)
                    & (cols >= tx)
                    & (cols < tx + wn)
                )
                near8 = (win >> 8) & 1
                # Inner lanes: upsample the coarse footprint over this
                # window with two one-hot contractions (row-, col-cells).
                rr = byv + jax.lax.broadcasted_iota(jnp.int32, (sh, 1), 0)
                cellr = rr // ds
                rsel = (
                    cellr
                    == jax.lax.broadcasted_iota(jnp.int32, (1, hcp), 1)
                ).astype(jnp.bfloat16)  # (sh, hcp)
                cc = bxv + jax.lax.broadcasted_iota(jnp.int32, (1, sw), 1)
                cellc = cc // ds  # (1, sw)
                csel = (
                    jax.lax.broadcasted_iota(jnp.int32, (wcp, sw), 0)
                    == cellc
                ).astype(jnp.bfloat16)  # (wcp, sw)
                a = jnp.dot(
                    rsel, inner_bf, preferred_element_type=jnp.float32
                )  # (sh, wcp)
                up = jnp.dot(
                    a.astype(jnp.bfloat16), csel,
                    preferred_element_type=jnp.float32,
                )  # (sh, sw)
                up9 = (up > 0.5).astype(jnp.int32)
                near = jnp.where(is_inner, near8 & up9, near8) == 1
                g8 = (win & 255).astype(jnp.float32)
                mean = jnp.sum(jnp.where(sel, g8, 0.0)) * inv_area
                ink = (g8 < mean) & near
                rf = rows.astype(jnp.float32)
                cf = cols.astype(jnp.float32)
                near_c = (jnp.abs(cf - cx) <= clamp_r) & (
                    jnp.abs(rf - cy) <= clamp_r
                )
                ok = ink & near_c & sel
                score = jnp.where(ok, cf * dirx + rf * diry, -jnp.inf)
                m = jnp.max(score)
                has = m > -jnp.inf
                # First maximum in window row-major order == min linear
                # index among maxima (matches jnp.argmax in the XLA path).
                lin = rows_i * sw + cols_i
                cand = jnp.where(score == m, lin, jnp.int32(sh * sw))
                li = jnp.min(cand)
                bestx = (bxv + li % sw).astype(jnp.float32)
                besty = (byv + li // sw).astype(jnp.float32)
                row = jnp.where(
                    lane == 0,
                    bestx,
                    jnp.where(
                        lane == 1,
                        besty,
                        jnp.where(
                            lane == 2, has.astype(jnp.float32), 0.0
                        ),
                    ),
                )
                out_ref[g] = row[0]

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (_G, 128),
                    lambda i, *_refs: (i, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, hcp, wcp),
                    lambda i, bidx_ref, *_refs: (bidx_ref[i * _G], 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(
                (_G, 128), lambda i, *_refs: (i, 0), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[
                pltpu.VMEM((2, _G, sh, sw), packed.dtype),
                pltpu.SemaphoreType.DMA((2, _G)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((npad, 128), jnp.float32),
        interpret=interpret,
    )(bidx_p, by_p, bx_p, valid_p, params, inner_plane, packed)

    return out[:n, 0], out[:n, 1], out[:n, 2] > 0.5


def refine_corners_batch(
    packed: jnp.ndarray,  # (B, >=H, >=W) int32 (pre-padded planes ok)
    quads: jnp.ndarray,  # (B, K, 4, 2) float32
    centroids: jnp.ndarray,  # (B, K, 2)
    is_inner: jnp.ndarray,  # (B, K) bool
    ds: int,
    wn: int,
    inner_coarse: jnp.ndarray | None = None,  # (B, Hc, Wc) bool footprint
    image_hw: tuple[int, int] | None = None,
    valid: jnp.ndarray | None = None,  # (B, K) bool lane validity
    interpret: bool = False,
) -> jnp.ndarray:
    """Batched drop-in for segment.refine_corners over a frame batch.

    ``packed`` may be larger than the image (e.g. the fused frontend's
    padded plane); pass ``image_hw`` in that case.  Padding must carry
    zero mask bits.  If the plane is too small for the aligned window
    DMAs it is re-padded here.
    """
    b = packed.shape[0]
    h, w = image_hw or packed.shape[1:]
    k = quads.shape[1]
    clamp_r = ds + 2
    align = 16 if packed.dtype == jnp.int16 else 8
    sh = _round_up(wn + align - 1, align)
    sw = _round_up(wn + 127, 128)
    # Aligned window DMAs reach at most [align(h-wn)+sh, align128(w-wn)+sw).
    need_h = (max(h - wn, 0) // align) * align + sh
    need_w = (max(w - wn, 0) // 128) * 128 + sw
    if packed.shape[1] >= need_h and packed.shape[2] >= need_w:
        pad = packed
    else:
        hp = max(_round_up(packed.shape[1], align), need_h)
        wp = max(_round_up(packed.shape[2], 128), need_w)
        pad = jnp.zeros((b, hp, wp), packed.dtype)
        pad = jax.lax.dynamic_update_slice(pad, packed, (0, 0, 0))

    dirs = quads - centroids[:, :, None, :]
    dirs = dirs / (jnp.linalg.norm(dirs, axis=-1, keepdims=True) + 1e-6)
    tlx = jnp.clip(
        jnp.round(quads[..., 0]).astype(jnp.int32) - wn // 2, 0, max(w - wn, 0)
    )
    tly = jnp.clip(
        jnp.round(quads[..., 1]).astype(jnp.int32) - wn // 2, 0, max(h - wn, 0)
    )
    if valid is None:
        valid = jnp.ones((b, k), dtype=bool)
    if inner_coarse is None:
        hc = -(-h // ds)
        wc = -(-w // ds)
        inner_coarse = jnp.zeros((b, hc, wc), dtype=bool)
    hcp = _round_up(inner_coarse.shape[1], 8)
    wcp = _round_up(inner_coarse.shape[2], 128)
    iplane = jnp.zeros((b, hcp, wcp), jnp.int32)
    iplane = jax.lax.dynamic_update_slice(
        iplane, inner_coarse.astype(jnp.int32), (0, 0, 0)
    )
    valid4 = jnp.broadcast_to(valid[:, :, None], (b, k, 4))

    # Each _G-window DMA group must stay within one frame (the kernel's
    # inner-plane block is chosen per group), so pad each frame's window
    # list to a multiple of _G with invalid (DMA-skipped) lanes.  Handles
    # any max_candidates, odd ones included.
    k4 = k * 4
    k4p = _round_up(k4, _G)
    extra = k4p - k4

    def frame_pad(a, fill=0):
        a = a.reshape((b, k4) + a.shape[1:])
        if extra:
            pad_width = [(0, 0), (0, extra)] + [(0, 0)] * (a.ndim - 2)
            a = jnp.pad(a, pad_width, constant_values=fill)
        return a.reshape((b * k4p,) + a.shape[2:])

    bidx = jnp.repeat(jnp.arange(b, dtype=jnp.int32), k4p)
    x, y, has = refine_eval(
        pad,
        iplane,
        bidx,
        frame_pad(tly.reshape(b * k4)),
        frame_pad(tlx.reshape(b * k4)),
        frame_pad(dirs.reshape(b * k4, 2)),
        frame_pad(quads.reshape(b * k4, 2)),
        frame_pad(
            jnp.broadcast_to(is_inner[:, :, None], (b, k, 4)).reshape(b * k4)
        ),
        frame_pad(valid4.reshape(b * k4)),
        wn,
        clamp_r,
        ds,
        interpret=interpret,
    )
    x = x.reshape(b, k4p)[:, :k4]
    y = y.reshape(b, k4p)[:, :k4]
    has = has.reshape(b, k4p)[:, :k4]
    refined = jnp.stack([x, y], axis=-1).reshape(b, k, 4, 2)
    hasr = has.reshape(b, k, 4) & valid4  # invalid lanes carry garbage
    return jnp.where(hasr[..., None], refined, quads)
