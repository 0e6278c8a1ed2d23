"""Fused Pallas frontend: adaptive threshold + opening + pooling.

One kernel pass over the frame computes, entirely in VMEM:
  1. clamped-box adaptive threshold (exact integer compare, semantics of
     frontend.adaptive_threshold / reference aruco.rs:61),
  2. morphological opening of the black mask (segment.open_mask),
  3. ds x ds black-count pooling via an MXU matmul (segment.pool_black).

The XLA path reads/writes the full frame several times (threshold output,
opened mask, pooled counts); this kernel reads the u8 frame once and writes
the opened black mask (u8) plus the tiny coarse mask — the frontend becomes
HBM-bandwidth-bound on a single pass.

Layout: frames are zero-padded into (B, Hp + 2*HALO, Wp) with the image at
rows [HALO, HALO+H) and cols [PAD_W, PAD_W+W); zero padding makes the
clamped box sums exact (outside-image pixels contribute 0, counts come
from closed-form per-row/col formulas).  The grid walks (frame, row-strip);
each step DMAs its strip + halo from HBM, computes, and writes one (TH, Wp)
black block and one (TH/ds, WCP) coarse block.  The kernel is natively
batched (batch = leading grid dim) because Pallas can't vmap a manually
DMA'd ANY-space operand.
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


@functools.partial(
    jax.jit,
    static_argnames=("window", "open_radius", "ds", "interpret"),
)
def fused_threshold_open_pool(
    grey: jnp.ndarray,
    window: int = 7,
    open_radius: int = 2,
    ds: int = 10,
    interpret: bool = False,
):
    """(B, H, W) or (H, W) uint8 -> (black (…, H, W) bool,
    coarse (…, Hc, Wc) bool).

    Exact functional match of
      white  = frontend.adaptive_threshold(grey, window)
      black  = segment.open_mask(~white, open_radius)
      coarse = segment.pool_black(black, ds)
    """
    squeeze = grey.ndim == 2
    if squeeze:
        grey = grey[None]
    b, h, w = grey.shape
    halo = window + 2 * open_radius
    # Strip height: 8 coarse rows per strip so the coarse output block's
    # sublane dim is divisible by 8 (TPU tiling constraint); 16 overflows
    # the 16MB VMEM budget at 1080p.
    th = 8 * ds
    hp = _round_up(h, th)
    # Image sits at column 0; all padding on the right (>= 2*halo) so the
    # output slice is lane-aligned (a misaligned u8 slice forces a
    # pathological relayout copy).  Rolls wrap zeros from the right pad.
    wp = _round_up(w + 2 * halo, 128)
    hc = -(-h // ds)
    wc = -(-w // ds)
    wcp = _round_up(wc, 128)
    # DMA row-slices of a u8 array must be 8-aligned in the sublane dim.
    tb = _round_up(th + 2 * halo, 8)

    src = jnp.zeros((b, hp + 2 * halo + 8, wp), dtype=jnp.uint8)
    src = jax.lax.dynamic_update_slice(src, grey, (0, halo, 0))

    grid = (b, hp // th)

    def kernel(src_hbm, black_ref, rowpool_ref, scratch, sem):
        bi = pl.program_id(0)
        i = pl.program_id(1)
        # Double-buffered DMA: wait for this step's strip (started by the
        # previous step), prefetch the next step's strip into the other
        # slot, then compute — hides the HBM DMA latency behind compute.
        n_strips = pl.num_programs(1)
        step = bi * n_strips + i
        slot = step % 2

        def strip_dma(step_idx, slot_idx):
            sbi = step_idx // n_strips
            si = step_idx % n_strips
            return pltpu.make_async_copy(
                src_hbm.at[sbi, pl.ds(si * th, tb)],
                scratch.at[slot_idx],
                sem.at[slot_idx],
            )

        @pl.when(step == 0)
        def _():
            strip_dma(step, slot).start()

        last = pl.num_programs(0) * n_strips - 1

        @pl.when(step < last)
        def _():
            strip_dma(step + 1, 1 - slot).start()

        strip_dma(step, slot).wait()

        g = scratch[slot].astype(jnp.int32)  # (tb, wp)

        def roll(a, shift, axis):
            n = a.shape[axis]
            return pltpu.roll(a, shift % n, axis=axis)

        # --- clamped box sums (zero padding makes plain sums exact) ---
        colsum = g
        for dx in range(1, window + 1):
            colsum = colsum + roll(g, -dx, 1) + roll(g, dx, 1)
        r2 = 2 * open_radius
        nrows = th + 2 * r2
        off = halo - r2 - window  # == 0 by construction
        sums = colsum[off : off + nrows]
        for dy in range(1, 2 * window + 1):
            sums = sums + colsum[off + dy : off + dy + nrows]

        # --- counts (closed form, position-dependent at borders) ---
        row0 = i * th - r2  # absolute image row of sums[0]
        rows_abs = row0 + jax.lax.broadcasted_iota(jnp.int32, (nrows, wp), 0)
        cols_abs = jax.lax.broadcasted_iota(jnp.int32, (nrows, wp), 1)
        crow = (
            jnp.clip(rows_abs + window, 0, h - 1)
            - jnp.clip(rows_abs - window, 0, h - 1)
            + 1
        )
        ccol = (
            jnp.clip(cols_abs + window, 0, w - 1)
            - jnp.clip(cols_abs - window, 0, w - 1)
            + 1
        )
        inside = (
            (rows_abs >= 0) & (rows_abs < h) & (cols_abs >= 0) & (cols_abs < w)
        )

        gmid = g[halo - r2 : halo - r2 + nrows]
        white = gmid * (crow * ccol) >= sums
        inside_i = inside.astype(jnp.int32)
        # Masks as int32 0/1 (Mosaic can't rotate sub-32-bit vectors).
        black = jnp.maximum(1 - white.astype(jnp.int32), 1 - inside_i)

        # --- opening (erode^r then dilate^r), matching segment.open_mask
        # boundary semantics: erosion sees True outside the image, the
        # eroded mask is cleared outside the image before dilation.
        # Row shifts are *shrinking static slices* (sublane rolls on int32
        # compile to a pathological Mosaic path: ~20x runtime and minutes
        # of compile); lane shifts are cheap rolls.  Each round consumes
        # one halo row per side; after 2r rounds exactly th rows remain.
        def neigh_shrink(m, op):
            rows = op(op(m[0:-2], m[1:-1]), m[2:])
            return op(op(rows, roll(rows, 1, 1)), roll(rows, -1, 1))

        m = black
        for _ in range(open_radius):
            m = neigh_shrink(m, jnp.minimum)
        if open_radius:
            m = m * inside_i[open_radius:-open_radius]
        for _ in range(open_radius):
            m = neigh_shrink(m, jnp.maximum)
        central = (m * inside_i[r2:-r2]) if r2 else (m * inside_i)  # (th, wp)
        black_ref[0] = central.astype(jnp.uint8)

        # --- row pooling (sublane reshape-sum); column pooling is a tiny
        # XLA op outside the kernel (a resident weight matrix here would be
        # re-fetched every grid step).
        rowpool = central.reshape(th // ds, ds, wp).sum(axis=1)
        rowpool_ref[0] = rowpool.astype(jnp.uint8)

    black_pad, rowpool_pad = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[
            pl.BlockSpec(
                (1, th, wp), lambda bi, i: (bi, i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, th // ds, wp),
                lambda bi, i: (bi, i, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, hp, wp), jnp.uint8),
            jax.ShapeDtypeStruct((b, hp // ds, wp), jnp.uint8),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, tb, wp), jnp.uint8),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(src)

    black = black_pad[:, :h, :w] != 0
    # Column pooling of the per-row counts (tiny, stays in XLA).
    rp = rowpool_pad[:, :hc, : wc * ds].astype(jnp.int32)
    pooled = rp.reshape(b, hc, wc, ds).sum(axis=-1)
    coarse = pooled * 2 >= max(ds, 2)
    if squeeze:
        return black[0], coarse[0]
    return black, coarse
