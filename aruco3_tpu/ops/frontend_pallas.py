"""Fused Pallas frontend: adaptive threshold + opening + pooling (+ the
packed corner-refinement plane).

One kernel pass over the frame computes, entirely in VMEM:
  1. clamped-box adaptive threshold (exact integer compare, semantics of
     frontend.adaptive_threshold / reference aruco.rs:61),
  2. morphological opening of the black mask (segment.open_mask),
  3. ds x ds black-count row pooling (segment.pool_black's row half),
  4. optionally the packed int32 refinement plane grey | dilated-black<<8
     (segment.build_packed_plane bits 0-8) at the padded geometry the
     refinement kernel (ops.refine_pallas) DMAs from — so the full-res
     black mask never round-trips HBM for the batched detector path.

The XLA path reads/writes the full frame several times; this kernel reads
the u8 frame once per tile.  Box sums use sliding-window doubling (a
width-W running sum is assembled from log2(W) shifted partial sums rather
than W-1 shifted adds).

Layout: frames are zero-padded into (B, Hp + 2*HALO + 8, Wp) with the
image at rows [HALO, HALO+H) and cols [HALO_C, HALO_C+W).  Zero padding
makes the clamped box sums exact (outside-image pixels contribute 0,
counts come from closed-form per-row/col formulas).  The grid walks
(frame, row-strip, col-tile); each step DMAs its tile + halo from HBM and
writes one (TH, TW) black block, one (TH/ds, TW) row-pool block and
optionally one (TH, TW) packed block.  Column tiling keeps the VMEM
working set bounded for arbitrary frame widths (4K+).  The kernel is
natively batched (batch = leading grid dim) because Pallas can't vmap a
manually DMA'd ANY-space operand.
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


def coarse_pad_shape(hc: int, wc: int) -> tuple[int, int]:
    """Padded (rows, lanes) of the coarse-label kernel's input plane
    (ops.coarse_pallas): rows rounded to 8 sublanes, >=1 zero padding
    column then rounded to 128 lanes (min 256).  Shared here so the
    frontend's ``emit_coarse`` output matches the label kernel's
    expected geometry without a circular import."""
    rp = max(_round_up(hc, 8), 8)
    cp = max(256, _round_up(wc + 1, 128))
    return rp, cp


def split_strip_rows(ds: int) -> int | None:
    """Strip height for the SPLIT-plane emit mode (``emit_split``).

    The split mode's near-mask words pack 32 image rows per int32 word,
    so words must never straddle strips: the strip height must be a
    multiple of 32 (and of ds, and of 8*ds so the coarse row-pool block
    keeps an 8-multiple sublane dim).  Prefer the tallest option <= 192
    rows (halo amortization vs VMEM), else the smallest <= 224; None
    when no option exists (odd ds >= 9 — the detector then falls back
    to the int16 packed-plane mode).
    """
    opts = [rp * ds for rp in (32, 16, 8) if (rp * ds) % 32 == 0]
    fit = [t for t in opts if t <= 192]
    if fit:
        return max(fit)
    fit = [t for t in opts if t <= 224]
    return min(fit) if fit else None


def _sliding_sum_lanes(x, width: int, roll):
    """Running sum of ``width`` consecutive lanes: out[i] = sum x[i:i+width].

    Doubling: partial sums of power-of-two widths, combined by the binary
    decomposition of ``width`` — O(log W) rolls instead of W-1.
    Lanes rolled in from beyond the array edge must be zero (guaranteed by
    the zero padding).
    """
    sums = {1: x}
    p = 1
    while 2 * p <= width:
        sums[2 * p] = sums[p] + roll(sums[p], -p, 1)
        p *= 2
    out = None
    off = 0
    rem = width
    while rem:
        p = 1 << (rem.bit_length() - 1)
        term = sums[p] if off == 0 else roll(sums[p], -off, 1)
        out = term if out is None else out + term
        off += p
        rem -= p
    return out


def _win_rows_multi(x, widths, op):
    """Sliding min/max windows over rows via shrinking static slices.

    out[w][i] = op over rows x[i : i+w].  Power-of-two partials are built
    once for max(widths) and shared across all requested widths — the
    separable-morphology trick that lets the opened mask (width 2r+1) and
    the near plane (width 2(r+ext)+1) share most of the work.
    """
    wmax = max(widths)
    pows = {1: x}
    p = 1
    while 2 * p <= wmax:
        prev = pows[p]
        pows[2 * p] = op(prev[: prev.shape[0] - p], prev[p:])
        p *= 2
    out = {}
    n = x.shape[0]
    for w in widths:
        nout = n - w + 1
        res = None
        off = 0
        rem = w
        while rem:
            p = 1 << (rem.bit_length() - 1)
            term = pows[p][off : off + nout]
            res = term if res is None else op(res, term)
            off += p
            rem -= p
        out[w] = res
    return out


def _win_lanes_multi(x, widths, op, roll):
    """Sliding min/max windows over lanes, CENTRED: out[w][i] = op over
    lanes x[i-(w-1)//2 : i+(w+1)//2].  Shared power-of-two partials as in
    _win_rows_multi; lanes rolled in across the buffer edge only touch
    output lanes within ~w of the edge, which sit deep inside the halo
    columns and are never read downstream.
    """
    wmax = max(widths)
    pows = {1: x}
    p = 1
    while 2 * p <= wmax:
        pows[2 * p] = op(pows[p], roll(pows[p], -p, 1))
        p *= 2
    out = {}
    for w in widths:
        res = None
        off = 0
        rem = w
        while rem:
            p = 1 << (rem.bit_length() - 1)
            term = pows[p] if off == 0 else roll(pows[p], -off, 1)
            res = term if res is None else op(res, term)
            off += p
            rem -= p
        out[w] = roll(res, (w - 1) // 2, 1)
    return out


def _bits_rsh(wp, d: int):
    """Shift a row-bit-packed plane DOWN d rows: output bit k = input bit
    k + d (k = row index; word i holds rows 32i..32i+31 in bits 0..31).

    Bits shifted in past the last word are zero.  ``d`` in [0, 31].
    """
    if d == 0:
        return wp
    nxt = jnp.concatenate([wp[1:], jnp.zeros_like(wp[:1])], axis=0)
    # >> on int32 is arithmetic; mask the sign-extended high bits before
    # OR-ing in the next word's low bits.
    lo = (wp >> d) & ((1 << (32 - d)) - 1)
    return lo | (nxt << (32 - d))


def _win_bits(wp, widths, op):
    """Sliding AND/OR windows over packed rows: out[w] bit k = op over
    bits k..k+w-1.  Same shared power-of-two doubling as _win_rows_multi,
    but each "plane op" touches 1/32 the rows (bitwise on int32 words).
    """
    pows = {1: wp}
    p = 1
    while 2 * p <= max(widths):
        pows[2 * p] = op(pows[p], _bits_rsh(pows[p], p))
        p *= 2
    out = {}
    for w in widths:
        res = None
        off = 0
        rem = w
        while rem:
            p = 1 << (rem.bit_length() - 1)
            t = pows[p] if off == 0 else _bits_rsh(pows[p], off)
            res = t if res is None else op(res, t)
            off += p
            rem -= p
        out[w] = res
    return out


def _unpack_bits_halving(wp):
    """(NW<=8, L) int32 words -> (256, L) int32 0/1 planes by log-halving:
    each level splits every row's bit-range in two (low half rows first),
    so 5 levels turn 32-bit words into single-bit rows.  ~500 row-ops
    total vs ~3000 for per-bit extraction.  Row order is the halving
    order; _unpack_row_order gives (word, bit) per output row so selector
    matmuls can address it.
    """
    p = wp
    a = p & 0xFFFF
    b = (p >> 16) & 0xFFFF  # mask: >> is arithmetic on int32
    p = jnp.concatenate([a, b], axis=0)
    for half, mask in ((8, 0xFF), (4, 0xF), (2, 0x3), (1, 0x1)):
        a = p & mask
        b = p >> half  # values are non-negative < 2^(2*half)
        p = jnp.concatenate([a, b], axis=0)
    return p


def _unpack_row_order(nwords: int = 8):
    """(word, bit) carried by each of _unpack_bits_halving's 32*nwords
    output rows (the input plane has ``nwords`` word rows)."""
    rows = [(i, 0, 32) for i in range(nwords)]
    for _ in range(5):
        rows = [(w, b, n // 2) for (w, b, n) in rows] + [
            (w, b + n // 2, n // 2) for (w, b, n) in rows
        ]
    return [(w, b) for (w, b, _) in rows]


def _unpack_bits_pairs(wp):
    """(NW<=8, L) int32 words -> (128, L) int32 2-BIT fields (the
    halving unpack stopped one level early): row r holds bits
    {b, b+1} of its word as a value in [0, 3] — see _unpack_pair_order
    for (word, low bit) per row.  Consumers that only need bit COUNTS
    over bit ranges aligned to even offsets (the ds-row pool sums when
    ds and the bit offset are even) get them from
    ``(p & 1) + (p >> 1)`` — skipping the unpack's biggest level and
    halving the selector matmul depth."""
    p = wp
    a = p & 0xFFFF
    b = (p >> 16) & 0xFFFF  # mask: >> is arithmetic on int32
    p = jnp.concatenate([a, b], axis=0)
    for half, mask in ((8, 0xFF), (4, 0xF), (2, 0x3)):
        a = p & mask
        b = p >> half
        p = jnp.concatenate([a, b], axis=0)
    return p


def _unpack_pair_order(nwords: int = 8):
    """(word, low bit) carried by each of _unpack_bits_pairs' 16*nwords
    output rows: row r holds bits {b, b+1} of word w."""
    rows = [(i, 0, 32) for i in range(nwords)]
    for _ in range(4):
        rows = [(w, b, n // 2) for (w, b, n) in rows] + [
            (w, b + n // 2, n // 2) for (w, b, n) in rows
        ]
    return [(w, b) for (w, b, _) in rows]


def _sliding_sum_rows(x, width: int, n_out: int, base: int):
    """Row-direction running sums via static shrinking slices (sublane
    rolls lower pathologically in Mosaic for int32).

    Returns out[(n_out, lanes)] with out[i] = sum x[base+i : base+i+width].
    """
    sums = {1: x}
    p = 1
    while 2 * p <= width:
        prev = sums[p]
        sums[2 * p] = prev[: prev.shape[0] - p] + prev[p:]
        p *= 2
    out = None
    off = 0
    rem = width
    while rem:
        p = 1 << (rem.bit_length() - 1)
        term = sums[p][base + off : base + off + n_out]
        out = term if out is None else out + term
        off += p
        rem -= p
    return out


@functools.partial(
    jax.jit,
    static_argnames=(
        "window", "open_radius", "ds", "interpret", "emit_packed",
        "emit_grey_canvas", "emit_level1", "emit_split", "emit_coarse",
        "emit_split_grey", "min_rows", "_stop_after",
    ),
)
def fused_threshold_open_pool(
    grey: jnp.ndarray,
    window: int = 7,
    open_radius: int = 2,
    ds: int = 10,
    interpret: bool = False,
    emit_packed: bool = False,
    emit_grey_canvas: bool = False,
    emit_level1: bool = False,
    emit_split: bool = False,
    emit_coarse: bool = False,
    emit_split_grey: bool = True,
    min_rows: int | None = None,
    _stop_after: str | None = None,
):
    """(B, H, W) or (H, W) uint8 -> (black (…, H, W) bool,
    coarse (…, Hc, Wc) bool[, packed (…, Hpad, Wpad) int32]).

    Exact functional match of
      white  = frontend.adaptive_threshold(grey, window)
      black  = segment.open_mask(~white, open_radius)
      coarse = segment.pool_black(black, ds)
    plus, when ``emit_packed``, bits 0-8 of segment.build_packed_plane
    (grey | twice-dilated-black << 8) on a zero-padded canvas sized for
    ops.refine_pallas window DMAs (rows multiple of 8 + slack, cols
    multiple of 128 + slack).

    ``emit_split`` (with emit_packed) SPLITS the packed plane into its
    two consumers' native forms instead: a u8 image-masked grey plane
    (same padded geometry — the refine window source AND the warp
    level-0 source) and the near mask BIT-PACKED 32 rows per int32 word
    — word row 8*strip + t//32, bit t%32 = near for image row
    strip*TH + t (TH a multiple of 32, see split_strip_rows; each strip
    owns word rows [8*strip, 8*strip + TH/32), rows above TH/32 in each
    8-row group are zero).  Identical information, ~44%% of the int16
    plane's HBM traffic, and the near mask never gets unpacked to full
    rows at all.  Returns (coarse, grey_plane, near_words[, level1]).

    When ``emit_level1`` (with emit_packed), additionally emits pyramid
    level 1 — the 2x2 box mean of the zero-padded image — as a
    (B, Hp/2, Wp/2) bf16 plane, bit-identical to
    rectify.build_packed_pyramid's level 1 (same bf16 cast points: exact
    f32 row-pair sums, bf16 cast, 0.25-weighted column pairs in f32,
    bf16 cast).  The strips are already in VMEM, so this replaces the
    canvas stage's two full-resolution pooling einsums and its second
    read of the grey frame.  Row pairs ride a small 2-hot MXU matmul,
    column pairs the same 128-aligned banded-block scheme as the
    threshold sums.

    ``emit_coarse`` (with emit_packed) replaces the first return value
    (the coarse bool mask) with the PRE-PADDED COARSE PLANE the label
    kernel (ops.coarse_pallas) consumes: (B, >=rp, cp) int32 0/1 where
    (rp, cp) = coarse_pad_shape(hc, wc) — coarse cell values at
    [:hc, :wc], zeros elsewhere.  On single-column-tile geometries the
    ds-column pooling + threshold compare run IN-KERNEL (one small MXU
    matmul against a ds-hot selector; counts <= ds^2 are bf16/f32-exact
    integers) and the per-row-count output never exists, killing the
    frontend->coarse XLA glue (pool-plane round trip + zeros/DUS pad).
    Multi-column geometries fall back to the identical XLA computation
    with the same return layout.  Recover the bool mask as
    ``plane[:, :hc, :wc] != 0``.

    ``_stop_after`` (PROFILING ONLY — output values are garbage) ends
    the kernel early after the named stage ("dma", "cast", "colsum",
    "rowsum", "black", "pack", "morph"), writing stub blocks derived
    from the last live intermediate to every output (so HBM write
    traffic matches the full kernel and stage deltas isolate compute).

    When ``emit_grey_canvas`` (with emit_packed), additionally returns
    (src, halo, halo_c): a zero-padded u8 canvas — the image at row/col
    offset (halo, halo_c), zeros outside, halo 8-row / 128-lane
    aligned — which the warp kernel (ops.warp_gather) uses as its
    pyramid LEVEL-0 source, so the bf16 canvas never carries a
    full-resolution level.  On single-column geometries with 8-aligned
    heights and 128-aligned widths the canvas is EMITTED BY THE KERNEL
    (the strip scratch already is the canvas block; the kernel reads
    the raw frame with clipped DMAs), which removes the host-side
    zeros+dynamic_update_slice pass — measured 4.7 ms/batch-128 at
    1080p, pure HBM traffic.  Other geometries build it host-side (the
    kernel then strip-DMAs from it).  Canvas HEIGHT differs between the
    two paths (n_strips*TH vs Hp+2*halo+8); consumers only rely on the
    (halo, halo_c) offsets and the zero slack, which both provide.
    """
    squeeze = grey.ndim == 2
    if squeeze:
        grey = grey[None]
    b, h, w = grey.shape
    r = open_radius
    ext = 2 if emit_packed else 0  # extra rows for the near-dilation
    # 8-row-aligned halo so the image sits at an 8-aligned row offset in
    # the padded canvas (required for the warp kernel's level-0 u8 window
    # DMAs when emit_grey_canvas is set; harmless otherwise).
    halo = _round_up(window + 2 * r + ext, 8)
    # Strip height: a multiple of 8 coarse rows per strip so the coarse
    # output block's sublane dim is divisible by 8 (TPU tiling
    # constraint).  Taller strips amortize the per-strip halo rows'
    # redundant compute (2*halo of ~th rows); 16 coarse rows when the
    # f32 working planes stay comfortably inside VMEM.  The split mode
    # additionally needs 32 | th (near words must not straddle strips).
    if emit_split:
        if not emit_packed or emit_grey_canvas:
            raise ValueError("emit_split requires emit_packed, no canvas")
        th = split_strip_rows(ds)
        if th is None:
            raise ValueError(f"no 32-aligned strip height for ds={ds}")
    else:
        rows_per_strip = 16 if ds * 16 <= 192 else 8
        th = rows_per_strip * ds
    # Zero padding strips below the image so downstream consumers
    # (refine/warp window DMAs, the level-1 plane) can read past the
    # image without touching uninitialised memory.  ``min_rows`` (from
    # the detector, which knows every consumer's deepest aligned read)
    # adds only the strips actually needed — often none, the round-up
    # slack suffices; without it one full extra strip is added (the
    # conservative pre-round-3 behaviour for callers that don't say).
    hp = _round_up(h, th)
    if emit_packed:
        if min_rows is None:
            hp += th
        else:
            hp = max(hp, _round_up(min_rows, th))
    halo_c = _round_up(halo, 128)
    # Column tiles bound VMEM for wide (4K+) frames.  The output width is
    # a multiple of the tile width and includes >=128 zero columns on the
    # right (downstream refine-window DMAs read into the padding; every
    # output tile is visited by the grid, so padding is written zeros).
    wp_img = _round_up(w, 128)
    if wp_img <= 2048:
        # Multiple of 256 so the level-1 output tile (tw/2 lanes) stays a
        # multiple of 128.
        tw = _round_up(wp_img + 128, 256)
        wp = tw
    else:
        tw = 1024
        wp = _round_up(wp_img + 128, tw)
    hc = -(-h // ds)
    wc = -(-w // ds)
    # DMA row-slices of a u8 array must be 8-aligned in the sublane dim.
    tb = _round_up(th + 2 * halo, 8)

    n_strips = hp // th
    n_cols = wp // tw
    # FRAME PAIRING: two frames ride each grid step (one 3-D strip DMA
    # covers both; every output block gets a leading 2).  The stage's
    # floor is per-step DMA-issue-bound, not byte-bound (~1.8 ms of
    # bytes inside a ~4.7 ms measured DMA+write baseline at 1080p
    # batch-128), so halving the step count attacks the floor without
    # the padded-rows waste taller strips would add.  Odd/single
    # batches keep one frame per step.
    fb = 2 if (b % 2 == 0 and b >= 2) else 1
    grid = (b // fb, n_strips, n_cols)
    if emit_coarse and not emit_packed:
        raise ValueError("emit_coarse requires emit_packed")
    rp_c, cp_c = coarse_pad_shape(hc, wc)
    # In-kernel coarse pooling needs the whole frame width in one tile
    # (cells would straddle column-tile boundaries otherwise); multi-
    # column geometries (4K+) keep the XLA pooling, same return layout.
    coarse_in_kernel = emit_coarse and n_cols == 1
    # Even ds (+ the always-even near-dilation offset): the ds-row pool
    # can sum 2-bit-field popcounts instead of fully unpacked bits.
    pair_pool = emit_packed and ds % 2 == 0 and ext % 2 == 0
    # Column DMA for tile c reads src cols [c*tw, c*tw + twb): the image
    # sits at column offset halo_c, so the buffer carries halo_c context
    # columns each side of the tile.
    twb = tw + 2 * halo_c

    # Fused input: read the RAW grey frame with clipped strip DMAs
    # instead of building a zero-padded canvas host-side with
    # zeros+dynamic_update_slice (measured 4.7 ms/batch-128 at 1080p —
    # pure HBM traffic, 14% of the whole pipeline).  Single-column
    # geometries with 8-aligned heights and 128-aligned widths only
    # (covers VGA/720p/1080p; clipped row DMAs need 8-aligned extents);
    # everything else keeps the host-built padded input.
    #
    # Fused canvas (``emit_grey_canvas`` on a fused-input geometry):
    # additionally emit the zero-padded u8 canvas as a kernel OUTPUT —
    # the scratch strip already IS the canvas block for its rows (image
    # at row/col offset (halo, halo_c) of the strip), so the output
    # write is a VMEM slice copy.  The batched detector no longer needs
    # this (warp level-0 windows read the packed plane directly); it
    # survives for callers that want a padded u8 grey canvas for free.
    fuse_geometry = (
        emit_packed and n_cols == 1 and h % 8 == 0 and w % 128 == 0
    )
    fuse_canvas = (
        fuse_geometry
        and emit_grey_canvas
        # The fused canvas is n_strips*TH rows (vs Hp+2*halo+8 host-
        # built): the warp kernel's level-0 window DMA reads up to row
        # h + halo + 8 (72-row read from the 8-aligned base of the
        # lowest window top h-64, image at row offset halo), so the
        # extra zero strip must be at least halo + 8 rows tall.
        and th >= halo + 8
    )
    # Clipped raw-frame input whenever the canvas question doesn't force
    # the host-built path (emit_grey_canvas wanted but un-fusable).
    fuse_input = fuse_canvas or (fuse_geometry and not emit_grey_canvas)
    if fuse_input:
        src = None
        if _stop_after == "src":  # no host canvas pass in this config
            return grey
        # Strip DMA classes: strip si reads image rows
        # [si*th - halo, si*th - halo + tb) clipped to [0, h), landing
        # at scratch row (clip amount).  Offsets/extents stay 8-aligned
        # because th, halo, tb and h all are.  Pure-padding strips
        # (no overlap with the image) issue no DMA at all.
        classes: dict[tuple[int, int], list[int]] = {}
        for si in range(n_strips):
            sr0 = si * th - halo
            ss0 = max(0, sr0)
            sd0 = ss0 - sr0
            sext = min(sr0 + tb, h) - ss0
            if sext > 0:
                classes.setdefault((sd0, sext), []).append(si)
    else:
        src = jnp.zeros(
            (b, hp + 2 * halo + 8, halo_c + wp + halo_c), dtype=jnp.uint8
        )
        src = jax.lax.dynamic_update_slice(src, grey, (0, halo, halo_c))
        if _stop_after == "src":  # profiling: canvas build only
            return src

    def kernel(src_hbm, band_ref, *refs):
        wpack_ref = usel_ref = vsel_ref = None
        if emit_packed:
            wpack_ref, refs = refs[0], refs[1:]
            if not emit_split:  # split never unpacks the near mask
                usel_ref, refs = refs[0], refs[1:]
            vsel_ref, refs = refs[0], refs[1:]
        csel_ref = None
        if coarse_in_kernel:
            csel_ref, refs = refs[0], refs[1:]
        l1_ref = None
        if emit_level1:
            rowpair_ref, colpair_ref = refs[:2]
            refs = refs[2:]
        near_ref = None
        if emit_packed:
            # In split mode packed_ref is the u8 grey plane output —
            # absent entirely when emit_split_grey=False (consumers
            # read the raw frame instead).
            if emit_split and not emit_split_grey:
                rowpool_ref, near_ref, *refs = refs
                packed_ref = None
            elif emit_split:
                rowpool_ref, packed_ref, near_ref, *refs = refs
            else:
                rowpool_ref, packed_ref, *refs = refs
            if emit_level1:
                l1_ref, *rest = refs
            else:
                rest = refs
            black_ref = None
        else:
            black_ref, rowpool_ref, *rest = refs
            packed_ref = None
        if fuse_canvas:
            canvas_ref, scratch, sem = rest
        else:
            canvas_ref = None
            scratch, sem = rest
        bi = pl.program_id(0)
        i = pl.program_id(1)
        c = pl.program_id(2)
        step = (bi * n_strips + i) * n_cols + c
        slot = step % 2

        def strip_dma(step_idx, slot_idx, wait=False):
            sbi = step_idx // (n_strips * n_cols)
            rem = step_idx % (n_strips * n_cols)
            si = rem // n_cols
            if not fuse_input:
                sc = rem % n_cols
                cp_ = pltpu.make_async_copy(
                    src_hbm.at[
                        pl.ds(fb * sbi, fb),
                        pl.ds(si * th, tb),
                        pl.ds(sc * tw, twb),
                    ],
                    scratch.at[slot_idx],
                    sem.at[slot_idx],
                )
                (cp_.wait if wait else cp_.start)()
                return
            # Fused canvas: clipped read straight from the raw frames
            # (ONE 3-D DMA covers the step's fb frames).  One
            # static-shape DMA per (dst-offset, extent) class, selected
            # by strip index; pure-padding strips have no class and do
            # nothing (the slot was pre-zeroed).
            for (sd0, sext), sis in classes.items():
                cond = si == sis[0]
                for s_ in sis[1:]:
                    cond = cond | (si == s_)

                @pl.when(cond)
                def _(sd0=sd0, sext=sext):
                    s0 = si * th - halo + sd0
                    cp_ = pltpu.make_async_copy(
                        src_hbm.at[
                            pl.ds(fb * sbi, fb),
                            pl.ds(pl.multiple_of(s0, 8), sext),
                            pl.ds(0, w),
                        ],
                        scratch.at[
                            slot_idx,
                            pl.ds(0, fb),
                            pl.ds(sd0, sext),
                            pl.ds(halo_c, w),
                        ],
                        sem.at[slot_idx],
                    )
                    (cp_.wait if wait else cp_.start)()

        def zero_ranges(slot_idx, ranges):
            # Zero the given row ranges of the slot's IMAGE column band.
            # The bands outside [halo_c, halo_c+w) are zeroed once at
            # each slot's first use and never dirtied again (the DMA
            # and the compute only ever write the image band).
            for r0_, r1_ in ranges:
                z = jnp.zeros((r1_ - r0_, w), jnp.uint8)
                for sl in range(2):

                    @pl.when(slot_idx == sl)
                    def _(z=z, r0_=r0_, sl=sl):
                        for f_ in range(fb):
                            scratch[
                                sl,
                                f_,
                                r0_ : r0_ + z.shape[0],
                                halo_c : halo_c + w,
                            ] = z

        def zero_full(slot_idx):
            z = jnp.zeros((fb, tb, twb), jnp.uint8)

            @pl.when(slot_idx == 0)
            def _():
                scratch[0] = z

            @pl.when(slot_idx == 1)
            def _():
                scratch[1] = z

        def zero_stale(step_idx, slot_idx):
            # Rows of the image band that strip step_idx's DMA will NOT
            # overwrite but an earlier strip in this slot dirtied.
            # Grouped like the DMA classes; interior strips (full-band
            # DMA) zero nothing.
            si = (step_idx % (n_strips * n_cols)) // n_cols
            comp: dict[tuple[tuple[int, int], ...], list[int]] = {}
            covered = {}
            for (sd0, sext), sis in classes.items():
                for s_ in sis:
                    covered[s_] = (sd0, sd0 + sext)
            for s_ in range(n_strips):
                lo, hi = covered.get(s_, (0, 0))
                rr = tuple(
                    r for r in ((0, lo), (hi, tb)) if r[1] > r[0]
                )
                if rr:
                    comp.setdefault(rr, []).append(s_)
            for rr, sis in comp.items():
                cond = si == sis[0]
                for s_ in sis[1:]:
                    cond = cond | (si == s_)

                @pl.when(cond)
                def _(rr=rr):
                    zero_ranges(slot_idx, rr)

        @pl.when(step == 0)
        def _():
            if fuse_input:
                zero_full(slot)
            strip_dma(step, slot)

        last = pl.num_programs(0) * n_strips * n_cols - 1

        @pl.when(step < last)
        def _():
            if fuse_input:

                @pl.when(step == 0)
                def _():
                    zero_full(1 - slot)

                @pl.when(step > 0)
                def _():
                    zero_stale(step + 1, 1 - slot)

            strip_dma(step + 1, 1 - slot)

        strip_dma(step, slot, wait=True)

        # Per-frame compute: the step's fb frames share one strip
        # DMA and one set of output blocks; everything below runs
        # once per frame writing block row f.
        for f in range(fb):

            if canvas_ref is not None:
                canvas_ref[f] = scratch[slot, f][:th]

            def _stub(x):
                # Profiling early-out: write every output block from slices
                # of the last live intermediate (keeps it un-DCE'd and the
                # HBM write traffic identical to the full kernel).
                l0 = halo_c
                xi = x.astype(jnp.float32)
                if xi.shape[0] < th + 2:  # packed word planes are 8 rows
                    xi = jnp.broadcast_to(xi[0:1], (th + 2, xi.shape[1]))
                xi = xi[: th + 2, l0 : l0 + tw + 2]
                if coarse_in_kernel:
                    rowpool_ref[f] = xi[: th // ds, :cp_c].astype(jnp.int32)
                else:
                    rowpool_ref[f] = (
                        xi[: th // ds, :tw].astype(jnp.int32).astype(jnp.uint8)
                    )
                if packed_ref is not None:
                    packed_ref[f] = xi[:th, :tw].astype(jnp.int32).astype(
                        jnp.uint8 if emit_split else jnp.int16
                    )
                if near_ref is not None:
                    near_ref[f] = xi[:8, :tw].astype(jnp.int32)
                if l1_ref is not None:
                    l1_ref[f] = xi[: th // 2, : tw // 2].astype(jnp.bfloat16)
                if black_ref is not None:
                    black_ref[f] = (
                        xi[:th, :tw].astype(jnp.int32).astype(jnp.uint8)
                    )

            if _stop_after == "dma":
                _stub(scratch[slot, f].astype(jnp.int32))
                continue

            # f32 arithmetic throughout: every value here is an integer
            # < 2^24 (box sums <= 255*(2w+1)^2), so f32 is exact — and the
            # VPU is f32-native (int32 vector multiplies are emulated).
            g = scratch[slot, f].astype(jnp.int32).astype(jnp.float32)
            if _stop_after == "cast":
                _stub(g)
                continue

            def roll(a, shift, axis):
                n = a.shape[axis]
                return pltpu.roll(a, shift % n, axis=axis)

            # --- clamped box sums (zero padding makes plain sums exact) ---
            # Column direction: width (2*window+1) CENTRED sliding sum as a
            # banded Toeplitz matmul on the MXU.  Lane-direction sliding sums
            # were the kernel's single priciest VPU block (~13 plane-ops of
            # rolls+adds); as 128-lane output blocks contracted against one
            # shared (256, 128) 0/1 band they ride the otherwise-idle MXU.
            # Exact: g <= 255 is bf16-representable, the band is 0/1, and the
            # f32 accumulation of <= 2*window+1 terms <= 3825 is integer-exact
            # at any summation order.  Interior block j contracts the
            # 128-aligned input lanes [(j-1)*128, (j+2)*128) (384 wide, so the
            # top lanes' windows never clip) against one shared (384, 128)
            # band.  Block 0 (lanes [0, 128)) would need negative input lanes:
            # it is pure halo (the image starts at halo_c >= 128, downstream
            # masks it to black) and is left zero.  The LAST block clips its
            # input to the buffer; its lanes >= 128 - window are inexact, but
            # every lane downstream reads (written region + morphology
            # context, <= 128 + r2 - halo_c into that block) stays below
            # 128 - window because halo_c >= window + r2 + 1 by construction.
            g_bf = g.astype(jnp.bfloat16)
            nb = twb // 128
            blocks = [jnp.zeros((tb, 128), jnp.float32)]
            for j in range(1, nb):
                kin = 384 if j < nb - 1 else 256
                blocks.append(
                    jax.lax.dot_general(
                        g_bf[:, (j - 1) * 128 : (j - 1) * 128 + kin],
                        band_ref[:kin],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                )
            colsum = jnp.concatenate(blocks, axis=1)
            if _stop_after == "colsum":
                _stub(colsum)
                continue
            r2 = 2 * r + ext
            nrows = th + 2 * r2
            # Row direction: sliding sums over the strip buffer; row 0 of the
            # output corresponds to absolute image row i*th - r2.
            off = halo - r2 - window  # small non-negative (halo is rounded up)
            sums = _sliding_sum_rows(colsum, 2 * window + 1, nrows, off)
            if _stop_after == "rowsum":
                _stub(sums)
                continue

            # --- counts (closed form, position-dependent at borders) ---
            # Built from (nrows, 1) x (1, twb) factors: the clip chains run on
            # thin vectors and only the outer product touches a full plane.
            row0 = i * th - r2  # absolute image row of sums[0]
            col0 = c * tw - halo_c  # absolute image col of lane 0
            rows_abs = row0 + jax.lax.broadcasted_iota(
                jnp.int32, (nrows, 1), 0
            )
            cols_abs = col0 + jax.lax.broadcasted_iota(jnp.int32, (1, twb), 1)
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
            rin = (rows_abs >= 0) & (rows_abs < h)  # (nrows, 1) thin
            cin = (cols_abs >= 0) & (cols_abs < w)  # (1, twb) thin

            gmid = g[halo - r2 : halo - r2 + nrows]
            area = crow.astype(jnp.float32) * ccol.astype(jnp.float32)
            # Masks as f32 0/1 (Mosaic can't rotate sub-32-bit vectors; f32
            # min/max double as and/or).  black == NOT(white AND inside),
            # fused into one select over thin-vector broadcasts; inside_i is
            # the outer product of the thin factors (one full-plane op).
            black = jnp.where(
                (gmid * area >= sums) & rin & cin, 0.0, 1.0
            )
            inside_i = rin.astype(jnp.float32) * cin.astype(jnp.float32)
            if _stop_after == "black":
                _stub(black * inside_i)
                continue

            # --- opening + near plane as SEPARABLE min/max windows.
            # r rounds of 3x3 erosion == one (2r+1)-square erosion; likewise
            # dilation.  Boundary semantics match segment.open_mask: the
            # erosion sees black outside the image; the eroded mask is
            # cleared outside the image before any dilation.
            we = 2 * r + 1
            w9 = 2 * (r + ext) + 1
            lane0 = halo_c
            if emit_packed:
                # BIT-PACKED morphology: the mask planes are packed 32 rows
                # per int32 word (two MXU matmuls against power-of-two
                # weights, f32-exact per 16-bit half), so every erosion/
                # dilation partial is a bitwise shift/AND/OR on a (8, twb)
                # word plane — 1/32 the rows of the f32 full-plane version.
                # Only the two consumed products are rebuilt at full rows:
                # the near plane via a one-hot selector matmul over the
                # log-halving unpack, and the ds-row pool counts via a
                # ds-hot selector matmul over the opened bits (counts <= ds
                # are f32/bf16-exact).  Row bookkeeping: black-plane row t
                # packs to bit t; a w-wide AND/OR window built from forward
                # shifts lands at its STARTING bit, so centred results sit
                # at a fixed negative offset which the selector matrices
                # bake in (derivation in the host-code comment below).
                AND, OR = jnp.bitwise_and, jnp.bitwise_or
                blk_bf = black.astype(jnp.bfloat16)
                ins_bf = inside_i.astype(jnp.bfloat16)

                def pack_words(plane_bf):
                    pw = jax.lax.dot_general(
                        wpack_ref[...],
                        plane_bf,
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )  # (16, twb): rows 0-7 = low 16 bits, 8-15 = high
                    return pw[:8].astype(jnp.int32) | (
                        pw[8:16].astype(jnp.int32) << 16
                    )

                blackw = pack_words(blk_bf)
                insw = pack_words(ins_bf)
                if _stop_after == "pack":
                    _stub(blackw + insw)
                    continue
                if r:
                    erw = _win_bits(blackw, (we,), AND)[we]
                    erw = _win_lanes_multi(erw, (we,), AND, roll)[we]
                    erow = AND(erw, _bits_rsh(insw, r))
                else:
                    erow = AND(blackw, insw)
                lanw = _win_lanes_multi(erow, (we, w9), OR, roll)
                opw = AND(
                    _win_bits(lanw[we], (we,), OR)[we],
                    _bits_rsh(insw, 2 * r),
                )
                nearw = AND(
                    _win_bits(lanw[w9], (w9,), OR)[w9],
                    _bits_rsh(insw, r2),
                )
                if _stop_after == "morph":
                    _stub(opw + nearw)
                    continue
                if pair_pool:
                    # Even ds + even bit offset: the pool's bit ranges are
                    # 2-aligned, so stop the unpack at 2-bit fields (its
                    # biggest level skipped), pool their popcounts, and
                    # slice to the output lanes first (128-aligned, so the
                    # shrink is free).  Counts are integers <= ds: bf16
                    # inputs {0,1,2} and f32 accumulation stay exact.
                    pr = _unpack_bits_pairs(opw[:, lane0 : lane0 + tw])
                    s_open = (
                        ((pr & 1) + (pr >> 1))
                        .astype(jnp.float32)
                        .astype(jnp.bfloat16)
                    )
                else:
                    s_open = (
                        _unpack_bits_halving(opw)
                        .astype(jnp.float32)
                        .astype(jnp.bfloat16)
                    )
                rowpool = jax.lax.dot_general(
                    vsel_ref[...],
                    s_open,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (th // ds, tw|twb) exact black counts per ds-row group
                gm = gmid[r2:-r2] if r2 else gmid
                if emit_split:
                    # SPLIT outputs: the u8 image-masked grey plane (unless
                    # the caller reads the RAW frame downstream and dropped
                    # it — emit_split_grey=False) and the near mask still
                    # bit-packed (bit t of word row t//32 = image row
                    # strip_base + t; nearw's bit t is exactly that — see
                    # the host-code comment on usel).  Word rows >= th//32
                    # carry the halo's view of the NEXT strip's rows (that
                    # strip writes them itself) — zeroed here.
                    if packed_ref is not None:
                        packed_ref[f] = (
                            (gm * inside_i[r2:-r2])[:, lane0 : lane0 + tw]
                            .astype(jnp.int32)
                            .astype(jnp.uint8)
                        )
                    wrow = jax.lax.broadcasted_iota(jnp.int32, (8, tw), 0)
                    near_ref[f] = jnp.where(
                        wrow < th // 32, nearw[:, lane0 : lane0 + tw], 0
                    )
                else:
                    s_near = (
                        _unpack_bits_halving(nearw)
                        .astype(jnp.float32)
                        .astype(jnp.bfloat16)
                    )
                    near_full = jax.lax.dot_general(
                        usel_ref[...],
                        s_near,
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )  # (th, twb) 0/1
                    # The batched detector never reads the full-res black
                    # mask (the packed plane replaces it) — skip its
                    # cast+write.  int16 (values <= 511 = grey | near<<8)
                    # halves the write traffic of the pipeline's largest
                    # intermediate.
                    packed = (gm + near_full * 256.0) * inside_i[r2:-r2]
                    packed_ref[f] = (
                        packed[:, lane0 : lane0 + tw]
                        .astype(jnp.int32)
                        .astype(jnp.int16)
                    )
            else:
                # Full-plane f32 path (black-mask output; ext == 0 here).
                # Rows use shrinking static slices (sublane rolls on
                # int32/f32 compile to a pathological Mosaic path), lanes
                # use rolls; shared power-of-two partials.
                if r:
                    er = _win_rows_multi(black, (we,), jnp.minimum)[we]
                    ero = _win_lanes_multi(er, (we,), jnp.minimum, roll)[we]
                    ero = ero * inside_i[r:-r]
                    lan = _win_lanes_multi(ero, (we,), jnp.maximum, roll)[we]
                    central = _win_rows_multi(lan, (we,), jnp.maximum)[we] * (
                        inside_i[r2:-r2] if r2 else inside_i
                    )
                else:
                    central = black * inside_i
                black_ref[f] = (
                    central[:, lane0 : lane0 + tw]
                    .astype(jnp.int32)
                    .astype(jnp.uint8)
                )

            if l1_ref is not None:
                # Pyramid level 1: bit-identical to build_packed_pyramid's
                # chain — exact f32 row-pair sums of the bf16 image, bf16
                # cast, then 0.25-weighted column pairs accumulated in f32,
                # bf16 cast.  Values beyond the image are zero in the padded
                # source, matching the XLA path's zero padding.
                gmbf = (gmid[r2:-r2] if r2 else gmid).astype(jnp.bfloat16)
                r1 = jax.lax.dot_general(
                    rowpair_ref[...],
                    gmbf,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(jnp.bfloat16)  # (th//2, twb)
                blk = [
                    jax.lax.dot_general(
                        r1[:, lane0 + jo * 256 : lane0 + (jo + 1) * 256],
                        colpair_ref[...],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    for jo in range(tw // 256)
                ]
                l1_ref[f] = jnp.concatenate(blk, axis=1).astype(jnp.bfloat16)

            # --- row pooling; column pooling is a tiny XLA op outside the
            # kernel.  Packed path: the ds-hot selector matmul above already
            # produced the counts; else a sublane reshape-sum of the mask.
            if not emit_packed:
                rowpool = (
                    central[:, lane0 : lane0 + tw]
                    .reshape(th // ds, ds, tw)
                    .sum(axis=1)
                )
            elif not pair_pool:  # pair_pool already pooled output lanes only
                rowpool = rowpool[:, lane0 : lane0 + tw]
            if coarse_in_kernel:
                # ds-column pooling + threshold IN-KERNEL: one MXU matmul
                # against the ds-hot column selector (per-row counts <= ds
                # are bf16-exact integers, sums <= ds^2 f32-exact), then
                # the pool_black compare.  Emits the label kernel's pre-
                # padded plane rows directly: cells at [:hc, :wc], zeros
                # beyond (padding lanes/cells carry zero counts so the
                # compare is False; zero-padding image rows pool to 0).
                cpool = jax.lax.dot_general(
                    rowpool.astype(jnp.bfloat16),
                    csel_ref[...],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                rowpool_ref[f] = (cpool * 2 >= max(ds, 2)).astype(jnp.int32)
            else:
                rowpool_ref[f] = rowpool.astype(jnp.int32).astype(jnp.uint8)

    tile_spec = pl.BlockSpec(
        (fb, th, tw), lambda bi, i, c: (bi, i, c), memory_space=pltpu.VMEM
    )
    if coarse_in_kernel:
        # First output = the pre-padded coarse plane (i32 0/1): one
        # (th//ds, cp_c) block per strip, cells at [:hc, :wc].
        pool_spec = pl.BlockSpec(
            (fb, th // ds, cp_c),
            lambda bi, i, c: (bi, i, 0),
            memory_space=pltpu.VMEM,
        )
        pool_shape = jax.ShapeDtypeStruct((b, hp // ds, cp_c), jnp.int32)
    else:
        pool_spec = pl.BlockSpec(
            (fb, th // ds, tw),
            lambda bi, i, c: (bi, i, c),
            memory_space=pltpu.VMEM,
        )
        pool_shape = jax.ShapeDtypeStruct((b, hp // ds, wp), jnp.uint8)
    if emit_level1 and not emit_packed:
        raise ValueError("emit_level1 requires emit_packed")
    if emit_packed:
        out_specs = [pool_spec]
        out_shapes = [pool_shape]
        if not (emit_split and not emit_split_grey):
            out_specs.append(tile_spec)
            out_shapes.append(
                jax.ShapeDtypeStruct(
                    (b, hp, wp), jnp.uint8 if emit_split else jnp.int16
                )
            )
        if emit_split:
            # Near-mask words: one 8-row int32 block per strip (8-row
            # blocks keep sublane offsets tile-aligned; rows >= th//32
            # of each block are zero).
            out_specs.append(
                pl.BlockSpec(
                    (fb, 8, tw),
                    lambda bi, i, c: (bi, i, c),
                    memory_space=pltpu.VMEM,
                )
            )
            out_shapes.append(
                jax.ShapeDtypeStruct((b, 8 * n_strips, wp), jnp.int32)
            )
        if emit_level1:
            out_specs.append(
                pl.BlockSpec(
                    (fb, th // 2, tw // 2),
                    lambda bi, i, c: (bi, i, c),
                    memory_space=pltpu.VMEM,
                )
            )
            out_shapes.append(
                jax.ShapeDtypeStruct((b, hp // 2, wp // 2), jnp.bfloat16)
            )
        if fuse_canvas:
            out_specs.append(
                pl.BlockSpec(
                    (fb, th, twb),
                    lambda bi, i, c: (bi, i, 0),
                    memory_space=pltpu.VMEM,
                )
            )
            out_shapes.append(
                jax.ShapeDtypeStruct((b, hp, twb), jnp.uint8)
            )
    else:
        out_specs = [tile_spec, pool_spec]
        out_shapes = [
            jax.ShapeDtypeStruct((b, hp, wp), jnp.uint8),
            pool_shape,
        ]

    # Shared 0/1 Toeplitz band for the MXU column sliding sum: input lane
    # k of a block contributes to output lane n iff |k - 128 - n| <= window.
    band = np.zeros((384, 128), np.float32)
    for n in range(128):
        band[128 + n - window : 128 + n + window + 1, n] = 1.0
    band = jnp.asarray(band, jnp.bfloat16)
    # The last-block clip argument above needs the right halo to cover the
    # morphology context plus the threshold window.
    assert halo_c >= window + 2 * r + ext + 1

    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(
            (384, 128), lambda bi, i, c: (0, 0), memory_space=pltpu.VMEM
        ),
    ]
    operands = [grey if fuse_input else src, band]
    if emit_packed:
        # Constants for the bit-packed morphology (see kernel):
        #  wpack (16, nrows): rows i / 8+i pack black-plane rows
        #    32i+j (j<16) / 32i+16+j into the low/high 16 bits of word i
        #    via 2^j weights — bf16-exact (powers of two), f32-exact
        #    accumulation (sums < 2^16).
        #  usel (th, 256): one-hot over the halving-unpack rows.  Bit
        #    offsets: black-plane row p = image row p - r2; forward
        #    windows put ero-start at bit p-r, opened (dilate we more)
        #    at bit p-2r, near (dilate w9) at bit p-r2.  So near for
        #    image row t (black row t+r2) is bit t -> usel row t picks
        #    bit t.
        #  vsel (th//ds, 256): ds-hot; opened for image row t is bit
        #    t+ext, so pool row k sums bits [k*ds+ext, (k+1)*ds+ext).
        #    Verified bit-for-bit against the XLA path in tests.
        r2h = 2 * r + ext
        nrows_h = th + 2 * r2h
        nwords = -(-nrows_h // 32)
        assert nwords <= 8, "strip too tall for 8-word bit packing"
        wpack = np.zeros((16, nrows_h), np.float32)
        for i in range(nwords):
            for j in range(16):
                if 32 * i + j < nrows_h:
                    wpack[i, 32 * i + j] = float(1 << j)
                if 32 * i + 16 + j < nrows_h:
                    wpack[8 + i, 32 * i + 16 + j] = float(1 << j)
        bitpos = {wb: k for k, wb in enumerate(_unpack_row_order())}
        usel = np.zeros((th, 256), np.float32)
        for t in range(th):
            usel[t, bitpos[(t // 32, t % 32)]] = 1.0
        if pair_pool:
            # 2-bit-field selector: pool row k sums the popcounts of
            # the pairs {t, t+1} covering [k*ds+ext, (k+1)*ds+ext) —
            # exactly the full-unpack sum when ds and ext are even.
            pairpos = {
                wb: k for k, wb in enumerate(_unpack_pair_order())
            }
            vsel = np.zeros((th // ds, 128), np.float32)
            for k in range(th // ds):
                for t in range(k * ds + ext, (k + 1) * ds + ext, 2):
                    vsel[k, pairpos[(t // 32, t % 32)]] = 1.0
        else:
            vsel = np.zeros((th // ds, 256), np.float32)
            for k in range(th // ds):
                for t in range(k * ds + ext, (k + 1) * ds + ext):
                    vsel[k, bitpos[(t // 32, t % 32)]] = 1.0
        in_specs.append(
            pl.BlockSpec(
                (16, nrows_h),
                lambda bi, i, c: (0, 0),
                memory_space=pltpu.VMEM,
            )
        )
        operands.append(jnp.asarray(wpack, jnp.bfloat16))
        if not emit_split:  # split never unpacks the near mask
            in_specs.append(
                pl.BlockSpec(
                    (th, 256),
                    lambda bi, i, c: (0, 0),
                    memory_space=pltpu.VMEM,
                )
            )
            operands.append(jnp.asarray(usel, jnp.bfloat16))
        in_specs.append(
            pl.BlockSpec(
                vsel.shape,
                lambda bi, i, c: (0, 0),
                memory_space=pltpu.VMEM,
            )
        )
        operands.append(jnp.asarray(vsel, jnp.bfloat16))
    if coarse_in_kernel:
        # ds-hot column selector for the in-kernel coarse pooling:
        # image column l (lane l of the sliced row-pool) belongs to
        # coarse cell l // ds; columns past wc*ds and cells past wc
        # stay zero (padding contributes nothing, padded cells pool 0).
        csel = np.zeros((tw, cp_c), np.float32)
        lcols = np.arange(min(wc * ds, tw))
        csel[lcols, lcols // ds] = 1.0
        in_specs.append(
            pl.BlockSpec(
                (tw, cp_c),
                lambda bi, i, c: (0, 0),
                memory_space=pltpu.VMEM,
            )
        )
        operands.append(jnp.asarray(csel, jnp.bfloat16))
    if emit_level1:
        rowpair = np.zeros((th // 2, th), np.float32)
        rowpair[np.arange(th) // 2, np.arange(th)] = 1.0
        colpair = np.zeros((256, 128), np.float32)
        colpair[np.arange(256), np.arange(256) // 2] = 0.25
        in_specs += [
            pl.BlockSpec(
                (th // 2, th),
                lambda bi, i, c: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (256, 128), lambda bi, i, c: (0, 0), memory_space=pltpu.VMEM
            ),
        ]
        operands += [
            jnp.asarray(rowpair, jnp.bfloat16),
            jnp.asarray(colpair, jnp.bfloat16),
        ]

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((2, fb, tb, twb), jnp.uint8),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(*operands)

    rowpool_pad = outs[0] if emit_packed else outs[1]
    if coarse_in_kernel:
        coarse = rowpool_pad  # the pre-padded coarse plane, done in-kernel
    else:
        # Column pooling of the per-row counts (tiny, stays in XLA).
        rp = rowpool_pad[:, :hc, : wc * ds].astype(jnp.int32)
        pooled = rp.reshape(b, hc, wc, ds).sum(axis=-1)
        coarse = pooled * 2 >= max(ds, 2)
        if emit_coarse:
            # Multi-column fallback: same pre-padded plane layout.
            coarse = jax.lax.dynamic_update_slice(
                jnp.zeros((b, rp_c, cp_c), jnp.int32),
                coarse.astype(jnp.int32),
                (0, 0, 0),
            )
    if emit_packed:
        if emit_split and not emit_split_grey:
            # No grey plane output: (coarse, near_words[, level1]).
            extra = (outs[1],) + ((outs[2],) if emit_level1 else ())
            if squeeze:
                return (coarse[0],) + tuple(e[0] for e in extra)
            return (coarse,) + extra
        packed = outs[1]  # int16 packed plane, or the u8 grey plane (split)
        tail = outs[3:] if emit_split else outs[2:]
        extra = ((outs[2],) if emit_split else ()) + (
            (tail[0],) if emit_level1 else ()
        )
        if fuse_canvas:
            src = outs[-1]
        if emit_grey_canvas:
            if squeeze:
                return (coarse[0], packed[0]) + tuple(
                    e[0] for e in extra
                ) + (src[0], halo, halo_c)
            return (coarse, packed) + extra + (src, halo, halo_c)
        if squeeze:
            return (coarse[0], packed[0]) + tuple(e[0] for e in extra)
        return (coarse, packed) + extra
    black = outs[0][:, :h, :w] != 0
    if squeeze:
        return black[0], coarse[0]
    return black, coarse
