"""Pallas corner-refinement kernel: plane-resident window extraction.

The XLA refinement (segment.refine_corners) extracts K*4 dynamic windows
per frame from the packed grey/ink plane; vmapped dynamic_slice lowers to
row gathers whose per-row latency dominates the stage (~20 ms of the
1080p batch-64 profile).  The round-2 kernel replaced the gathers with
one explicit HBM DMA per window, which made the stage DMA-ISSUE-bound
instead (~1.2 us per window x ~4-5k valid windows ~= the whole stage).

This kernel removes the per-window DMAs entirely: the grid walks frames,
Pallas streams each frame's whole packed plane into VMEM (one bulk copy,
double-buffered across grid steps so it hides behind the previous
frame's compute), and every window is then an in-VMEM dynamic slice —
no DMA issue cost, no per-window HBM round-trip.

The per-window loop is a fori_loop (compiles once; windows are
data-indexed) with a per-window KIND code: invalid windows skip all
compute, and outer windows skip the inner-footprint upsample matmuls.
(Host-side sorting into valid-first runs with dynamic trip counts was
measured a wash: the argsort/gather XLA glue cost what the skipped
loop iterations saved.)

Numerics match segment.refine_corners exactly: same local-mean ink test,
same clamp box, same first-maximum (row-major) tie-break.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.partial(
    jax.jit,
    static_argnames=(
        "wn", "clamp_r", "ds", "strip_rows", "raw_src", "interpret",
    ),
)
def refine_eval(
    packed: jnp.ndarray,  # (B, Hp, Wp) int16/int32 — OR u8 grey (split)
    inner_plane: jnp.ndarray,  # (B, Hcp, Wcp) int32 coarse inner footprint
    tly: jnp.ndarray,  # (B, K4) int32 window top (in-bounds for wn)
    tlx: jnp.ndarray,  # (B, K4) int32 window left
    dirs: jnp.ndarray,  # (B, K4, 2) float32 outward corner direction
    corners: jnp.ndarray,  # (B, K4, 2) float32 coarse corner (x, y)
    inner: jnp.ndarray,  # (B, K4) bool — restrict ink to the inner footprint
    valid: jnp.ndarray,  # (B, K4) bool — invalid windows skip all compute
    wn: int,
    clamp_r: int,
    ds: int,
    near_words: jnp.ndarray | None = None,  # (B, 8*NS, Wp) int32 split near
    strip_rows: int = 0,  # frontend strip height (split mode only)
    raw_src: bool = False,  # packed is the RAW (B, H, W) frame
    interpret: bool = False,
):
    """Refined corners for the B*K4 windows.

    Returns (x, y (B, K4) f32, has (B, K4) bool); outputs of invalid
    windows are garbage — mask with ``valid`` downstream.  ``packed``
    must be padded so [align(tly), +SH) x [align128(tlx), +SW) stays in
    bounds, with pad pixels carrying zero mask bits.

    SPLIT mode (``near_words`` given): ``packed`` is the frontend's u8
    image-masked grey plane and the near mask arrives bit-packed 32
    rows per int32 word in the frontend's per-strip layout (word row
    8*(R // strip_rows) + (R %% strip_rows) // 32, bit R %% 32 = image
    row R; ops.frontend_pallas emit_split).  Windows then read near
    bits by broadcasting whole word rows and shifting by the row iota —
    the near mask is never unpacked outside VMEM, and the two planes
    together stream ~44%% of the int16 packed plane's bytes.

    RAW mode (``raw_src``, split only): ``packed`` is the RAW (B, H, W)
    u8 frame — no padded grey plane exists in HBM at all (the frontend
    never writes one; its biggest output dies).  The kernel DMAs each
    frame into a larger VMEM scratch whose padding stays UNINITIALISED:
    every window value is consumed under the in-window ``sel`` mask
    (mean, ink, score), so pad content is irrelevant.  Aligned window
    slices stay inside the scratch by construction (its rows/cols cover
    the deepest aligned read for in-image windows).
    """
    b, k4 = tly.shape
    split = near_words is not None
    assert not raw_src or split, "raw_src requires split near words"
    # Row alignment follows the plane dtype: int16 tiles are (16, 128),
    # int32 tiles (8, 128); the split-mode u8 plane uses 32 so window
    # rows share their 32-row near word group alignment.
    if split:
        assert packed.dtype == jnp.uint8 and strip_rows % 32 == 0
        align = 32
    else:
        align = 16 if packed.dtype == jnp.int16 else 8
    sh = _round_up(wn + align - 1, align)
    sw = _round_up(wn + 127, 128)
    hp, wp = packed.shape[1], packed.shape[2]
    hcp, wcp = inner_plane.shape[1], inner_plane.shape[2]
    k4p = _round_up(k4, 8)

    def padi(a):
        out = jnp.zeros((b, k4p), jnp.int32)
        return out.at[:, :k4].set(a.astype(jnp.int32))

    by_s = padi((tly // align) * align)
    bx_s = padi((tlx // 128) * 128)
    ty_s = padi(tly)
    tx_s = padi(tlx)
    # 0 = invalid (skip everything), 1 = valid outer (skip the
    # footprint-upsample matmuls), 2 = valid inner.
    kind_s = padi(
        jnp.where(valid, jnp.where(inner, 2, 1), 0).astype(jnp.int32)
    )
    # COMPACT WINDOW LIST: the loop visits only the valid windows via
    # an index list (typical frames have ~40 of 176 valid; a skipped
    # slot still costs ~0.07 us of loop overhead — ~1 ms/batch-128 of
    # dead iterations without the list).  Sort-free construction:
    # cumsum rank + one-hot matmul (indices < 256 are bf16-exact).
    wpos = jnp.cumsum(valid.astype(jnp.int32), axis=1) - 1  # (B, K4)
    n_valid = jnp.sum(valid.astype(jnp.int32), axis=1)  # (B,)
    tgt = jax.lax.broadcasted_iota(jnp.int32, (k4, k4p), 1)
    onehot = (
        (wpos[:, :, None] == tgt[None]) & valid[:, :, None]
    ).astype(jnp.bfloat16)  # (B, K4, K4P)
    src = jnp.arange(k4, dtype=jnp.int32)
    # hi/lo byte split keeps the index matmul exact for any K4 (bf16
    # holds integers < 256 exactly; one-hot rows sum a single term).
    wlist = sum(
        jnp.einsum(
            "bit,i->bt",
            onehot,
            part.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        ).astype(jnp.int32)
        * scale
        for part, scale in ((src & 255, 1), (src >> 8, 256))
    )  # (B, K4P): t-th valid window's slot index

    # Per-window float parameters ride one (1, K4P, 128) f32 VMEM block
    # per frame; rows are read with a dynamic sublane index in the loop.
    params = jnp.zeros((b, k4p, 128), jnp.float32)
    params = params.at[:, :k4, 0].set(dirs[..., 0])
    params = params.at[:, :k4, 1].set(dirs[..., 1])
    params = params.at[:, :k4, 2].set(corners[..., 0])
    params = params.at[:, :k4, 3].set(corners[..., 1])

    def kernel(
        kind_ref, by_ref, bx_ref, ty_ref, tx_ref, wlist_ref, nv_ref,
        params_ref, inner_ref, plane_ref, *refs,
    ):
        if raw_src:
            if split:
                near_ref, out_ref, pscr, psem = refs
            else:
                out_ref, pscr, psem = refs
        elif split:
            near_ref, out_ref = refs
        else:
            (out_ref,) = refs
        i = pl.program_id(0)
        if raw_src:
            # RAW mode: double-buffered bulk DMA of the frame into the
            # padded scratch (padding uninitialised — sel-masked).
            nsteps = pl.num_programs(0)
            slot = i % 2

            def pcopy(step, sl):
                return pltpu.make_async_copy(
                    plane_ref.at[step],
                    pscr.at[sl, pl.ds(0, hp), pl.ds(0, wp)],
                    psem.at[sl],
                )

            @pl.when(i == 0)
            def _():
                pcopy(0, 0).start()

            @pl.when(i + 1 < nsteps)
            def _():
                pcopy(i + 1, 1 - slot).start()

            pcopy(i, slot).wait()
        # The whole per-window chain runs at 128 lanes: the slice is 256
        # lanes (window lane bases are 128-aligned, offsets reach 127)
        # but the wn <= 64 window always fits one of the two 64-offset
        # 128-lane sub-blocks, selected per window (warp kernel's
        # half-shift trick) — every chain op then touches half the
        # vregs of the 256-lane form.
        swc = 128
        rows_i = jax.lax.broadcasted_iota(jnp.int32, (sh, swc), 0)
        cols_i = jax.lax.broadcasted_iota(jnp.int32, (sh, swc), 1)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        inv_area = 1.0 / float(wn * wn)
        inner_bf = inner_ref[0].astype(jnp.bfloat16)  # (hcp, wcp)

        def window(j, is_inner_w):
            p = params_ref[0, j]
            dirx, diry = p[0], p[1]
            cx, cy = p[2], p[3]
            ty = ty_ref[i, j]
            tx = tx_ref[i, j]
            byv = by_ref[i, j]
            bxv = bx_ref[i, j]
            hh = (tx - bxv) // 64  # 64-block of the window start: 0/1
            bxw = bxv + 64 * hh  # lane base of the 128-lane sub-block
            if raw_src:
                win2 = pscr[
                    slot,
                    pl.ds(pl.multiple_of(byv, align), sh),
                    pl.ds(pl.multiple_of(bxv, 128), sw),
                ].astype(jnp.int32)
            else:
                win2 = plane_ref[
                    0,
                    pl.ds(pl.multiple_of(byv, align), sh),
                    pl.ds(pl.multiple_of(bxv, 128), sw),
                ].astype(jnp.int32)
            win = jnp.where(hh == 0, win2[:, :128], win2[:, 64:192])
            rows = rows_i + byv
            cols = cols_i + bxw
            sel = (
                (rows >= ty)
                & (rows < ty + wn)
                & (cols >= tx)
                & (cols < tx + wn)
            )
            if split:
                # Near bits from the word plane: window rows start at
                # the 32-aligned byv, so 32-row group q covers rows
                # [byv + 32q, byv + 32(q+1)) = one whole word row;
                # broadcast it and shift by the in-group row index.
                wrows = strip_rows // 32
                parts = []
                for q in range(sh // 32):
                    g32 = byv // 32 + q
                    si = g32 // wrows
                    wr = si * 8 + (g32 - si * wrows)
                    row = near_ref[
                        0, wr, pl.ds(pl.multiple_of(bxv, 128), sw)
                    ]
                    rw = jnp.where(hh == 0, row[:128], row[64:192])
                    parts.append(
                        jnp.broadcast_to(rw.reshape(1, swc), (32, swc))
                    )
                words = jnp.concatenate(parts, axis=0)  # (sh, swc)
                near8 = (words >> (rows_i & 31)) & 1
            else:
                near8 = (win >> 8) & 1  # int 0/1: no i1 select in Mosaic
            # Upsample the coarse footprint over this window with two
            # one-hot contractions (row-, col-cells), gated by the
            # window's RUNTIME kind (one traced body for outer+inner
            # lets the 2-wide loop below interleave freely; the two
            # small matmuls ride the otherwise-idle MXU for outer
            # windows and their result is masked off).
            rr = byv + jax.lax.broadcasted_iota(
                jnp.int32, (sh, 1), 0
            )
            cellr = rr // ds
            rsel = (
                cellr
                == jax.lax.broadcasted_iota(jnp.int32, (1, hcp), 1)
            ).astype(jnp.bfloat16)  # (sh, hcp)
            cc = bxw + jax.lax.broadcasted_iota(
                jnp.int32, (1, swc), 1
            )
            cellc = cc // ds  # (1, swc)
            csel = (
                jax.lax.broadcasted_iota(jnp.int32, (wcp, swc), 0)
                == cellc
            ).astype(jnp.bfloat16)  # (wcp, swc)
            a = jnp.dot(
                rsel, inner_bf, preferred_element_type=jnp.float32
            )  # (sh, wcp)
            up = jnp.dot(
                a.astype(jnp.bfloat16), csel,
                preferred_element_type=jnp.float32,
            )  # (sh, swc)
            up9 = jnp.where(is_inner_w, (up > 0.5).astype(jnp.int32), 1)
            near = (near8 & up9) == 1
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
            lin = rows_i * swc + cols_i
            cand = jnp.where(score == m, lin, jnp.int32(sh * swc))
            li = jnp.min(cand)
            bestx = (bxw + li % swc).astype(jnp.float32)
            besty = (byv + li // swc).astype(jnp.float32)
            return jnp.where(
                lane == 0,
                bestx,
                jnp.where(
                    lane == 1,
                    besty,
                    jnp.where(lane == 2, has.astype(jnp.float32), 0.0),
                ),
            )[0]

        nv = nv_ref[i]

        def body(t, carry):
            # The loop walks the COMPACT list of valid windows (the
            # bodies are compiled once — everything is data-indexed),
            # TWO independent window chains per trip so their
            # serialized reductions overlap; the odd tail chain
            # dead-writes the spare output row.  Rows of skipped
            # (invalid) windows are never written — their outputs are
            # garbage, masked downstream exactly like the dense-loop
            # version masked them.
            ja = wlist_ref[i, 2 * t]
            jb = wlist_ref[i, 2 * t + 1]
            rowa = window(ja, kind_ref[i, ja] == 2)
            rowb = window(jb, kind_ref[i, jb] == 2)
            out_ref[0, ja] = rowa
            out_ref[0, jnp.where(2 * t + 1 < nv, jb, k4p)] = rowb
            return carry

        jax.lax.fori_loop(0, (nv + 1) // 2, body, 0)

    # One frame per grid step: Pallas streams the frame's whole packed
    # plane into VMEM (double-buffered across steps), so every window is
    # an in-VMEM slice.  VMEM: 2 plane buffers + params/inner/out.
    # RAW mode DMAs the frame into a padded scratch itself (the plane
    # rides pl.ANY), so the aligned window slices stay in bounds
    # without any padded HBM copy existing.
    if raw_src:
        shp = (max(hp - wn, 0) // align) * align + sh
        swp = (max(wp - wn, 0) // 128) * 128 + sw
        plane_bytes = 2 * shp * swp * packed.dtype.itemsize
    else:
        plane_bytes = 2 * hp * wp * packed.dtype.itemsize
    in_specs = [
        pl.BlockSpec(
            (1, k4p, 128),
            lambda i, *_refs: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, hcp, wcp),
            lambda i, *_refs: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(memory_space=pl.ANY)
        if raw_src
        else pl.BlockSpec(
            (1, hp, wp),
            lambda i, *_refs: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    ]
    operands = [
        kind_s, by_s, bx_s, ty_s, tx_s, wlist, n_valid,
        params, inner_plane, packed,
    ]
    if split:
        # The near plane keeps the FRONTEND's padded width — wider than
        # the raw frame in raw mode; its block must cover the full
        # array or reads at clamped lane bases leave the block.
        nw8, nww = near_words.shape[1], near_words.shape[2]
        in_specs.append(
            pl.BlockSpec(
                (1, nw8, nww),
                lambda i, *_refs: (i, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
        operands.append(near_words)
        plane_bytes += 2 * nw8 * nww * 4
    limit = plane_bytes + 24 * 1024 * 1024
    scratch_shapes = []
    if raw_src:
        scratch_shapes = [
            pltpu.VMEM((2, shp, swp), packed.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ]
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=7,
            grid=(b,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                # +8 rows: row k4p is the 2-wide loop's dead-write
                # spare (tile-aligned block growth).
                (1, k4p + 8, 128),
                lambda i, *_refs: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=scratch_shapes,
        ),
        out_shape=jax.ShapeDtypeStruct((b, k4p + 8, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=limit),
        interpret=interpret,
    )(*operands)

    return out[:, :k4, 0], out[:, :k4, 1], out[:, :k4, 2] > 0.5


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
    near_words: jnp.ndarray | None = None,  # split-mode near mask words
    strip_rows: int = 0,  # frontend strip height (split mode)
    raw_src: bool = False,  # packed is the raw (B, H, W) u8 frame
    interpret: bool = False,
) -> jnp.ndarray:
    """Batched drop-in for segment.refine_corners over a frame batch.

    ``packed`` may be larger than the image (e.g. the fused frontend's
    padded plane); pass ``image_hw`` in that case.  Padding must carry
    zero mask bits.  If the plane is too small for the aligned window
    slices it is re-padded here.

    SPLIT mode: pass the frontend's u8 grey plane as ``packed`` plus
    its ``near_words``/``strip_rows`` (ops.frontend_pallas emit_split);
    the planes must already be padded for the aligned reads (the
    detector sizes them via min_rows).
    """
    b = packed.shape[0]
    h, w = image_hw or packed.shape[1:]
    k = quads.shape[1]
    clamp_r = ds + 2
    split = near_words is not None
    if split:
        align = 32
    else:
        align = 16 if packed.dtype == jnp.int16 else 8
    sh = _round_up(wn + align - 1, align)
    sw = _round_up(wn + 127, 128)
    # Aligned window slices reach at most
    # [align(h-wn)+sh, align128(w-wn)+sw).
    need_h = (max(h - wn, 0) // align) * align + sh
    need_w = (max(w - wn, 0) // 128) * 128 + sw
    if raw_src:
        # Raw frame: the kernel pads in VMEM itself (scratch DMA).
        assert packed.shape[1] == h and packed.shape[2] == w
        pad = packed
    elif packed.shape[1] >= need_h and packed.shape[2] >= need_w:
        pad = packed
    else:
        if split:
            raise ValueError(
                "split-mode planes must be pre-padded for the aligned "
                f"window reads (need ({need_h}, {need_w}), got "
                f"{packed.shape[1:]})"
            )
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

    if split:
        # The kernel indexes near words with the same lane bases as the
        # window slices — the near plane must cover the deepest read.
        assert near_words.shape[2] >= need_w
    k4 = k * 4
    x, y, has = refine_eval(
        pad,
        iplane,
        tly.reshape(b, k4),
        tlx.reshape(b, k4),
        dirs.reshape(b, k4, 2),
        quads.reshape(b, k4, 2),
        jnp.broadcast_to(is_inner[:, :, None], (b, k, 4)).reshape(b, k4),
        valid4.reshape(b, k4),
        wn,
        clamp_r,
        ds,
        near_words=near_words,
        strip_rows=strip_rows,
        raw_src=raw_src,
        interpret=interpret,
    )
    refined = jnp.stack([x, y], axis=-1).reshape(b, k, 4, 2)
    hasr = has.reshape(b, k, 4) & valid4  # invalid lanes carry garbage
    return jnp.where(hasr[..., None], refined, quads)
