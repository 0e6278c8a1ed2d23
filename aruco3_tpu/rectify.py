"""Perspective rectification and code-bit decoding, batched over candidates.

Capability parity (vs reference src/aruco.rs):
  * ``extract_homographies``: 4-point projection + bilinear warp of each
    candidate quad into an SxS gray patch (aruco.rs:234-261; S=49 default).
    Warp convention matches imageproc ``warp_into``: output pixel (x, y)
    samples the source at H_patch->image (x, y), out-of-bounds reads the
    black default.
  * ``homography_to_code_permutations``: per-patch Otsu binarization
    (aruco.rs:264-265), Triangle-filter resize to mark_size (aruco.rs:273),
    bit = value > 127 (aruco.rs:283), all-black border gate
    (aruco.rs:288-292), and the MSB-first inner-grid read with 3 extra 90°
    CCW rotations (aruco.rs:296-326).

TPU-first design: every candidate is a lane in a fixed-capacity batch.
The warp is one gather + fused bilinear blend; Otsu histograms are a
broadcast-compare-reduce; the Triangle resize is two small matmuls
(L @ patch @ L^T) that ride the MXU; rotations are static jnp.rot90 views.
Invalid lanes (masked candidates, failed border gates) are carried as
validity masks — no dynamic shapes anywhere.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_HIGHEST = jax.lax.Precision.HIGHEST


# --------------------------------------------------------------------------
# Homography from control points (patch square -> image quad)
# --------------------------------------------------------------------------
def homography_square_to_quad(
    quads: jnp.ndarray, patch_size: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """DLT homographies mapping the patch square to each image quad.

    quads: (..., 4, 2) float (x, y) image corners, clockwise from top-left.
    The square control points are (0,0), (s,0), (s,s), (0,s) with
    s = patch_size, matching reference aruco.rs:244-247.

    Returns (H (..., 3, 3), valid (...,)) — invalid when the DLT system is
    singular (degenerate quad), mirroring the reference's projection-failure
    fallback (aruco.rs:250-256).
    """
    q = jnp.asarray(quads, dtype=jnp.float32)
    batch = q.shape[:-2]
    s = float(patch_size)

    # Closed form for unit-square -> quad (then compose the 1/s scale):
    # the projective-interpolation construction (same approach as the
    # reference's fully expanded homography, pose.rs:95-123) — ~20 flops
    # per quad instead of a batched 8x8 LU solve (batched LU loops
    # serialize on TPU).
    u0, u1, u2, u3 = (q[..., i, 0] for i in range(4))
    v0, v1, v2, v3 = (q[..., i, 1] for i in range(4))
    d1u = u1 - u2
    d1v = v1 - v2
    d2u = u3 - u2
    d2v = v3 - v2
    su = u0 - u1 + u2 - u3
    sv = v0 - v1 + v2 - v3
    den = d1u * d2v - d2u * d1v
    valid = jnp.abs(den) > 1e-12
    den_safe = jnp.where(valid, den, 1.0)
    g = (su * d2v - sv * d2u) / den_safe  # a31 (unit square)
    hh = (d1u * sv - d1v * su) / den_safe  # a32
    a11 = u1 - u0 + g * u1
    a12 = u3 - u0 + hh * u3
    a13 = u0
    a21 = v1 - v0 + g * v1
    a22 = v3 - v0 + hh * v3
    a23 = v0
    inv_s = jnp.float32(1.0 / s)
    H = jnp.stack(
        [
            jnp.stack([a11 * inv_s, a12 * inv_s, a13], axis=-1),
            jnp.stack([a21 * inv_s, a22 * inv_s, a23], axis=-1),
            jnp.stack([g * inv_s, hh * inv_s, jnp.ones_like(g)], axis=-1),
        ],
        axis=-2,
    )  # (..., 3, 3)
    finite = jnp.isfinite(H).all((-2, -1))
    valid = valid & finite
    H = jnp.where(
        valid[..., None, None], H, jnp.eye(3, dtype=jnp.float32)
    )
    return H, valid


# --------------------------------------------------------------------------
# Bilinear patch warp — MXU path (pyramid + window slice + weight matmul)
# --------------------------------------------------------------------------
_WARP_WIN = 64  # VMEM window side; markers bigger than ~60px/level go up a level


def build_pyramid(grey: jnp.ndarray, levels: int) -> list[jnp.ndarray]:
    """2x2 box-mean image pyramid, float32, every level padded to >=64.

    Level l pixel (i, j) covers image pixels [i*2^l, (i+1)*2^l); its center
    sits at image coord (i + 0.5) * 2^l - 0.5.
    """
    out = []
    img = grey.astype(jnp.float32)
    for _ in range(levels):
        h, w = img.shape
        # Pad to even BEFORE clamping to the window: max(odd<64, 64)+1
        # would yield an odd padded size and break the 2x2 reshape below.
        ph = max(h + (h % 2), _WARP_WIN)
        pw = max(w + (w % 2), _WARP_WIN)
        padded = jnp.pad(img, ((0, ph - h), (0, pw - w)))
        out.append(padded)
        img = (
            padded.reshape(ph // 2, 2, pw // 2, 2).sum(axis=(1, 3)) * 0.25
        )
    return out


def _warp_setup(
    pyramid: list[jnp.ndarray],
    H: jnp.ndarray,
    quads: jnp.ndarray,
    patch_size: int,
):
    """Select per-candidate pyramid windows + window-space sample coords.

    Shared by the XLA eval (warp_patches_mxu) and the Pallas eval
    (warp_patches_pallas).  Returns (windows (K, win, win) f32,
    ux (K, S2), uy (K, S2), bad (K, S2) bool).
    """
    levels = len(pyramid)
    s = patch_size
    k = H.shape[0]
    win = _WARP_WIN

    # Patch-grid sample coords in image space.
    ys, xs = jnp.meshgrid(
        jnp.arange(s, dtype=jnp.float32),
        jnp.arange(s, dtype=jnp.float32),
        indexing="ij",
    )
    pix = jnp.stack(
        [xs, ys, jnp.ones_like(xs)], axis=-1
    ).reshape(-1, 3)  # (S2, 3)
    src = jnp.einsum("kij,pj->kpi", H, pix, precision=_HIGHEST)
    wdiv = src[..., 2]
    wsafe = jnp.where(jnp.abs(wdiv) < 1e-12, 1.0, wdiv)
    sx = src[..., 0] / wsafe  # (K, S2) image-space x
    sy = src[..., 1] / wsafe
    bad = jnp.abs(wdiv) < 1e-12

    # Level selection from the quad bbox (margin for refinement jitter).
    bmin = jnp.min(quads, axis=-2)  # (K, 2)
    bmax = jnp.max(quads, axis=-2)
    side = jnp.max(bmax - bmin, axis=-1) + 4.0  # (K,)
    lvl = jnp.clip(
        jnp.ceil(jnp.log2(jnp.maximum(side / (win - 4.0), 1e-3))),
        0,
        levels - 1,
    ).astype(jnp.int32)
    center = (bmin + bmax) * 0.5  # (K, 2) image coords

    # Pack all levels into ONE row-concatenated buffer so each candidate
    # needs a single dynamic_slice.  (Slicing at every level and selecting
    # costs K*L window gathers — measured as the dominant warp cost; the
    # pack itself is one ~1.33x-frame-size copy.)  Right-padding with
    # zeros matches the out-of-image black default.
    w0 = pyramid[0].shape[1]
    padded = [
        img
        if img.shape[1] == w0
        else jnp.pad(img, ((0, 0), (0, w0 - img.shape[1])))
        for img in pyramid
    ]
    packed = jnp.concatenate(padded, axis=0)
    offsets = np.cumsum([0] + [img.shape[0] for img in pyramid]).tolist()

    # Per-level top-left / sample coords are cheap (K,)/(K, S2) arithmetic;
    # only the WINDOW slice (the expensive part) happens once, post-select.
    all_tlx, all_tly, all_ux, all_uy = [], [], [], []
    for level in range(levels):
        hl, wl = pyramid[level].shape
        scale = float(2**level)
        cl = (center + 0.5) / scale - 0.5  # (K, 2) level coords
        tlx = jnp.clip(
            jnp.round(cl[:, 0]).astype(jnp.int32) - win // 2, 0, wl - win
        )
        tly = jnp.clip(
            jnp.round(cl[:, 1]).astype(jnp.int32) - win // 2, 0, hl - win
        )
        all_ux.append(
            (sx + 0.5) / scale - 0.5 - tlx[:, None].astype(jnp.float32)
        )
        all_uy.append(
            (sy + 0.5) / scale - 0.5 - tly[:, None].astype(jnp.float32)
        )
        all_tlx.append(tlx)
        all_tly.append(tly + offsets[level])

    def sel(stack, zero):
        return sum(
            jnp.where(
                (lvl == level)[:, None] if stack[0].ndim == 2 else lvl == level,
                stack[level],
                zero,
            )
            for level in range(levels)
        )

    tlx = sel(all_tlx, 0)
    tly = sel(all_tly, 0)
    ux = sel(all_ux, 0.0)  # (K, S2)
    uy = sel(all_uy, 0.0)
    windows = jax.vmap(
        lambda ty, tx: jax.lax.dynamic_slice(packed, (ty, tx), (win, win))
    )(tly, tlx)  # (K, win, win)
    return windows, ux, uy, bad


def warp_patches_mxu(
    pyramid: list[jnp.ndarray],
    H: jnp.ndarray,
    quads: jnp.ndarray,
    patch_size: int,
) -> jnp.ndarray:
    """Gather-free perspective warp: one small matmul per candidate.

    Per candidate: pick the pyramid level where the quad's bbox fits a
    64x64 window, dynamic-slice that window, and evaluate all S*S bilinear
    samples as T = Wx @ window^T followed by a row-wise weighted sum with
    Wy — the bilinear weights live in two dense (S^2, 64) separable weight
    matrices, so the whole warp rides the MXU with zero gathers (TPU
    gathers serialize; see segment.label_components for the same story).

    Samples outside the image resolve to 0 (the reference's black default,
    aruco.rs:253): out-of-window coordinates produce all-zero weight rows.
    For quads smaller than the window the warp samples pyramid level 0,
    i.e. it is exactly the reference's bilinear interpolation; larger quads
    sample a box-filtered level, which anti-aliases where the reference
    aliases (documented deviation).
    """
    s = patch_size
    k = H.shape[0]
    win = _WARP_WIN
    jcols = jnp.arange(win, dtype=jnp.float32)
    windows, ux, uy, bad = _warp_setup(pyramid, H, quads, patch_size)

    # Separable bilinear weights: (K, S2, win) each.  bf16 halves the HBM
    # traffic of the weight tensors (the matmul itself is tiny); weight
    # quantization error <= 2^-8 on [0,1] is far below the Otsu margin.
    wx = jnp.maximum(0.0, 1.0 - jnp.abs(ux[..., None] - jcols)).astype(
        jnp.bfloat16
    )
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(uy[..., None] - jcols)).astype(
        jnp.bfloat16
    )

    # T[k, s, y] = sum_x wx[k, s, x] * windows[k, y, x].  Keep T in bf16:
    # it is the single largest intermediate (K, S^2, 64) and the weighted
    # row-sum accumulates in f32 anyway.
    t = jnp.einsum(
        "ksx,kyx->ksy",
        wx,
        windows.astype(jnp.bfloat16),
        preferred_element_type=jnp.bfloat16,
    )
    vals = jnp.einsum(
        "ksy,ksy->ks", wy, t, preferred_element_type=jnp.float32
    )  # (K, S2)

    # Out-of-image samples land in the zero padding of the pyramid levels
    # (black, the reference default); degenerate homographies are masked.
    vals = jnp.where(bad, 0.0, vals)
    return vals.reshape(k, s, s)


def warp_patches_pallas(
    pyramid: list[jnp.ndarray],
    H: jnp.ndarray,
    quads: jnp.ndarray,
    patch_size: int,
) -> jnp.ndarray:
    """Same warp as warp_patches_mxu but evaluated by the Pallas kernel
    (ops.warp_pallas.warp_eval): the bilinear weight planes never touch
    HBM.  Numerics match warp_patches_mxu to bf16 rounding."""
    from .ops.warp_pallas import warp_eval

    s = patch_size
    k = H.shape[0]
    windows, ux, uy, bad = _warp_setup(pyramid, H, quads, patch_size)
    vals = warp_eval(windows, ux, uy)
    vals = jnp.where(bad, 0.0, vals)
    return vals.reshape(k, s, s)


# --------------------------------------------------------------------------
# Bilinear patch warp — Pallas DMA path (batched; windows never hit HBM)
# --------------------------------------------------------------------------
def pyramid_level_shapes(h: int, w: int, levels: int):
    """Padded (ph, pw) per pyramid level — the pure-int twin of
    build_pyramid/build_packed_pyramid's padding math (pad to even first,
    then clamp to the 64-px warp window)."""
    out = []
    for _ in range(levels):
        ph = max(h + (h % 2), _WARP_WIN)
        pw = max(w + (w % 2), _WARP_WIN)
        out.append((ph, pw))
        h, w = ph // 2, pw // 2
    return out


def build_packed_pyramid(
    grey: jnp.ndarray,
    levels: int,
    skip_level0: bool = False,
    level1: jnp.ndarray | None = None,
    skip_level1: bool = False,
):
    """(B, H, W) u8 -> one bf16 canvas with pyramid levels stacked.

    Level semantics match build_pyramid exactly (pad to >=64/even, 2x2 box
    mean).  16 zero rows separate levels and >=192 zero lanes pad the
    right edge so the warp kernel's aligned (80, 256) window DMAs can
    never read another level's pixels (zeros == the black default).

    With ``skip_level0`` the canvas holds levels >= 1 only (level-0
    windows DMA straight from the frontend's padded u8 grey canvas — see
    ops.warp_gather): the full-resolution level is ~75% of the canvas
    bytes, so skipping its cast/pad/concat removes most of the canvas
    assembly traffic.  ``offsets[0]`` is then a dead placeholder.

    With ``level1`` (requires skip_level0) the caller supplies pyramid
    level 1 precomputed — the fused frontend kernel emits it
    bit-identically (ops.frontend_pallas emit_level1) — so this function
    never touches the full-resolution image: levels >= 2 pool down from
    the supplied plane.  ``level1`` may be larger than the true level-1
    size (zero-padded); it is cropped here.

    Returns (canvas (B, Hcan, Wcan) bf16, row_offsets, level_shapes).
    """
    b, h, w = grey.shape
    img = grey.astype(jnp.bfloat16)
    if skip_level1:
        # Level-1 windows DMA straight from the supplied level-1 plane
        # (ops.warp_gather source 2): the canvas starts at level 2.
        assert level1 is not None, "skip_level1 requires the level1 plane"
    if level1 is not None:
        assert skip_level0, "level1 shortcut only valid when skipping L0"
        ph0 = max(h + (h % 2), _WARP_WIN)
        pw0 = max(w + (w % 2), _WARP_WIN)
        img = level1[:, : ph0 // 2, : pw0 // 2]
    padded_levels = []
    shapes = []
    for lvl in range(levels):
        if lvl == 0 and level1 is not None:
            # Level 0 is external; record its padded shape only.
            padded_levels.append(None)
            shapes.append((ph0, pw0))
            continue
        hh, ww = img.shape[1], img.shape[2]
        # Even-first padding (see build_pyramid): keeps ph/pw even for any
        # level size, including odd sizes below the window (720p level 4).
        ph = max(hh + (hh % 2), _WARP_WIN)
        pw = max(ww + (ww % 2), _WARP_WIN)
        padded = jnp.pad(img, ((0, 0), (0, ph - hh), (0, pw - ww)))
        padded_levels.append(padded)
        shapes.append((ph, pw))
        # 2x2 box means as two 2-hot MXU matmuls (strided slices and
        # reshape-sums both lower poorly on TPU).  bf16 inputs with f32
        # accumulation: <=0.25 grey rounding per level — far below the
        # Otsu margin downstream.
        rsel = np.zeros((ph // 2, ph), np.float32)
        rsel[np.arange(ph) // 2, np.arange(ph)] = 1.0
        csel = np.zeros((pw, pw // 2), np.float32)
        csel[np.arange(pw), np.arange(pw) // 2] = 0.25
        r = jnp.einsum(
            "rh,bhw->brw",
            jnp.asarray(rsel, dtype=jnp.bfloat16),
            padded,
            preferred_element_type=jnp.float32,
        )
        img = jnp.einsum(
            "brw,wc->brc",
            r.astype(jnp.bfloat16),
            jnp.asarray(csel, dtype=jnp.bfloat16),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)
    start = (2 if skip_level1 else 1) if skip_level0 else 0
    if start >= levels:
        # Single-level pyramid with level 0 external: dummy canvas.
        canvas = jnp.zeros((b, 96, 128), jnp.bfloat16)
        return canvas, [0] * levels, shapes
    w0 = shapes[start][1]
    wcan = -(-w0 // 128) * 128 + 256
    rows = []
    offsets = [0] * start  # placeholder for the skipped level 0
    off = 0
    for padded, (ph, pw) in zip(padded_levels[start:], shapes[start:]):
        offsets.append(off)
        # Cast before pad/concat (halves assembly traffic) and keep every
        # level block a multiple of 16 rows so the bf16 (16, 128)-tile
        # concat needs no relayout.
        block_h = -(-(ph + 16) // 16) * 16
        rows.append(
            jnp.pad(
                padded.astype(jnp.bfloat16),
                ((0, 0), (0, block_h - ph), (0, wcan - pw)),
            )
        )
        off += block_h
    canvas = jnp.concatenate(rows, axis=1) if len(rows) > 1 else rows[0]
    hcan = off + 96
    canvas = jnp.pad(canvas, ((0, 0), (0, hcan - off), (0, 0)))
    return canvas, offsets, shapes


def build_grey_src(grey: jnp.ndarray, halo: int = 16, halo_c: int = 128):
    """Zero-padded u8 canvas with the image at (halo, halo_c) — the same
    layout the fused frontend kernel materializes for its own strip DMAs
    (ops.frontend_pallas emit_grey_canvas).  Used by tests and any caller
    that wants the level-0-from-u8 warp without the fused frontend.
    Sized so every aligned (72, 256) level-0 window DMA stays in bounds.
    """
    b, h, w = grey.shape
    rows = halo + -(-h // 8) * 8 + 80
    cols = halo_c + -(-w // 128) * 128 + 256
    src = jnp.zeros((b, rows, cols), jnp.uint8)
    return jax.lax.dynamic_update_slice(src, grey, (0, halo, halo_c))


def l1_direct_ok(
    l1_shape: tuple[int, int], shapes, levels: int
) -> bool:
    """True when the emitted level-1 plane's padding admits the warp
    kernel's aligned (80, 256) window DMAs for every clamped level-1
    window base (ops.warp_gather source 2).  All-static geometry.
    """
    if levels < 2:
        return False
    h1p, w1p = l1_shape
    hl, wl = shapes[1]
    win = _WARP_WIN
    if w1p < 256:
        return False
    s64max = max(((wl - win) // 64) * 64, 0)
    if s64max - (w1p - 256) > 128:  # window must start within the buffer
        return False
    if ((hl - win) // 16) * 16 + 80 > h1p:
        return False
    return True


def warp_patches_dma(
    canvas: jnp.ndarray,
    offsets: list[int],
    shapes: list[tuple[int, int]],
    H: jnp.ndarray,  # (B, K, 3, 3)
    quads: jnp.ndarray,  # (B, K, 4, 2)
    patch_size: int,
    valid: jnp.ndarray | None = None,  # (B, K) lane validity
    interpret: bool = False,
    src: jnp.ndarray | None = None,  # (B, Hs, Ws) u8 level-0 source
    src_halo: tuple[int, int] = (16, 128),
    image_hw: tuple[int, int] | None = None,
    l1_plane: jnp.ndarray | None = None,  # (B, H1, W1) bf16 level-1 source
    raw_src: bool = False,  # src is the RAW unpadded (B, H, W) frame
    fuse_decode_mark: int = 0,  # >0: fused in-kernel decode to an
    #   (m, m) cell grid (m = the dictionary mark size); returns
    #   (patches, grids) with grids (B, K, 128) — see decode_grids.
) -> jnp.ndarray:
    """Batched warp via the Pallas window-DMA kernel (ops.warp_gather).

    Same sampling semantics as warp_patches_mxu (per-candidate pyramid
    level, bilinear separable weights, black outside); numerics match to
    bf16 rounding.

    When ``src`` is given (the frontend's u8 image-masked grey plane
    (emit_split), a padded u8 grey canvas, or the int16 packed
    refinement plane whose bits 0-7 are the image-masked grey; image
    at ``src_halo``, ``image_hw`` true dims) level-0 windows DMA from
    it directly and ``canvas`` must have been built with skip_level0 —
    the full-resolution level never exists in bf16.

    When ``l1_plane`` is additionally given (the fused frontend's
    emitted level-1 plane, zero-padded; see l1_direct_ok for the
    geometry precondition) level-1 windows DMA from it directly and
    ``canvas`` must have been built with skip_level1 — the canvas then
    never carries a half-resolution level either.  Window bases are
    clamped into the plane; the kernel's 3-position half-shift absorbs
    the clamp.
    """
    from .ops.warp_gather import warp_gather_eval

    b, k = H.shape[0], H.shape[1]
    s = patch_size
    levels = len(shapes)
    win = _WARP_WIN
    use_src = src is not None

    ys, xs = jnp.meshgrid(
        jnp.arange(s, dtype=jnp.float32),
        jnp.arange(s, dtype=jnp.float32),
        indexing="ij",
    )
    pix = jnp.stack([xs, ys, jnp.ones_like(xs)], axis=-1).reshape(-1, 3)
    smpl = jnp.einsum("bkij,pj->bkpi", H, pix, precision=_HIGHEST)
    wdiv = smpl[..., 2]
    wsafe = jnp.where(jnp.abs(wdiv) < 1e-12, 1.0, wdiv)
    sx = smpl[..., 0] / wsafe  # (B, K, S2) image coords
    sy = smpl[..., 1] / wsafe
    bad = jnp.abs(wdiv) < 1e-12

    bmin = jnp.min(quads, axis=-2)
    bmax = jnp.max(quads, axis=-2)
    side = jnp.max(bmax - bmin, axis=-1) + 4.0
    lvl = jnp.clip(
        jnp.ceil(jnp.log2(jnp.maximum(side / (win - 4.0), 1e-3))),
        0,
        levels - 1,
    ).astype(jnp.int32)
    center = (bmin + bmax) * 0.5

    all_ty, all_tx, all_ux, all_uy, all_roff = [], [], [], [], []
    use_l1 = l1_plane is not None
    if use_l1:
        assert use_src, "l1_plane routing requires the src path"
    for level in range(levels):
        if level == 0 and use_src:
            # Level-0 windows address the u8 src in IMAGE coordinates;
            # the halo offsets are applied after level selection.
            hl, wl = image_hw
            hl, wl = max(hl, win), max(wl, win)
        else:
            hl, wl = shapes[level]
        scale = float(2**level)
        cl = (center + 0.5) / scale - 0.5
        tlx = jnp.clip(
            jnp.round(cl[..., 0]).astype(jnp.int32) - win // 2, 0, wl - win
        )
        tly = jnp.clip(
            jnp.round(cl[..., 1]).astype(jnp.int32) - win // 2, 0, hl - win
        )
        direct = (level == 0 and use_src) or (level == 1 and use_l1)
        # Row offsets stay INTEGER and are applied to the aligned window
        # base only (they are multiples of 16): adding them to the f32
        # sample coords and subtracting them back would round the low
        # mantissa bits of uy.
        all_roff.append(0 if direct else offsets[level])
        all_ux.append((sx + 0.5) / scale - 0.5)
        all_uy.append((sy + 0.5) / scale - 0.5)
        all_tx.append(tlx)
        all_ty.append(tly)

    def sel(stack, zero=0):
        return sum(
            jnp.where(
                (lvl == level)[..., None]
                if stack[0].ndim == 3
                else lvl == level,
                stack[level],
                zero,
            )
            for level in range(levels)
        )

    ty = sel(all_ty)  # (B, K) level rows
    tx = sel(all_tx)
    uxl = sel(all_ux, 0.0)  # (B, K, S2) level coords
    uyl = sel(all_uy, 0.0)
    roff = sum(
        jnp.where(lvl == level, jnp.int32(all_roff[level]), 0)
        for level in range(levels)
    )  # (B, K) canvas row offset of each window's level

    s64 = (tx // 64) * 64
    bxl = (s64 // 128) * 128
    if raw_src:
        # RAW level-0 source (no padded plane exists): clamp the DMA
        # base so the (72, 256) read stays inside the frame; the true
        # 64-lane window still fits a 128-lane sub-block at half <= 2,
        # and the sample coords absorb the shifted start.  Requires
        # H >= 72, W >= 256 (the detector gates on this).
        assert use_src and src_halo == (0, 0)
        hl0, wl0 = image_hw
        is0r = lvl == 0
        bxl = jnp.where(
            is0r, jnp.minimum(bxl, max(wl0 - 256, 0)), bxl
        )
    if use_l1:
        # Level-1 bases clamp into the l1 plane (it can be up to 128
        # lanes narrower than an in-bounds 128-aligned base needs); the
        # 64-lane window then starts at buffer offset 0, 64 or 128.
        is1 = lvl == 1
        bxl = jnp.where(
            is1, jnp.minimum(bxl, l1_plane.shape[2] - 256), bxl
        )
    # half=3 only arises from the raw-src level-0 clamp; the 64-wide
    # window then still fits the half-2 sub-block (offset folded into
    # the sample coords via ``start``).
    half = jnp.minimum((s64 - bxl) // 64, 2)
    start = bxl + 64 * half
    ux_rel = uxl - start[..., None].astype(jnp.float32)
    if use_src:
        halo_r, halo_c = src_halo
        is0 = lvl == 0
        al0 = 16 if src.dtype == jnp.int16 else 8  # source row alignment
        by_img = (ty // al0) * al0
        if raw_src:
            by_img = jnp.minimum(by_img, max(((hl0 - 72) // 8) * 8, 0))
        by_can = (ty // 16) * 16  # bf16 rows align to 16
        by_rel = jnp.where(is0, by_img, by_can)
        by = by_rel + jnp.where(is0, halo_r, roff)
        bx = jnp.where(is0, halo_c + bxl, bxl)
        uy_rel = uyl - by_rel[..., None].astype(jnp.float32)
        srcsel = is0.astype(jnp.int32)
        if use_l1:
            srcsel = srcsel + 2 * is1.astype(jnp.int32)
    else:
        by_rel = (ty // 16) * 16
        by = by_rel + roff
        bx = bxl
        uy_rel = uyl - by_rel[..., None].astype(jnp.float32)
        srcsel = jnp.zeros((b, k), jnp.int32)
        src = jnp.zeros((b, 80, 256), jnp.uint8)  # dead operand

    n = b * k
    s2 = s * s
    bidx = jnp.repeat(jnp.arange(b, dtype=jnp.int32), k)
    if valid is None:
        valid = jnp.ones((b, k), dtype=bool)
    if l1_plane is None:
        l1_plane = jnp.zeros((b, 80, 256), jnp.bfloat16)  # dead operand
    fuse = fuse_decode_mark > 0
    if fuse:
        # Degenerate-homography samples must read as 0 INSIDE the
        # kernel (the XLA path zeroes them after the fact): an ux of
        # -1e6 zeroes every bilinear weight, so the kernel's sample —
        # and its fused decode — sees exactly the masked value.
        ux_rel = jnp.where(bad, jnp.float32(-1e6), ux_rel)
        w1, w2 = _decode_resize_ops(s, fuse_decode_mark)
        out = warp_gather_eval(
            canvas,
            src,
            l1_plane,
            bidx,
            by.reshape(n),
            bx.reshape(n),
            half.reshape(n),
            srcsel.reshape(n),
            valid.reshape(n),
            ux_rel.reshape(n, s2),
            uy_rel.reshape(n, s2),
            w1=jnp.asarray(w1),
            w2=jnp.asarray(w2),
            interpret=interpret,
            decode_n=s2,
        )
        vals, grids = out
    else:
        vals = warp_gather_eval(
            canvas,
            src,
            l1_plane,
            bidx,
            by.reshape(n),
            bx.reshape(n),
            half.reshape(n),
            srcsel.reshape(n),
            valid.reshape(n),
            ux_rel.reshape(n, s2),
            uy_rel.reshape(n, s2),
            interpret=interpret,
        )
    # Invalid lanes skipped their window DMA (garbage) — zero them, like
    # degenerate-homography samples.
    keep = valid.reshape(n, 1) & ~bad.reshape(n, s2)
    vals = jnp.where(keep, vals, 0.0)
    patches = vals.reshape(b, k, s, s)
    if fuse:
        grids = jnp.where(
            valid.reshape(n, 1), grids, 0.0
        ).reshape(b, k, 128)
        return patches, grids
    return patches


# --------------------------------------------------------------------------
# Bilinear patch warp — gather path (portable oracle)
# --------------------------------------------------------------------------
def warp_patches(
    grey: jnp.ndarray, H: jnp.ndarray, patch_size: int
) -> jnp.ndarray:
    """Sample SxS patches from ``grey`` through per-candidate homographies.

    grey: (Him, Wim) uint8; H: (K, 3, 3) mapping patch coords -> image coords.
    Returns (K, S, S) float32 in [0, 255]; out-of-bounds samples are 0
    (the reference's black default, aruco.rs:253).
    """
    him, wim = grey.shape
    s = patch_size
    ys, xs = jnp.meshgrid(
        jnp.arange(s, dtype=jnp.float32),
        jnp.arange(s, dtype=jnp.float32),
        indexing="ij",
    )
    ones = jnp.ones_like(xs)
    pix = jnp.stack([xs, ys, ones], axis=-1).reshape(-1, 3)  # (S*S, 3)

    src = jnp.einsum(
        "kij,pj->kpi", H, pix, precision=_HIGHEST
    )  # (K, S*S, 3)
    w = src[..., 2]
    wsafe = jnp.where(jnp.abs(w) < 1e-12, 1.0, w)
    sxp = src[..., 0] / wsafe
    syp = src[..., 1] / wsafe

    inb = (
        (sxp >= 0.0)
        & (sxp <= wim - 1.0)
        & (syp >= 0.0)
        & (syp <= him - 1.0)
        & (jnp.abs(w) >= 1e-12)
    )
    x0 = jnp.clip(jnp.floor(sxp), 0, wim - 1)
    y0 = jnp.clip(jnp.floor(syp), 0, him - 1)
    fx = sxp - x0
    fy = syp - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    x1i = jnp.minimum(x0i + 1, wim - 1)
    y1i = jnp.minimum(y0i + 1, him - 1)

    g = grey.astype(jnp.float32)
    flat = g.reshape(-1)
    gather = lambda yy, xx: flat[(yy * wim + xx).reshape(-1)].reshape(  # noqa: E731
        yy.shape
    )
    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x1i)
    v10 = gather(y1i, x0i)
    v11 = gather(y1i, x1i)
    top = v00 * (1.0 - fx) + v01 * fx
    bot = v10 * (1.0 - fx) + v11 * fx
    vals = top * (1.0 - fy) + bot * fy
    vals = jnp.where(inb, vals, 0.0)
    return vals.reshape(H.shape[0], s, s)


# --------------------------------------------------------------------------
# Otsu threshold per patch
# --------------------------------------------------------------------------
def otsu_level(patches: jnp.ndarray) -> jnp.ndarray:
    """Per-patch Otsu threshold level (K,), from (K, S, S) values in [0,255].

    Standard between-class-variance maximisation over 256 bins (imageproc
    ``otsu_level`` semantics, used at reference aruco.rs:264); ties resolve
    to the lowest level.
    """
    k = patches.shape[0]
    vals = jnp.clip(jnp.round(patches), 0, 255).astype(jnp.int32)
    vals = vals.reshape(k, -1)
    n = vals.shape[1]
    # Histogram via a hi/lo-nibble outer product on the MXU: hist[h, l] =
    # #pixels with value h*16+l = <hi one-hot, lo one-hot> contracted over
    # pixels.  Exact: one-hot entries are 0/1 (exact in bf16) and the f32
    # accumulator sums <= S^2 ones.  The naive (K, S^2, 256) compare-
    # reduce was the decode stage's dominant cost (~10 ms at batch 128).
    nib = jnp.arange(16, dtype=jnp.int32)
    hi = ((vals[:, :, None] >> 4) == nib).astype(jnp.bfloat16)  # (K, N, 16)
    lo = ((vals[:, :, None] & 15) == nib).astype(jnp.bfloat16)
    hist = jnp.einsum(
        "knh,knl->khl", hi, lo, preferred_element_type=jnp.float32
    ).reshape(k, 256)

    # INTEGER-EXACT formulation, kept expression-identical to the warp
    # kernel's fused-decode epilogue (ops.warp_gather): W (class-0
    # counts) and M (class-0 value sums) are exact integers in f32
    # (cumsums of integers < 2^24 are associativity-independent), and
    # the unnormalized between-class score
    #   f(t) = (MT*W - M*n)^2 / (W*(n - W))  ==  n^2 * sigma_b^2(t)
    # shares its argmax with imageproc's sigma_b^2.  Evaluating the
    # SAME expression from the SAME exact integers on both paths makes
    # flat-histogram near-ties (noise windows) resolve identically —
    # the normalized-float version diverged from the kernel on ~1e-7
    # relative rounding and flipped levels on noise plateaus.
    binsf = jnp.arange(256, dtype=jnp.float32)
    nf = jnp.float32(n)
    w_ = jnp.cumsum(hist, axis=-1)  # class 0 = values <= t
    m_ = jnp.cumsum(hist * binsf, axis=-1)
    mt = m_[:, -1:]
    den = w_ * (nf - w_)
    num = mt * w_ - m_ * nf
    sigma = jnp.where(den > 0.0, (num * num) / den, -1.0)
    return jnp.argmax(sigma, axis=-1).astype(jnp.int32)


# --------------------------------------------------------------------------
# Triangle-filter resize as a matmul
# --------------------------------------------------------------------------
@functools.lru_cache(maxsize=None)
def _triangle_resize_matrix(src: int, dst: int) -> np.ndarray:
    """(dst, src) row-stochastic Triangle (bilinear) resampling matrix with
    image-crate semantics: centers at (i+0.5), support scaled by the
    downscale ratio, weights normalised per output pixel.

    Crate pin (image 0.25, src/imageops/sample.rs: Triangle filter kernel
    w(t) = max(0, 1-|t|) with support 1.0, evaluated at t = (i+0.5 -
    center)/scale where scale = max(src/dst, 1), weights normalised over
    the clamped support window).  Checkable via
    tests/golden/triangle_resize.json + rust_validation (raw values to
    the crate's u8 rounding; the pipeline's binarized-input bit reads
    exactly)."""
    ratio = src / dst
    scale = max(ratio, 1.0)
    support = 1.0 * scale
    L = np.zeros((dst, src), dtype=np.float32)
    for o in range(dst):
        center = (o + 0.5) * ratio
        lo = int(np.floor(center - support))
        hi = int(np.ceil(center + support))
        lo = max(lo, 0)
        hi = min(hi, src - 1)
        for i in range(lo, hi + 1):
            t = abs((i + 0.5 - center) / scale)
            w = max(0.0, 1.0 - t)
            L[o, i] = w
        srow = L[o].sum()
        if srow > 0:
            L[o] /= srow
    return L


def resize_triangle(patches: jnp.ndarray, dst: int) -> jnp.ndarray:
    """(K, S, S) -> (K, dst, dst) separable Triangle resize via two matmuls
    (MXU path), matching image::imageops::resize FilterType::Triangle as
    used at reference aruco.rs:273."""
    src = patches.shape[-1]
    L = jnp.asarray(_triangle_resize_matrix(src, dst))
    out = jnp.einsum(
        "oi,kij->koj", L, patches, precision=_HIGHEST
    )
    out = jnp.einsum(
        "koj,pj->kop", out, L, precision=_HIGHEST
    )
    return out


# --------------------------------------------------------------------------
# Bit extraction
# --------------------------------------------------------------------------
@functools.lru_cache(maxsize=None)
def _decode_resize_ops(s: int, mark_size: int) -> tuple:
    """Host-built flattened Triangle-resize operators for the fused
    in-kernel decode (ops.warp_gather decode epilogue).

    Samples live flattened in lanes (index y*s + x, zero-padded to a
    128-multiple); the separable resize then factors into two matmuls:
      W1[(y*s + x), (yo*s + x)] = L[yo, y]   (contract rows)
      W2[(yo*s + x), (yo*m + xo)] = L[xo, x] (contract columns)
    — each output element sums exactly the terms the XLA
    resize_triangle einsums sum (padding rows/cols are zero).
    """
    m = mark_size
    s2 = s * s
    s2p = -(-s2 // 128) * 128
    r1 = -(-(m * s) // 128) * 128
    L = _triangle_resize_matrix(s, m)
    w1 = np.zeros((s2p, r1), np.float32)
    w2 = np.zeros((r1, 128), np.float32)
    for yo in range(m):
        for y in range(s):
            ly = L[yo, y]
            if ly == 0.0:
                continue
            for x in range(s):
                w1[y * s + x, yo * s + x] = ly
    for yo in range(m):
        for xo in range(m):
            for x in range(s):
                lx = L[xo, x]
                if lx != 0.0:
                    w2[yo * s + x, yo * m + xo] = lx
    return w1, w2


def decode_grids(
    grids: jnp.ndarray, mark_size: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fused-decode tail: (K, 128) kernel cell grids (lane yo*m+xo =
    1.0 for a white cell) -> the same (bits, valid) as decode_patches
    (border gate, 4 CCW rotations, MSB-first read)."""
    k = grids.shape[0]
    m = mark_size
    grid = grids[:, : m * m].reshape(k, m, m) > 0.5
    return _grid_tail(grid, m)


def decode_patches(
    patches: jnp.ndarray, mark_size: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Patches -> 4-rotation LSB-indexed bit vectors + border validity.

    patches: (K, S, S) float32 grays in [0, 255].
    Returns:
      bits:  (K, 4, num_bits) int32 in {0, 1}; rotation r is the marker
             grid rotated r*90 degrees CCW (reference aruco.rs:296-326),
             bit i = LSB i of the decoded u64 (MSB-first grid read).
      valid: (K,) bool — False when any border cell is white
             (reference aruco.rs:288-292).
    """
    levels = otsu_level(patches)  # (K,)
    binar = jnp.where(
        patches > levels[:, None, None].astype(jnp.float32), 255.0, 0.0
    )
    reduced = resize_triangle(binar, mark_size)  # (K, m, m)
    grid = reduced > 127.0  # True == white cell (reference aruco.rs:283)
    return _grid_tail(grid, mark_size)


def _grid_tail(
    grid: jnp.ndarray, mark_size: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(K, m, m) bool white-cell grid -> (bits, border valid); shared by
    the XLA and fused-kernel decode paths."""
    k = grid.shape[0]
    border = jnp.concatenate(
        [
            grid[:, 0, :],
            grid[:, -1, :],
            grid[:, :, 0],
            grid[:, :, -1],
        ],
        axis=-1,
    )
    valid = ~jnp.any(border, axis=-1)

    inner = grid[:, 1:-1, 1:-1]  # (K, m-2, m-2)
    rots = jnp.stack(
        [jnp.rot90(inner, r, axes=(1, 2)) for r in range(4)], axis=1
    )  # (K, 4, m-2, m-2)
    nb = (mark_size - 2) * (mark_size - 2)
    flat = rots.reshape(k, 4, nb)
    # MSB-first read: grid cell p lands at code bit (nb-1-p); our bit
    # vectors are LSB-indexed, so reverse the flattened grid.
    bits = flat[:, :, ::-1].astype(jnp.int32)
    return bits, valid


def bits_to_u32_pairs(bits: jnp.ndarray) -> jnp.ndarray:
    """(..., num_bits) {0,1} -> (..., 2) uint32 (lo, hi) code words."""
    nb = bits.shape[-1]
    idx = np.arange(nb)
    lo_w = jnp.asarray(
        np.where(idx < 32, 1 << (idx % 32), 0).astype(np.uint32)
    )
    hi_w = jnp.asarray(
        np.where(idx >= 32, 1 << (idx % 32), 0).astype(np.uint32)
    )
    b = bits.astype(jnp.uint32)
    lo = jnp.sum(b * lo_w, axis=-1, dtype=jnp.uint32)
    hi = jnp.sum(b * hi_w, axis=-1, dtype=jnp.uint32)
    return jnp.stack([lo, hi], axis=-1)
