"""Detector — the end-to-end ArUco/AprilTag pipeline as one XLA program.

Capability parity with reference src/aruco.rs:
  * ``DetectorConfig`` with the reference defaults (aruco.rs:32-43).
  * ``Detector { config, dictionary }`` and ``detect(image) -> Detection``
    (aruco.rs:46-122): grayscale -> adaptive threshold -> quad candidates ->
    clockwise corners -> near-duplicate suppression -> perspective patches ->
    Otsu binarize -> bit decode over 4 rotations -> dictionary match ->
    accept iff min distance < tau (or always when
    ``filter_high_bit_errors=False``), corners rotated so corner 0 is the
    marker's top-left (aruco.rs:96-111).
  * ``Detection`` exposes the debug intermediates the reference exposes:
    grey image, candidate quads, rectified patches, decoded markers
    (aruco.rs:15-21).

TPU-native design: the whole per-frame pipeline is a single jitted function
over fixed-capacity candidate buffers (no host round-trips between stages);
``detect_batch`` vmaps it over a frame batch and is the unit that
``parallel.sharding`` distributes over a TPU mesh.  Host-facing ``detect``
is a thin adapter that feeds one frame through the same compiled program
and materialises reference-shaped Python objects.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field, replace

import jax
import jax.numpy as jnp
import numpy as np

from . import frontend, rectify, segment
from .dictionaries import ARDictionary


@dataclass(frozen=True)
class DetectorConfig:
    """Detection tunables; defaults match reference aruco.rs:32-43.

    The reference's contour_simplification_epsilon controls RDP polygon
    simplification (aruco.rs:133), i.e. how far a contour may deviate from
    a 4-vertex polygon and still count as a quad.  The data-parallel
    fitter's analogue of that gate is the containment test (is the
    component well-covered by its fitted quad), so epsilon scales the
    containment slack: larger epsilon accepts blobbier components, exactly
    as a larger RDP epsilon would.  TPU-specific capacity/precision knobs
    live here too so a config fully determines the compiled program.
    """

    threshold_window: int = 7
    contour_simplification_epsilon: float = 0.05  # kept for API parity
    min_side_length_factor: float = 0.2
    min_corner_separation_factor: float = 0.1
    homography_sample_size: int = 49
    filter_high_bit_errors: bool = True
    # --- TPU pipeline capacity/behaviour knobs (not in the reference) ---
    max_candidates: int = 32
    max_inner_candidates: int = 12  # hole-border pass lanes (0 disables)
    coarse_factor: int | None = None  # None = auto from image size
    ccl_rounds: int = 3  # see segment.QuadParams.ccl_rounds
    refine_corners: bool = True
    warp_impl: str = "mxu"  # "mxu" (pyramid+matmul) | "gather" (oracle)
    # Kernel-path selection: "auto" picks the Pallas kernels on TPU and
    # XLA elsewhere; "never" forces the pure-XLA oracle path; "always"
    # forces the Pallas kernels even off-TPU (bench/exactness A/Bs).
    use_pallas: str = "auto"  # "auto" | "never" | "always"


@dataclass
class Marker:
    """Decoded marker (reference aruco.rs:7-13): ``id`` indexes the
    dictionary, ``code`` is the raw uncorrected read, corners are clockwise
    pixel coords starting at the marker's top-left."""

    id: int
    code: int
    corners: list[tuple[int, int]]
    hamming_distance: int


@dataclass
class Detection:
    """Host-side pipeline output incl. debug intermediates
    (reference aruco.rs:15-21).  ``stats`` carries the per-stage rejection
    counters the reference prints in debug builds (aruco.rs:125-127)."""

    grey: np.ndarray | None = None
    candidates: list = field(default_factory=list)
    homographies: list = field(default_factory=list)
    markers: list[Marker] = field(default_factory=list)
    stats: dict = field(default_factory=dict)


class Detector:
    """detect() orchestrator (reference aruco.rs:46-122)."""

    def __init__(
        self,
        config: DetectorConfig | None = None,
        dictionary: ARDictionary | None = None,
    ):
        self.config = config or DetectorConfig()
        self.dictionary = dictionary or ARDictionary.new_from_named_dict(
            "ARUCO_DEFAULT"
        )

    # ---------------------------------------------------------------- jit
    # NOTE: lru_cache on a method keys on `self`, so the cache holds a
    # strong reference to up to 32 Detector instances (and their
    # compiled programs).  Harmless for the intended long-lived-detector
    # usage; in a service that churns Detector objects, reuse instances
    # or call Detector._compiled.cache_clear() when discarding them.
    @functools.lru_cache(maxsize=32)
    def _compiled(self, height: int, width: int, channels: int):
        """Compile the batched frame pipeline for a static image shape.

        The returned jitted fn takes (B, H, W[, C]) uint8 (any B; retraced
        per batch size).
        """
        cfg = self.config
        dictionary = self.dictionary
        ds = cfg.coarse_factor or segment.choose_coarse_factor(height, width)
        # Map the reference's RDP epsilon onto the containment gate (see
        # DetectorConfig docstring): ratio 1.0 at the reference default.
        eps_scale = cfg.contour_simplification_epsilon / 0.05
        base = segment.QuadParams()
        params = segment.QuadParams(
            max_candidates=cfg.max_candidates,
            max_inner_candidates=cfg.max_inner_candidates,
            coarse_factor=ds,
            ccl_rounds=cfg.ccl_rounds,
            refine=cfg.refine_corners,
            containment_slack=base.containment_slack * eps_scale,
            min_containment=min(
                0.999, base.min_containment / max(eps_scale, 1e-6)
            ),
        )
        min_edge = min(width, height) * cfg.min_side_length_factor
        min_sep = min(width, height) * cfg.min_corner_separation_factor

        def pipeline(images: jnp.ndarray):
            return detect_batch_arrays(
                images,
                dictionary,
                cfg,
                params,
                min_edge,
                min_sep,
                ds,
            )

        return jax.jit(pipeline)

    # --------------------------------------------------------------- host
    def detect(self, image) -> Detection:
        """Single host image -> reference-shaped ``Detection``.

        Accepts (H, W) gray, (H, W, 3) RGB or (H, W, 4) RGBA uint8 arrays
        (anything np.asarray-able, e.g. PIL images).
        """
        arr = np.asarray(image)
        if arr.dtype != np.uint8:
            arr = np.clip(arr, 0, 255).astype(np.uint8)
        channels = 1 if arr.ndim == 2 else arr.shape[-1]
        fn = self._compiled(arr.shape[0], arr.shape[1], channels)
        out = jax.device_get(fn(jnp.asarray(arr)[None]))
        return self._to_host(jax.tree_util.tree_map(lambda x: x[0], out))

    def detect_batch(self, images: jnp.ndarray):
        """(B, H, W[, C]) uint8 frames -> batched device-side results.

        Stays on device (no host sync); fields carry a leading batch axis.
        """
        h, w = images.shape[1], images.shape[2]
        channels = 1 if images.ndim == 3 else images.shape[-1]
        fn = self._compiled(h, w, channels)
        return fn(images)

    def _to_host(self, out) -> Detection:
        quads = np.asarray(out["quads"])
        quad_valid = np.asarray(out["quad_valid"])
        patches = np.asarray(out["patches"])
        det = Detection(
            grey=np.asarray(out["grey"]),
            stats={k: int(v) for k, v in out.get("stats", {}).items()},
        )
        marker_valid = np.asarray(out["marker_valid"])
        ids = np.asarray(out["marker_id"])
        dists = np.asarray(out["marker_dist"])
        code_pairs = np.asarray(out["marker_code"])
        corners = np.asarray(out["marker_corners"])
        for k in range(quads.shape[0]):
            if not quad_valid[k]:
                continue
            det.candidates.append(
                [(float(x), float(y)) for x, y in quads[k]]
            )
            det.homographies.append(
                np.clip(np.round(patches[k]), 0, 255).astype(np.uint8)
            )
            if marker_valid[k]:
                code = int(code_pairs[k, 0]) | (int(code_pairs[k, 1]) << 32)
                det.markers.append(
                    Marker(
                        id=int(ids[k]),
                        code=code,
                        corners=[
                            (int(round(float(x))), int(round(float(y))))
                            for x, y in corners[k]
                        ],
                        hamming_distance=int(dists[k]),
                    )
                )
        return det


# --------------------------------------------------------------------------
# The jitted frame pipeline (pure function of arrays + static config)
# --------------------------------------------------------------------------
def _use_pallas(cfg: DetectorConfig) -> bool:
    """Pallas frontend on TPU-like backends; XLA path on CPU / when off.

    The frontend kernel column-tiles, so arbitrary widths (4K+) stay on
    the Pallas path within the VMEM budget.
    """
    if cfg.use_pallas == "never":
        return False
    if cfg.use_pallas == "always":
        return True
    return jax.default_backend() not in ("cpu",)


def detect_batch_arrays(
    images: jnp.ndarray,
    dictionary: ARDictionary,
    cfg: DetectorConfig,
    params: segment.QuadParams,
    min_edge: float,
    min_sep: float,
    ds: int,
):
    """Batched detect pipeline: (B, H, W[, C]) u8 -> batched outputs.

    The frontend (threshold+open+pool) runs either as the fused Pallas
    kernel (TPU) or the XLA reference path (CPU/tests) — bit-identical.
    The per-frame tail (fill/CCL/fit/refine/warp/decode/match) is vmapped.
    """
    grey = frontend.rgb_to_luma_u8(images)  # (B, H, W)

    use_pallas = _use_pallas(cfg)
    pallas_refine = use_pallas and params.refine and ds > 1
    if use_pallas:
        from .ops.frontend_pallas import fused_threshold_open_pool

        if pallas_refine:
            # No u8 grey canvas: warp level-0 windows read the packed
            # plane directly, so the pipeline's second-largest write
            # never exists.  SPLIT mode (whenever the strip geometry
            # admits it — see split_strip_rows): the "packed plane" is
            # a plain u8 image-masked grey plane plus a 32-rows-per-
            # int32-word near-mask sideband — ~44% of the int16
            # plane's bytes on the frontend write AND the refine
            # kernel's whole-plane stream.  min_rows = the deepest
            # aligned row any consumer DMAs: refine windows, warp
            # level-0 windows, and the level-1 plane's own windows —
            # the frontend then pads with the fewest zero strips that
            # cover it instead of a blanket extra strip.
            from .ops.frontend_pallas import split_strip_rows

            h, w = grey.shape[1], grey.shape[2]
            wn = segment.refine_window_size(params, ds)
            th_split = split_strip_rows(ds)
            al_r = 32 if th_split else 16  # refine window row alignment
            al_w = 8 if th_split else 16  # warp L0 row align (u8 / i16)
            sh_r = -(-(wn + al_r - 1) // al_r) * al_r
            need_refine = (max(h - wn, 0) // al_r) * al_r + sh_r
            need_warp = ((max(h, 64) - 64) // al_w) * al_w + (
                72 if th_split else 80
            )
            ph0 = max(h + (h % 2), 64)
            h1 = max(ph0 // 2, 64)
            need_l1 = 2 * (((h1 - 64) // 16) * 16 + 80)
            # RAW-SRC mode (production geometries): the u8 grey plane —
            # the frontend's single biggest output — is never written.
            # The refine kernel DMAs each RAW frame into a padded VMEM
            # scratch itself, and warp level-0 windows DMA the raw
            # frame with clamped bases; both consume out-of-image
            # content only under masks/zero weights, so no padded HBM
            # copy needs to exist.  Requires the split sideband plus
            # clamp-friendly dims; other geometries keep the plane.
            raw_src = (
                th_split is not None
                and h % 8 == 0
                and w % 128 == 0
                and h >= 72
                and w >= 256
            )
            outs = fused_threshold_open_pool(
                grey,
                cfg.threshold_window,
                params.open_radius,
                ds,
                emit_packed=True,
                emit_level1=True,
                emit_split=th_split is not None,
                emit_split_grey=not raw_src,
                # First output = the label kernel's pre-padded coarse
                # plane, ds-pooled + thresholded in-kernel — the
                # frontend->coarse XLA glue (row-count plane round trip
                # + zeros/DUS pad) never exists.
                emit_coarse=True,
                min_rows=max(need_refine, need_warp, need_l1),
            )
            if raw_src:
                coarse, near_words, level1 = outs
                packed = grey  # consumers read the raw frame
            elif th_split is not None:
                coarse, packed, near_words, level1 = outs
            else:
                coarse, packed, level1 = outs
                near_words = None
            if not raw_src:
                # The warp kernel DMAs (72/80, 256) blocks with no
                # bounds guard; the plane's padding must cover its
                # deepest read.
                assert packed.shape[1] >= need_warp
                assert (
                    packed.shape[2]
                    >= (((max(w, 64) - 64) // 64) * 64 // 128) * 128
                    + 256
                )
        else:
            black, coarse = fused_threshold_open_pool(
                grey, cfg.threshold_window, params.open_radius, ds
            )
    else:

        def prep(g):
            white = frontend.adaptive_threshold(g, cfg.threshold_window)
            b = segment.open_mask(~white, params.open_radius)
            return b, segment.pool_black(b, ds)

        black, coarse = jax.vmap(prep)(grey)

    if pallas_refine:
        # Batched path: coarse candidate extraction is vmapped, the
        # corner refinement runs as one natively-batched Pallas kernel
        # (per-window DMAs; vmapped dynamic_slice would lower to row
        # gathers — the dominant cost of the XLA path).
        from .ops.coarse_pallas import coarse_fits_vmem, fused_fit_exact
        from .ops.refine_pallas import refine_corners_batch

        hc, wc = -(-h // ds), -(-w // ds)
        if (
            coarse_fits_vmem(hc, wc)
            and fused_fit_exact(hc, wc)
            and params.max_candidates <= 128
            and params.max_inner_candidates <= 128
        ):
            # ONE Pallas launch for segmentation + fit: the label planes
            # live and die in VMEM (no HBM round trip, no remap pass),
            # and the fit runs frame-packed — every plane op and
            # reduction serves all packed frames.  Bit-matches the
            # label_planes -> fused_fit_batch pipeline below except on
            # exact-symmetry extreme-point ties (recall-neutral).
            from .ops.fit_pallas import fused_coarsefit_batch

            fit1, fit2, ic = fused_coarsefit_batch(
                coarse,
                params,
                ds,
                params.max_candidates,
                params.max_inner_candidates,
                pre_hw=(hc, wc),
                dup_skip=True,
            )
            cand = jax.vmap(
                lambda f1, f2, icb: segment.merge_fits(
                    None, None, f1, f2, params, ds, inner_coarse=icb
                )
            )(fit1, fit2, ic)
        else:
            # Grids exceeding the mega-kernel's VMEM budget (8K+ frames
            # at small user-set coarse factors) or its bf16 exactness
            # envelope (wc > 255 / rp*cp > 32768 — e.g. portrait 1080p,
            # or 1080p at coarse_factor <= 7) take the XLA label path,
            # which is identical bit-for-bit, just slower.  The fit
            # still runs as the lane-skipping Pallas kernels.
            labels1, labels2 = jax.vmap(
                lambda c: segment.label_planes(c, params)
            )(coarse[:, :hc, :wc] != 0)
            from .ops.fit_pallas import fused_fit_batch

            fit1, fit2 = fused_fit_batch(
                labels1,
                labels2,
                ds,
                params,
                params.max_candidates,
                params.max_inner_candidates,
                dup_skip=True,
            )
            cand = jax.vmap(
                lambda lab, lab2, f1, f2: segment.merge_fits(
                    lab, lab2, f1, f2, params, ds
                )
            )(labels1, labels2, fit1, fit2)
        # The inner footprint goes to the refinement kernel at coarse
        # resolution (it upsamples per window in VMEM) — merging a
        # full-res bit plane in XLA costs a read-modify-write of the
        # whole packed plane.
        quads = refine_corners_batch(
            packed,
            cand["quads"],
            cand["centroids"],
            cand["is_inner"],
            ds,
            wn,
            inner_coarse=cand["inner_coarse"],
            image_hw=(h, w),
            valid=cand["valid"],
            near_words=near_words,
            strip_rows=th_split or 0,
            raw_src=raw_src,
        )

        def gate(q, v, sz, ov):
            return segment.finalize_quads(
                q, v, sz, ov, params, min_edge, min_sep
            )

        quads, valid, stats = jax.vmap(gate)(
            quads, cand["valid"], cand["sizes"], cand["overflow"]
        )

        # Homography + warp: batched, windows DMA'd by the warp kernel.
        # Level-0 windows read the packed int16 plane directly (grey in
        # bits 0-7, zero outside the image — the warp kernel masks off
        # the near flag); the bf16 canvas holds levels >= 1 only (75%
        # less assembly traffic).
        s = cfg.homography_sample_size
        H, h_valid = rectify.homography_square_to_quad(quads, s)
        # Level 1 comes precomputed from the frontend kernel (the strips
        # were already in VMEM there); the canvas never reads the frame.
        # When the plane's padding admits the aligned window DMAs
        # (always at production geometries), level-1 windows read it
        # directly and the canvas starts at level 2 — assembly then
        # never touches a full- or half-resolution plane.
        nlv = _num_levels(h, w)
        l1_ok = rectify.l1_direct_ok(
            level1.shape[1:], rectify.pyramid_level_shapes(h, w, nlv), nlv
        )
        canvas, offsets, shapes = rectify.build_packed_pyramid(
            grey, nlv, skip_level0=True, level1=level1, skip_level1=l1_ok
        )
        # Decode fused into the warp kernel epilogue (the samples are
        # already in VMEM there): Otsu + binarize + Triangle resize +
        # cell rule run per window in-kernel, and the decode stage's
        # XLA round trips over (B, K, S^2) sample tensors never happen.
        # The XLA decode_patches path remains for the oracle/XLA mode
        # and for mark sizes whose cell grid exceeds one 128-lane row.
        mark_size = dictionary.get_mark_size()
        fuse_mark = mark_size if mark_size * mark_size <= 128 else 0
        warped = rectify.warp_patches_dma(
            canvas,
            offsets,
            shapes,
            H,
            quads,
            s,
            valid=valid & h_valid,
            src=packed,
            src_halo=(0, 0),
            image_hw=(h, w),
            l1_plane=level1 if l1_ok else None,
            raw_src=raw_src,
            fuse_decode_mark=fuse_mark,
        )
        if fuse_mark:
            patches, grids = warped
            out = jax.vmap(
                lambda q, v, hv, p, st, g: _match_tail(
                    q, v, hv, p, st, dictionary, cfg, grids=g
                )
            )(quads, valid, h_valid, patches, stats, grids)
        else:
            patches = warped
            out = jax.vmap(
                lambda q, v, hv, p, st: _match_tail(
                    q, v, hv, p, st, dictionary, cfg
                )
            )(quads, valid, h_valid, patches, stats)
    else:

        def tail(g, b, c):
            return _detect_tail(
                g, b, c, dictionary, cfg, params, min_edge, min_sep, ds
            )

        out = jax.vmap(tail)(grey, black, coarse)
    out["grey"] = grey
    return out


def detect_arrays(
    image: jnp.ndarray,
    dictionary: ARDictionary,
    cfg: DetectorConfig,
    params: segment.QuadParams,
    min_edge: float,
    min_sep: float,
    ds: int,
):
    """Full detect pipeline for one frame; all shapes static.

    Returns a dict of device arrays with fixed candidate capacity K:
      grey (H, W) u8; quads (K, 4, 2) f32;
      quad_valid (K,) bool; patches (K, S, S) f32; marker_valid (K,) bool;
      marker_id / marker_dist / marker_rot (K,) i32; marker_code (K, 2) u32;
      marker_corners (K, 4, 2) f32 (rotated so corner 0 = marker top-left).
    """
    grey = frontend.rgb_to_luma_u8(image)
    white = frontend.adaptive_threshold(grey, cfg.threshold_window)
    black = segment.open_mask(~white, params.open_radius)
    coarse = segment.pool_black(black, ds)
    out = _detect_tail(
        grey, black, coarse, dictionary, cfg, params, min_edge, min_sep, ds
    )
    out["grey"] = grey
    return out


def _detect_tail(
    grey: jnp.ndarray,
    black: jnp.ndarray,
    coarse: jnp.ndarray,
    dictionary: ARDictionary,
    cfg: DetectorConfig,
    params: segment.QuadParams,
    min_edge: float,
    min_sep: float,
    ds: int,
):
    found = segment.find_quads_from_masks(
        black, coarse, params, min_edge, min_sep, ds, grey=grey
    )
    return _decode_tail(
        grey,
        found["quads"],
        found["valid"],
        found["stats"],
        dictionary,
        cfg,
        ds,
    )


def _num_levels(h: int, w: int) -> int:
    import math

    return max(1, int(math.ceil(math.log2(max(h, w) / 60.0))) + 1)


def _decode_tail(
    grey: jnp.ndarray,
    quads: jnp.ndarray,
    quad_valid: jnp.ndarray,
    stats: dict,
    dictionary: ARDictionary,
    cfg: DetectorConfig,
    ds: int,
):
    s = cfg.homography_sample_size
    H, h_valid = rectify.homography_square_to_quad(quads, s)
    if cfg.warp_impl == "gather":
        patches = rectify.warp_patches(grey, H, s)
    else:
        levels = _num_levels(grey.shape[0], grey.shape[1])
        pyramid = rectify.build_pyramid(grey, levels)
        patches = rectify.warp_patches_mxu(pyramid, H, quads, s)
    return _match_tail(
        quads, quad_valid, h_valid, patches, stats, dictionary, cfg
    )


def _match_tail(
    quads: jnp.ndarray,
    quad_valid: jnp.ndarray,
    h_valid: jnp.ndarray,
    patches: jnp.ndarray,
    stats: dict,
    dictionary: ARDictionary,
    cfg: DetectorConfig,
    grids: jnp.ndarray | None = None,
):
    mark_size = dictionary.get_mark_size()
    if grids is not None:
        # Cell grids decoded in the warp kernel epilogue — only the
        # rotation/border/matching tail runs here, on (K, m*m) tensors.
        bits, border_valid = rectify.decode_grids(grids, mark_size)
    else:
        bits, border_valid = rectify.decode_patches(patches, mark_size)

    # Dictionary match across 4 rotations in one MXU matmul.
    ids_r, dists_r = dictionary.find_nearest_bits(bits)  # (K, 4) each
    rot = jnp.argmin(dists_r, axis=-1).astype(jnp.int32)  # first-min wins

    # Rotation selection as 4-way selects: take_along_axis lowers to
    # serialized gathers on TPU (the pose/glue stage's dominant cost at
    # batch 128); a static 4-term select chain is pure VPU.
    def take(a):
        return sum(
            jnp.where(rot == r, a[:, r], 0) for r in range(4)
        )

    best_id = take(ids_r)
    best_dist = take(dists_r)
    code_pairs_r = rectify.bits_to_u32_pairs(bits)  # (K, 4, 2)
    best_code = sum(
        jnp.where(
            (rot == r)[:, None],
            code_pairs_r[:, r],
            jnp.zeros_like(code_pairs_r[:, r]),
        )
        for r in range(4)
    )

    accept = quad_valid & h_valid & border_valid
    tau_ok = best_dist < dictionary.tau
    if cfg.filter_high_bit_errors:
        accept = accept & tau_ok

    count = lambda m: jnp.sum(m.astype(jnp.int32))  # noqa: E731
    stats = dict(stats)
    stats["reject_homography"] = count(quad_valid & ~h_valid)
    stats["reject_border"] = count(quad_valid & h_valid & ~border_valid)
    stats["reject_tau"] = count(
        quad_valid & h_valid & border_valid & ~tau_ok
    )
    stats["markers"] = count(accept)

    # corners.rotate_left(min_rotation) (reference aruco.rs:97-103) as
    # a 4-way select over static rolls (gather-free).
    corners_rot = sum(
        jnp.where(
            (rot == r)[:, None, None],
            jnp.roll(quads, -r, axis=1),
            0.0,
        )
        for r in range(4)
    )

    return {
        "quads": quads,
        "quad_valid": quad_valid,
        "patches": patches,
        "marker_valid": accept,
        "marker_id": best_id,
        "marker_dist": best_dist,
        "marker_rot": rot,
        "marker_code": best_code,
        "marker_corners": corners_rot,
        "stats": stats,
    }
