"""Pallas candidate-fit kernels: per-lane compute gated on lane use.

The XLA fit (segment.fit_quads) is fully fused and VPU-bound, but it is
DENSE over its lanes: the (KR, P) size-ranking pass and every per-lane
masked reduction / extreme-point argmax / containment pass run for all
lanes even though typical frames populate only ~10 of 44 (8 markers +
a few specks — the lanes exist for worst-case clutter).  These kernels
hold one frame's label plane in VMEM and gate every per-lane plane pass
on that lane being used — the same invalid-lane skipping that pays in
the refine/warp window kernels, applied to fitting.  Dense scenes
simply run all lanes (no regression).

Structure (exactness with segment.fit_quads is required by the
detector's Pallas-vs-XLA gate):

  1. ``rank_roots_kernel``: raster rank of component roots (integer
     row-prefix cumsum) and per-rank (root, size) pairs, skipping ranks
     past the frame's root count.  Integer arithmetic — exact.
  2. XLA: the top-K-by-size selection reuses ``lax.top_k`` on
     ``where(used, sizes, -1)`` — literally fit_quads' own selection.
  3. ``fit_lanes_kernel``: per selected lane, the centroid / extreme
     corners / containment chain, verbatim fit_quads f32 expressions.
     All reductions are exact in any order (counts are integers; the
     centroid sums are multiples of 0.5 well under 2^24), argmax is
     max-then-min-linear-index (jnp.argmax's row-major tie-break).

Reference semantics: the unbounded candidate list of
/root/reference/src/aruco.rs:124-166, bounded to K size-ranked lanes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..segment import ADMIT_OFFSETS as _ADMIT_OFFSETS


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _rank_tris(hc, wc):
    """Triangular 0/1 matmul weights for the MXU raster cumsum in
    _rank_prep, built in-kernel from iotas (shared by both label
    planes — compute once per kernel invocation and pass in)."""
    tri_lane = (
        jax.lax.broadcasted_iota(jnp.int32, (wc, wc), 0)
        <= jax.lax.broadcasted_iota(jnp.int32, (wc, wc), 1)
    )
    tri_row = (
        jax.lax.broadcasted_iota(jnp.int32, (hc, hc), 1)
        < jax.lax.broadcasted_iota(jnp.int32, (hc, hc), 0)
    )
    to_bf = lambda x: x.astype(jnp.float32).astype(jnp.bfloat16)
    return to_bf(tri_lane), to_bf(tri_row)


def _rank_prep(lab, hc, wc, min_px, tris=None):
    """Plane-dense fixed part of the rank pool (admission pre-filter +
    raster cumsum): returns the ``ranked`` plane (rank at root cells,
    -1 elsewhere — one cell per rank) and the root count."""
    ri = jax.lax.broadcasted_iota(jnp.int32, (hc, wc), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (hc, wc), 1)
    lin = ri * wc + ci

    is_root = lab == lin
    # Pool admission pre-filter (mirrors fit_quads bit-for-bit): the
    # minimal-offset size test (segment.ADMIT_OFFSETS — see the
    # equivalence proof there); wrap-around rolls match jnp.roll.
    t = min(int(min_px), 3)
    if t > 1:
        cnt = jnp.zeros((hc, wc), jnp.int32)
        by_dy: dict[int, list[int]] = {}
        for dy, dx in _ADMIT_OFFSETS[t]:
            by_dy.setdefault(dy, []).append(dx)
        for dy, dxs in by_dy.items():
            rolled_r = (
                lab
                if dy == 0
                else jnp.concatenate([lab[dy:], lab[:dy]], axis=0)
            )
            for dx in dxs:
                sh = pltpu.roll(rolled_r, (-dx) % wc, axis=1)
                cnt = cnt + (sh == lab).astype(jnp.int32)
        is_root = is_root & (cnt >= t - 1)
    is_root = is_root.astype(jnp.int32)
    n_roots = jnp.sum(is_root)

    # Inclusive raster cumsum on the MXU: the lane prefix within each
    # row is one matmul against an upper-triangular 0/1 matrix, the
    # exclusive row prefix one matvec against a strict lower triangle.
    # Exact: is_root is 0/1 (bf16-exact), per-row sums <= wc and the
    # row-total carry <= hc*wc < 2^24 accumulate in f32 — integer-exact
    # at any order.  Replaces ~40 serialized VPU doubling ops per plane
    # (the fit stage is op-issue-bound, see _fused_fit_call).
    tri_lane, tri_row = tris if tris is not None else _rank_tris(hc, wc)
    root_bf = is_root.astype(jnp.float32).astype(jnp.bfloat16)
    pref = jax.lax.dot_general(
        root_bf, tri_lane, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(jnp.int32)  # inclusive lane prefix (hc, wc)
    rowtot = jnp.sum(root_bf.astype(jnp.float32), axis=1, keepdims=True)
    if wc <= 256:
        # Row totals <= wc <= 256 are bf16-exact directly.
        rpref_ex = jax.lax.dot_general(
            tri_row, rowtot.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.int32)  # exclusive row prefix (hc, 1)
    else:
        # Wide grids: row totals can exceed 256 and would round in
        # bf16.  Split into 128*hi + lo halves (each <= 256 for any
        # wc < 32768 — hi <= wc//128, lo < 128), matvec each half,
        # recombine in f32: integer-exact.
        hi = jnp.floor(rowtot * (1.0 / 128.0))
        lo = rowtot - 128.0 * hi

        def _mv(t):
            return jax.lax.dot_general(
                tri_row, t.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        rpref_ex = (128.0 * _mv(hi) + _mv(lo)).astype(jnp.int32)
    rank = pref + rpref_ex - 1

    # Rank indexed at roots only, -1 elsewhere: the loop body then
    # tests one plane equality instead of two (every cell between
    # two roots carries the same cumsum value, so the bare rank
    # plane is ambiguous without the root mask).
    ranked = jnp.where(is_root == 1, rank, -1)
    return ranked, n_roots


def _rank_pool(lab, hc, wc, kr, krp, min_px):
    """Traced rank-pool body shared by rank_roots_kernel and the fused
    kernel: raster-ranked (root, size) pairs with the min-size admission
    pre-filter, dynamic trip min(n_roots, kr).  Returns (roots_v,
    sizes_v) as (1, krp) f32 vectors (-1 size fill on empty ranks) and
    the scalar root count."""
    ri = jax.lax.broadcasted_iota(jnp.int32, (hc, wc), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (hc, wc), 1)
    lin = ri * wc + ci
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, krp), 1)
    p = hc * wc
    ranked, n_roots = _rank_prep(lab, hc, wc, min_px)

    def body(r, carry):
        roots_v, sizes_v = carry
        hit = ranked == r
        root_r = jnp.min(jnp.where(hit, lin, p))
        size_r = jnp.sum((lab == root_r).astype(jnp.int32))
        roots_v = jnp.where(lane == r, root_r.astype(jnp.float32), roots_v)
        sizes_v = jnp.where(lane == r, size_r.astype(jnp.float32), sizes_v)
        return roots_v, sizes_v

    # Unused ranks keep root 0 — fit_quads' one-hot extraction sums
    # to 0 for an empty rank, and downstream always masks by
    # lane_used, so 0 is the bit-compatible fill.
    roots_v = jnp.zeros((1, krp), jnp.float32)
    sizes_v = jnp.full((1, krp), -1.0, jnp.float32)
    roots_v, sizes_v = jax.lax.fori_loop(
        0, jnp.minimum(n_roots, kr), body, (roots_v, sizes_v)
    )
    return roots_v, sizes_v, n_roots


def _lane_geom(hc, wc, ds):
    """Per-frame geometry planes for _lane_chain — computed ONCE per
    kernel invocation and passed in: Mosaic does not hoist
    loop-invariant plane ops out of fori_loop bodies, so building these
    inside the per-lane loop costs ~6 plane ops per lane."""
    ri = jax.lax.broadcasted_iota(jnp.int32, (hc, wc), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (hc, wc), 1)
    lin = ri * wc + ci
    cxs = (ds - 1) * 0.5
    cxp = ci.astype(jnp.float32) * ds + cxs
    cyp = ri.astype(jnp.float32) * ds + cxs
    return lin, cxp, cyp


def _lane_chain(lab, root_k, szf, geom, hc, wc, ds, containment_slack):
    """Traced per-lane fit chain shared by fit_lanes_kernel and the
    fused kernel: centroid / extreme corners / containment, fit_quads'
    exact f32 expressions.  Returns the 11 output scalars
    [ax, ay, bx, by, cx, cy, dx, dy, frac, cenx, ceny]."""
    lin, cxp, cyp = geom
    p = hc * wc
    cxs = (ds - 1) * 0.5
    slack = containment_slack * ds

    member = lab == root_k
    cenx = jnp.sum(jnp.where(member, cxp, 0.0)) / szf
    ceny = jnp.sum(jnp.where(member, cyp, 0.0)) / szf

    def amax(score):
        s = jnp.where(member, score, -jnp.inf)
        m = jnp.max(s)
        cand = jnp.where(s == m, lin, jnp.int32(p))
        return jnp.min(cand)

    def amin(score):
        # First minimum == fit_quads' argmax of -score (the set of
        # minima of score IS the set of maxima of -score; negation is
        # sign-exact).
        s = jnp.where(member, score, jnp.inf)
        m = jnp.min(s)
        cand = jnp.where(s == m, lin, jnp.int32(p))
        return jnp.min(cand)

    def cx_of(i):
        return (i % wc).astype(jnp.float32) * ds + cxs

    def cy_of(i):
        return (i // wc).astype(jnp.float32) * ds + cxs

    d2c = (cxp - cenx) ** 2 + (cyp - ceny) ** 2
    ia = amax(d2c)
    ax, ay = cx_of(ia), cy_of(ia)
    d2a = (cxp - ax) ** 2 + (cyp - ay) ** 2
    ic = amax(d2a)
    qcx, qcy = cx_of(ic), cy_of(ic)
    dx = qcx - ax
    dy = qcy - ay
    cross = (cxp - ax) * dy - (cyp - ay) * dx
    ib = amax(cross)
    idd = amin(cross)  # == amax(-cross), one plane op less
    bx, by = cx_of(ib), cy_of(ib)
    ddx, ddy = cx_of(idd), cy_of(idd)

    # Containment: fit_quads' edge chain (edges A->B->C->D->A,
    # shoelace sign, per-edge slack*len margin), in the EXPANDED
    # per-edge form cyp*a - cxp*b + c0 with the shoelace sign folded
    # into the scalar coefficients (mirrored in fit_quads — two plane
    # ops per edge fewer than the point-difference form).
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
        c0 = bv * efx - av * efy
        # Scalar RHS mirrors fit_quads (bit-for-bit path equality).
        cmp = cyp * av - cxp * bv >= -slack * elen - c0
        inside = cmp if inside is None else inside & cmp
    frac = jnp.sum(jnp.where(member & inside, 1.0, 0.0)) / szf

    return [ax, ay, bx, by, qcx, qcy, ddx, ddy, frac, cenx, ceny]


@functools.partial(
    jax.jit, static_argnames=("kr", "min_px", "interpret")
)
def rank_roots_kernel(
    labels: jnp.ndarray,  # (B, Hc, Wc) int32, sentinel Hc*Wc
    kr: int,
    min_px: int = 3,
    interpret: bool = False,
):
    """-> (roots_r (B, kr) int32, sizes_r (B, kr) int32 with -1 fill,
    n_roots (B,) int32).  Matches fit_quads' raster rank pool
    (admission pre-filter included) bit-for-bit.

    The per-rank extraction runs in a fori_loop with a DYNAMIC trip
    count min(n_roots, kr): typical frames have ~10 rankable roots, so
    the big worst-case pool costs nothing at runtime (the XLA fit's
    (KR, P) pass is dense over all kr lanes).
    """
    b, hc, wc = labels.shape
    p = hc * wc
    krp = _round_up(kr, 128)

    def kernel(lab_ref, out_ref):
        roots_v, sizes_v, n_roots = _rank_pool(
            lab_ref[0], hc, wc, kr, krp, min_px
        )
        out_ref[0, 0] = roots_v[0]
        out_ref[0, 1] = sizes_v[0]
        out_ref[0, 2] = jnp.full((krp,), n_roots, jnp.int32).astype(
            jnp.float32
        )
        for rr in range(3, 8):
            out_ref[0, rr] = jnp.zeros((krp,), jnp.float32)

    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(
                (1, hc, wc), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            )
        ],
        out_specs=pl.BlockSpec(
            (1, 8, krp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, 8, krp), jnp.float32),
        interpret=interpret,
    )(labels)
    roots_r = out[:, 0, :kr].astype(jnp.int32)
    sizes_r = out[:, 1, :kr].astype(jnp.int32)
    n_roots = out[:, 2, 0].astype(jnp.int32)
    return roots_r, sizes_r, n_roots


# Output row layout of fit_lanes_kernel.
_F_AX, _F_AY, _F_BX, _F_BY, _F_CX, _F_CY, _F_DX, _F_DY = range(8)
_F_CONTAIN, _F_CENX, _F_CENY = range(8, 11)


@functools.partial(
    jax.jit,
    static_argnames=("ds", "containment_slack", "interpret"),
)
def fit_lanes_kernel(
    labels: jnp.ndarray,  # (B, Hc, Wc) int32
    roots: jnp.ndarray,  # (B, K) int32 selected roots
    sizes: jnp.ndarray,  # (B, K) int32 (>= 0; lane unused if use=0)
    use: jnp.ndarray,  # (B, K) bool — unused lanes skip all passes
    ds: int,
    containment_slack: float,
    interpret: bool = False,
):
    """-> (quads (B,K,4,2), centroids (B,K,2), frac (B,K)) matching
    fit_quads' per-lane chain bit-for-bit on used lanes; unused lanes
    return zeros (mask downstream with ``use``)."""
    b, hc, wc = labels.shape
    k = roots.shape[1]
    p = hc * wc
    kp = _round_up(k, 8)

    # Per-lane params ride SUBLANE rows (row kk = lane kk) so the
    # dynamic-trip loop can read them with a dynamic sublane index
    # (dynamic LANE indices must be 128-multiples in Mosaic).
    params = jnp.zeros((b, kp, 128), jnp.float32)
    params = params.at[:, :k, 0].set(roots.astype(jnp.float32))
    params = params.at[:, :k, 1].set(sizes.astype(jnp.float32))
    params = params.at[:, :k, 2].set(use.astype(jnp.float32))
    # Loop trip: last used lane + 1 (0 when no lane is used).
    n_trip = jnp.max(
        (jnp.arange(1, k + 1, dtype=jnp.int32)[None, :])
        * use.astype(jnp.int32),
        axis=1,
    )
    params = params.at[:, 0, 3].set(n_trip.astype(jnp.float32))

    def kernel(lab_ref, par_ref, out_ref):
        lab = lab_ref[0]
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        geom = _lane_geom(hc, wc, ds)

        # Zero the whole output block once, then loop with a DYNAMIC
        # trip count bounded by the last used lane: lanes arrive size-
        # sorted (top-k), so used lanes are a prefix and the unused
        # tail costs nothing (an unrolled pl.when-skipped lane still
        # paid ~0.07 us of slot overhead; 30+ dead lanes x 128 frames
        # was ~0.3 ms/batch).  Non-prefix masks stay correct: the trip
        # covers up to the last used lane and each lane re-checks
        # ``use``.
        out_ref[0] = jnp.zeros((kp, 128), jnp.float32)
        n_trip = par_ref[0, 0, 3].astype(jnp.int32)

        def lane_body(kk, carry):
            pk = par_ref[0, kk]  # dynamic sublane row: lane kk's params
            root_k = pk[0].astype(jnp.int32)
            size_k = pk[1]
            lane_used = pk[2] > 0.5

            @pl.when(lane_used)
            def _():
                vals = _lane_chain(
                    lab,
                    root_k,
                    jnp.maximum(size_k, 1.0),
                    geom,
                    hc,
                    wc,
                    ds,
                    containment_slack,
                )
                row = jnp.zeros((1, 128), jnp.float32)
                for fi, v in enumerate(vals):
                    row = jnp.where(lane == fi, v, row)
                out_ref[0, kk] = row[0]
            return carry

        jax.lax.fori_loop(0, jnp.minimum(n_trip, k), lane_body, 0)

    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(
                (1, hc, wc), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, kp, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, kp, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, kp, 128), jnp.float32),
        interpret=interpret,
    )(labels, params)

    quads = jnp.stack(
        [
            jnp.stack([out[:, :k, _F_AX], out[:, :k, _F_AY]], axis=-1),
            jnp.stack([out[:, :k, _F_BX], out[:, :k, _F_BY]], axis=-1),
            jnp.stack([out[:, :k, _F_CX], out[:, :k, _F_CY]], axis=-1),
            jnp.stack([out[:, :k, _F_DX], out[:, :k, _F_DY]], axis=-1),
        ],
        axis=-2,
    )
    cents = jnp.stack(
        [out[:, :k, _F_CENX], out[:, :k, _F_CENY]], axis=-1
    )
    return quads, cents, out[:, :k, _F_CONTAIN]


@functools.partial(
    jax.jit,
    static_argnames=(
        "kr1", "k1", "kr2", "k2", "ds", "min_px",
        "containment_slack", "min_containment", "dup_skip", "interpret",
    ),
)
def _fused_fit_call(
    labels1,
    labels2,  # None for the single-pass variant
    kr1: int,
    k1: int,
    kr2: int,
    k2: int,
    ds: int,
    min_px: int,
    containment_slack: float,
    min_containment: float = 0.0,
    dup_skip: bool = False,
    interpret: bool = False,
):
    """ONE pallas launch for the whole fit stage (both label planes):
    rank pool -> top-k-by-size selection -> per-lane fit chain, all per
    grid step (replaces four pallas_calls + XLA top_k glue and streams
    each plane once).

    The in-kernel selection reproduces fit_quads' lane selection
    ``lax.top_k(where(used, sizes, -1), k)`` + root gather exactly:
    top_k returns the k largest values in descending order with ties
    broken by LOWER index first, and the iterative max + first-index +
    mask-out picks the identical sequence (sizes are integers, exact in
    f32).  Every round picks a real rank because the rank pool holds
    min(n_roots, kr) >= min(n_roots, k) real entries (kr >= k);
    unpicked lanes keep the (0 root, -1 size) fill, exactly what
    top_k + take_along_axis yield for empty ranks."""
    b, hc, wc = labels1.shape
    two = labels2 is not None
    kp1 = _round_up(k1, 8)
    kp2 = _round_up(k2, 8) if two else 0
    nstat = 6 if two else 3
    # +1: a spare garbage row — over-scheduled interleave chains write
    # there instead of branching (see below).
    rp = _round_up(kp1 + kp2 + nstat + 1, 8)
    krp1 = _round_up(kr1, 128)
    krp2 = _round_up(kr2, 128) if two else 0

    # The stage is LATENCY-bound on serialized scalar reductions (each
    # full-plane max/min/sum -> broadcast chain measured ~100-150 ns;
    # rank 1.2 ms + select 1.1 ms + lane chains 4.5 ms per batch-128
    # at ~18 components/frame).  Every loop below therefore runs
    # SEVERAL INDEPENDENT chains per iteration — two per pass (ranks /
    # lanes are independent of each other) and both passes side by
    # side — so the compiler can overlap their reduction latencies.
    # Per-pass VALUES and write order are unchanged (chains touch
    # disjoint lanes/rows); over-scheduled chains are masked by
    # writing to a dead lane index (no lane matches) or the spare
    # output row, never by a branch (a pl.when block would forbid the
    # cross-chain scheduling this exists for).
    def kernel(*refs):
        out_ref = refs[-1]
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        out_ref[0] = jnp.zeros((rp, 128), jnp.float32)
        geom = _lane_geom(hc, wc, ds)  # shared by both passes
        lin, _, _ = geom
        p = hc * wc
        spare = rp - 1

        tris = _rank_tris(hc, wc)  # shared by both passes
        lab1 = refs[0][0]
        ranked1, n1 = _rank_prep(lab1, hc, wc, min_px, tris)
        lane_kr1 = jax.lax.broadcasted_iota(jnp.int32, (1, krp1), 1)
        t1 = jnp.minimum(n1, kr1)
        h1 = (t1 + 1) // 2
        if two:
            lab2 = refs[1][0]
            ranked2, n2 = _rank_prep(lab2, hc, wc, min_px, tris)
            lane_kr2 = jax.lax.broadcasted_iota(
                jnp.int32, (1, krp2), 1
            )
            t2 = jnp.minimum(n2, kr2)
            h2 = (t2 + 1) // 2

        # ---- rank extraction: 2 chains per pass, both passes ----
        def rank_one(ranked, lab, r_idx, valid, rv, sv, lane_kr, krp):
            tgt = jnp.where(valid, r_idx, krp)  # krp: no lane matches
            hit = ranked == r_idx
            root_r = jnp.min(jnp.where(hit, lin, p))
            size_r = jnp.sum((lab == root_r).astype(jnp.int32))
            rv = jnp.where(
                lane_kr == tgt, root_r.astype(jnp.float32), rv
            )
            sv = jnp.where(
                lane_kr == tgt, size_r.astype(jnp.float32), sv
            )
            return rv, sv

        rv1 = jnp.zeros((1, krp1), jnp.float32)
        sv1 = jnp.full((1, krp1), -1.0, jnp.float32)
        if two:
            rv2 = jnp.zeros((1, krp2), jnp.float32)
            sv2 = jnp.full((1, krp2), -1.0, jnp.float32)

            def rank_body(r, carry):
                rv1, sv1, rv2, sv2 = carry
                rv1, sv1 = rank_one(
                    ranked1, lab1, r, r < h1, rv1, sv1, lane_kr1, krp1
                )
                rv1, sv1 = rank_one(
                    ranked1, lab1, r + h1, r + h1 < t1,
                    rv1, sv1, lane_kr1, krp1,
                )
                rv2, sv2 = rank_one(
                    ranked2, lab2, r, r < h2, rv2, sv2, lane_kr2, krp2
                )
                rv2, sv2 = rank_one(
                    ranked2, lab2, r + h2, r + h2 < t2,
                    rv2, sv2, lane_kr2, krp2,
                )
                return rv1, sv1, rv2, sv2

            rv1, sv1, rv2, sv2 = jax.lax.fori_loop(
                0, jnp.maximum(h1, h2), rank_body,
                (rv1, sv1, rv2, sv2),
            )
        else:

            def rank_body(r, carry):
                rv1, sv1 = carry
                rv1, sv1 = rank_one(
                    ranked1, lab1, r, r < h1, rv1, sv1, lane_kr1, krp1
                )
                rv1, sv1 = rank_one(
                    ranked1, lab1, r + h1, r + h1 < t1,
                    rv1, sv1, lane_kr1, krp1,
                )
                return rv1, sv1

            rv1, sv1 = jax.lax.fori_loop(0, h1, rank_body, (rv1, sv1))

        # ---- top-k selection: sequential within a pass (each round
        # masks out its pick), interleaved across passes.  The pick key
        # packs the whole (size, tie-break, ROOT) state into ONE i32 so
        # each round is a single max reduction (the stage is
        # latency-bound on serialized reductions).  Rank order IS
        # raster order — roots are the components' minimum linear
        # indices extracted in raster-rank order — so lax.top_k's
        # (size desc, lane asc) ordering is EXACTLY (size desc, root
        # asc): key = size*P2 + (P2-1 - root) picks the identical
        # sequence AND carries the root in its low bits (root = P2-1 -
        # (m & (P2-1)), size = m >> log2(P2)), killing the one-hot
        # root-fetch reduction.  Needs (p+1)*P2 < 2^31 (true for every
        # production coarse grid; p = hc*wc, P2 = next pow2 >= p);
        # bigger grids fall back to the lane-packed key + root-fetch
        # form.  Empty ranks hold size -1 -> negative keys, never
        # picked while a real entry remains (sel rounds stop at
        # min(n, k) anyway); keys of real entries are unique (roots
        # are), so each kill masks exactly its pick.
        p2 = 1 << max(p - 1, 1).bit_length()
        root_key = (p + 1) * p2 < 2**31
        if root_key:
            p2log = p2.bit_length() - 1

            def sel_key(sv, rv, lane_kr):
                return sv.astype(jnp.int32) * p2 + (
                    (p2 - 1) - rv.astype(jnp.int32)
                )

            def sel_one(j, key, sr, ss, valid, rv):
                m = jnp.max(key)
                root_j = ((p2 - 1) - (m & (p2 - 1))).astype(
                    jnp.float32
                )
                tgt = jnp.where(valid, j, 128)
                sr = jnp.where(lane == tgt, root_j, sr)
                size_m = jnp.right_shift(m, p2log).astype(jnp.float32)
                ss = jnp.where(lane == tgt, size_m, ss)
                key = jnp.where(
                    (key == m) & valid, jnp.int32(-(2**30)), key
                )
                return key, sr, ss
        else:

            def sel_key(sv, rv, lane_kr):
                return (
                    sv.astype(jnp.int32) * 1024 + (1023 - lane_kr)
                )

            def sel_one(j, key, sr, ss, valid, rv):
                m = jnp.max(key)
                pick = key == m
                root_j = jnp.sum(jnp.where(pick, rv, 0.0))
                tgt = jnp.where(valid, j, 128)
                sr = jnp.where(lane == tgt, root_j, sr)
                size_m = jnp.right_shift(m, 10).astype(jnp.float32)
                ss = jnp.where(lane == tgt, size_m, ss)
                key = jnp.where(
                    pick & valid, jnp.int32(-(2**30)), key
                )
                return key, sr, ss

        ns1 = jnp.minimum(n1, k1)
        sr1 = jnp.zeros((1, 128), jnp.float32)
        ss1 = jnp.full((1, 128), -1.0, jnp.float32)
        if two:
            ns2 = jnp.minimum(n2, k2)
            sr2 = jnp.zeros((1, 128), jnp.float32)
            ss2 = jnp.full((1, 128), -1.0, jnp.float32)

            def sel_body(j, carry):
                key1, sr1, ss1, key2, sr2, ss2 = carry
                key1, sr1, ss1 = sel_one(
                    j, key1, sr1, ss1, j < ns1, rv1
                )
                key2, sr2, ss2 = sel_one(
                    j, key2, sr2, ss2, j < ns2, rv2
                )
                return key1, sr1, ss1, key2, sr2, ss2

            _, sr1, ss1, _, sr2, ss2 = jax.lax.fori_loop(
                0, jnp.maximum(ns1, ns2), sel_body,
                (sel_key(sv1, rv1, lane_kr1), sr1, ss1,
                 sel_key(sv2, rv2, lane_kr2), sr2, ss2),
            )
        else:

            def sel_body(j, carry):
                key1, sr1, ss1 = carry
                return sel_one(j, key1, sr1, ss1, j < ns1, rv1)

            _, sr1, ss1 = jax.lax.fori_loop(
                0, ns1, sel_body,
                (sel_key(sv1, rv1, lane_kr1), sr1, ss1),
            )

        srow = kp1 + kp2
        out_ref[0, srow] = sr1[0]
        out_ref[0, srow + 1] = ss1[0]
        out_ref[0, srow + 2] = jnp.full((128,), n1, jnp.int32).astype(
            jnp.float32
        )
        if two:
            out_ref[0, srow + 3] = sr2[0]
            out_ref[0, srow + 4] = ss2[0]
            out_ref[0, srow + 5] = jnp.full(
                (128,), n2, jnp.int32
            ).astype(jnp.float32)

        # ---- per-lane fit chains ----
        def fit_one(lab, sr, ss, kk_idx, valid, row0, frac_v=None):
            hit = lane == jnp.where(valid, kk_idx, 128)
            root_k = jnp.sum(jnp.where(hit, sr, 0.0)).astype(jnp.int32)
            size_k = jnp.sum(jnp.where(hit, ss, 0.0))
            vals = _lane_chain(
                lab,
                root_k,
                jnp.maximum(size_k, 1.0),
                geom,
                hc,
                wc,
                ds,
                containment_slack,
            )
            row = jnp.zeros((1, 128), jnp.float32)
            for fi, v in enumerate(vals):
                row = jnp.where(lane == fi, v, row)
            out_ref[0, jnp.where(valid, row0 + kk_idx, spare)] = row[0]
            if frac_v is None:
                return None
            tgt = jnp.where(valid, kk_idx, 128)
            return jnp.where(lane == tgt, vals[_F_CONTAIN], frac_v)

        # Pass 1 (three interleaved chains — 4-wide measured a wash,
        # see PERF.md), carrying the frac vector so the twin pre-kill
        # below can form fit1's valid lanes in-kernel.
        ha = (ns1 + 2) // 3

        def lane1_body(kk, frac_v):
            frac_v = fit_one(lab1, sr1, ss1, kk, kk < ns1, 0, frac_v)
            frac_v = fit_one(
                lab1, sr1, ss1, kk + ha, kk + ha < ns1, 0, frac_v
            )
            return fit_one(
                lab1, sr1, ss1, kk + 2 * ha, kk + 2 * ha < ns1,
                0, frac_v,
            )

        frac1 = jax.lax.fori_loop(
            0, ha, lane1_body, jnp.zeros((1, 128), jnp.float32)
        )

        if two:
            if dup_skip:
                # fit1's valid lanes, exactly the wrapper's formula
                # (lane_used is implied: unused lanes hold size -1).
                valid1v = (ss1 >= float(min_px)) & (
                    frac1 >= min_containment
                )
            # Pass 2: TWO interleaved chains per trip like pass 1
            # (dead chains write the spare row).  With dup_skip, the
            # merge_fits exact-twin rule (segment.py) — same
            # (root, size) as a VALID outer lane means the same
            # hole-filled cell set — still skips the whole trip when
            # BOTH chains are twins; a mixed trip runs both and
            # dead-writes the twin one, keeping the cross-chain
            # scheduling a pl.when per chain would forbid.  Chains
            # pair ADJACENT lanes (2kk, 2kk+1), not split halves:
            # lanes arrive size-sorted, and the twins (marker rings,
            # the biggest inner components) cluster at the front, so
            # adjacent pairs make twin trips whole-trip skips instead
            # of half-wasted mixed trips.  Skipped lanes keep their
            # zeroed row: frac 0 (invalid), and downstream never
            # reads dead lanes' quads.
            hb = (ns2 + 1) // 2

            def fetch2(kk_idx, valid):
                hit = lane == jnp.where(valid, kk_idx, 128)
                rootf = jnp.sum(jnp.where(hit, sr2, 0.0))
                sizef = jnp.sum(jnp.where(hit, ss2, 0.0))
                return rootf, sizef

            def chain2(rootf, sizef, kk_idx, ok):
                vals = _lane_chain(
                    lab2,
                    rootf.astype(jnp.int32),
                    jnp.maximum(sizef, 1.0),
                    geom,
                    hc,
                    wc,
                    ds,
                    containment_slack,
                )
                row = jnp.zeros((1, 128), jnp.float32)
                for fi, v in enumerate(vals):
                    row = jnp.where(lane == fi, v, row)
                out_ref[0, jnp.where(ok, kp1 + kk_idx, spare)] = row[0]

            def lane2_body(kk, carry):
                la = 2 * kk
                lb = 2 * kk + 1
                va = la < ns2
                vb = lb < ns2
                ra, sa = fetch2(la, va)
                rb, sb = fetch2(lb, vb)
                if dup_skip:
                    # Garbage fetches (invalid half-lane) yield
                    # (0, 0), never twin-matching: valid outer lanes
                    # have size >= min_px > 0.
                    ta = jnp.any((sr1 == ra) & (ss1 == sa) & valid1v)
                    tb = jnp.any((sr1 == rb) & (ss1 == sb) & valid1v)
                    run_a = va & jnp.logical_not(ta)
                    run_b = vb & jnp.logical_not(tb)

                    @pl.when(run_a | run_b)
                    def _():
                        chain2(ra, sa, la, run_a)
                        chain2(rb, sb, lb, run_b)
                else:
                    chain2(ra, sa, la, va)
                    chain2(rb, sb, lb, vb)
                return carry

            jax.lax.fori_loop(0, hb, lane2_body, 0)

    plane_spec = pl.BlockSpec(
        (1, hc, wc), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    in_specs = [plane_spec, plane_spec] if two else [plane_spec]
    operands = (labels1, labels2) if two else (labels1,)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, rp, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, rp, 128), jnp.float32),
        interpret=interpret,
    )(*operands)


def _rank_pool_size(k: int, p: int) -> int:
    # fit_quads' grid-scaled ranking-pool formula (segment.py).
    return max(k, min(p, max(4 * k, 64, min(p // 16, 1024))))


def fused_fit_batch(
    labels1: jnp.ndarray,  # (B, Hc, Wc) int32
    labels2: jnp.ndarray | None,  # (B, Hc, Wc) int32 (inner pass)
    ds: int,
    params,  # segment.QuadParams
    k1: int,
    k2: int,
    dup_skip: bool = False,
    interpret: bool = False,
):
    """Single-launch batched fit of both label planes: returns
    (fit1, fit2) dicts bit-matching jax.vmap(segment.fit_quads) per
    plane (fit2 is None when k2 == 0).  Falls back to the split
    kernels for K > 128 (selected lanes ride one 128-lane vector).

    dup_skip=True (the detector's production setting) skips the fit
    chain of inner lanes whose (root, size) match a valid outer lane —
    segment.merge_fits' exact-twin rule kills those lanes anyway, and
    on marker scenes they are about half the per-frame lane chains.
    Skipped lanes return zero quads and frac 0 (invalid); merged
    results are identical because downstream never reads dead lanes'
    quads (refine/warp skip invalid lanes, finalize's near-duplicate
    gate masks by valid, markers list only valid lanes)."""
    if k1 > 128 or k2 > 128:
        fit1 = fit_quads_batch(labels1, ds, params, k1, interpret)
        fit2 = (
            fit_quads_batch(labels2, ds, params, k2, interpret)
            if k2 > 0
            else None
        )
        return fit1, fit2
    b, hc, wc = labels1.shape
    p = hc * wc
    two = k2 > 0 and labels2 is not None
    kr1 = _rank_pool_size(k1, p)
    kr2 = _rank_pool_size(k2, p) if two else 0
    kp1 = _round_up(k1, 8)
    kp2 = _round_up(k2, 8) if two else 0
    out = _fused_fit_call(
        labels1,
        labels2 if two else None,
        kr1,
        k1,
        kr2,
        k2,
        ds,
        int(params.min_component_px),
        float(params.containment_slack),
        min_containment=float(params.min_containment),
        dup_skip=bool(dup_skip) and two,
        interpret=interpret,
    )

    fit1 = _unpack_fit_rows(out, 0, kp1 + kp2, k1, params)
    fit2 = (
        _unpack_fit_rows(out, kp1, kp1 + kp2 + 3, k2, params)
        if two
        else None
    )
    return fit1, fit2


def _unpack_fit_rows(out, row0, srow, k, params):
    """Decode one pass's fit dict from the (B, rows, 128) kernel output
    (shared by the standalone fused fit kernel and the coarse+fit
    mega-kernel — identical row layout)."""
    rows = out[:, row0 : row0 + k]
    quads = jnp.stack(
        [
            jnp.stack([rows[..., _F_AX], rows[..., _F_AY]], axis=-1),
            jnp.stack([rows[..., _F_BX], rows[..., _F_BY]], axis=-1),
            jnp.stack([rows[..., _F_CX], rows[..., _F_CY]], axis=-1),
            jnp.stack([rows[..., _F_DX], rows[..., _F_DY]], axis=-1),
        ],
        axis=-2,
    )
    cents = jnp.stack(
        [rows[..., _F_CENX], rows[..., _F_CENY]], axis=-1
    )
    frac = rows[..., _F_CONTAIN]
    roots = out[:, srow, :k].astype(jnp.int32)
    sizes = out[:, srow + 1, :k].astype(jnp.int32)
    n_roots = out[:, srow + 2, 0].astype(jnp.int32)
    lane_used = sizes >= 0
    sizes_pos = jnp.maximum(sizes, 0)
    valid = (
        lane_used
        & (sizes_pos >= params.min_component_px)
        & (frac >= params.min_containment)
    )
    return {
        "quads": quads,
        "valid": valid,
        "roots": roots,
        "centroids": cents,
        "sizes": sizes_pos,
        "qualifying": n_roots,
    }


def fused_coarsefit_batch(
    coarse_pre: jnp.ndarray,  # pre-padded coarse plane (emit_coarse)
    params,  # segment.QuadParams
    ds: int,
    k1: int,
    k2: int,
    pre_hw: tuple[int, int],
    dup_skip: bool = False,
    interpret: bool = False,
):
    """Coarse segmentation + candidate fit in ONE Pallas launch: the
    label planes live and die in VMEM (never written to HBM), and the
    fit runs over the kernel's frame-packed layout so every plane op
    serves all packed frames.  Returns (fit1, fit2, inner_coarse) with
    fit dicts bit-matching fused_fit_batch(label_planes(...)) and
    inner_coarse == segment._dilate3(labels2 < P) cropped to (hc, wc).

    Only valid inside the packed fit tail's bf16 exactness envelope
    (coarse_pallas.fused_fit_exact); callers must route wider/taller
    grids to label_planes + fused_fit_batch (raises otherwise — a
    silent bf16 rounding of the root/size reductions is never ok).
    """
    from .coarse_pallas import coarse_labels, fused_fit_exact

    hc_, wc_ = pre_hw
    if not fused_fit_exact(hc_, wc_):
        raise ValueError(
            f"grid ({hc_}, {wc_}) exceeds the packed fit tail's bf16 "
            "exactness envelope (need wc <= 255 and rp*cp <= 32768); "
            "use segment.label_planes + fused_fit_batch instead"
        )

    two = k2 > 0
    fit_cfg = (
        int(k1),
        int(k2),
        int(ds),
        int(params.min_component_px),
        float(params.containment_slack),
        float(params.min_containment),
        bool(dup_skip) and two,
    )
    rows, inner_coarse = coarse_labels(
        coarse_pre,
        params.bg_rounds,
        params.fill_rounds,
        params.ccl_rounds,
        inner_ccl_rounds=params.inner_ccl_rounds,
        inner_depths=params.inner_depths,
        inner_flood_rounds=params.inner_flood_rounds,
        inner_fill_rounds=params.inner_fill_rounds,
        inner=two,
        pre_hw=pre_hw,
        fit_cfg=fit_cfg,
        interpret=interpret,
    )
    kp1 = _round_up(k1, 8)
    kp2 = _round_up(k2, 8) if two else 0
    fit1 = _unpack_fit_rows(rows, 0, kp1 + kp2, k1, params)
    fit2 = (
        _unpack_fit_rows(rows, kp1, kp1 + kp2 + 3, k2, params)
        if two
        else None
    )
    return fit1, fit2, inner_coarse


def fit_quads_batch(
    labels: jnp.ndarray,  # (B, Hc, Wc) int32
    ds: int,
    params,  # segment.QuadParams
    k: int,
    interpret: bool = False,
):
    """Batched drop-in for jax.vmap(segment.fit_quads) over a frame
    batch: same dict fields, bit-identical on every downstream-consumed
    value (see module docstring for why the reductions are exact)."""
    b, hc, wc = labels.shape
    p = hc * wc
    kr = max(k, min(p, max(4 * k, 64, min(p // 16, 1024))))
    roots_r, sizes_r, n_roots = rank_roots_kernel(
        labels, kr, params.min_component_px, interpret=interpret
    )
    used_r = jnp.arange(kr, dtype=jnp.int32)[None, :] < n_roots[:, None]
    sizes_m = jnp.where(used_r, sizes_r, -1)
    sizes, sel = jax.lax.top_k(sizes_m, k)  # fit_quads' own selection
    roots = jnp.take_along_axis(roots_r, sel, axis=1)
    lane_used = sizes >= 0
    sizes_pos = jnp.maximum(sizes, 0)
    quads, cents, frac = fit_lanes_kernel(
        labels,
        roots,
        sizes_pos,
        lane_used,
        ds,
        params.containment_slack,
        interpret=interpret,
    )
    valid = (
        lane_used
        & (sizes_pos >= params.min_component_px)
        & (frac >= params.min_containment)
    )
    return {
        "quads": quads,
        "valid": valid,
        "roots": roots,
        "centroids": cents,
        "sizes": sizes_pos,
        "qualifying": n_roots,
    }
