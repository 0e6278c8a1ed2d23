#!/usr/bin/env python
"""One-off cost decomposition of the fit kernels on the real TPU.

Times scratch VARIANTS of rank_roots/fit_lanes with pieces stubbed out
(loop body skipped, prefilter off, reductions replaced by constants) to
attribute the stage's cost to [prefilter | cumsum | per-rank loop |
per-lane plane ops | per-lane reductions] before optimizing.  Outputs
are garbage for the stubbed variants — timing only (a checksum keeps
XLA from DCE'ing).

Usage: python tools/probe_fit2.py [batch]
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np

from aruco3_tpu.runtime.cache import enable_compilation_cache

enable_compilation_cache()  # persist remote-compiler output across runs

from profile_stages import build_frames


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from aruco3_tpu import ARDictionary, DetectorConfig, frontend, segment
    from aruco3_tpu.ops.coarse_pallas import coarse_labels
    from aruco3_tpu.ops.fit_pallas import (
        _round_up, fit_lanes_kernel, rank_roots_kernel,
    )
    from aruco3_tpu.ops.frontend_pallas import fused_threshold_open_pool

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    h, w = 1080, 1920
    cfg = DetectorConfig()
    dictionary = ARDictionary.new_from_named_dict("ARUCO_MIP_36H12")
    ds = segment.choose_coarse_factor(h, w)
    params = segment.QuadParams(
        max_candidates=cfg.max_candidates,
        coarse_factor=ds,
        ccl_rounds=cfg.ccl_rounds,
    )
    frames = build_frames(h, w, batch, dictionary)

    @jax.jit
    def labels_fn(images):
        grey = frontend.rgb_to_luma_u8(images)
        coarse, *_ = fused_threshold_open_pool(
            grey, cfg.threshold_window, params.open_radius, ds,
            emit_packed=True, emit_level1=True, emit_split=True,
        )
        return coarse_labels(
            coarse, params.bg_rounds, params.fill_rounds, params.ccl_rounds,
            inner_ccl_rounds=params.inner_ccl_rounds,
            inner_depths=params.inner_depths,
            inner_flood_rounds=params.inner_flood_rounds,
            inner_fill_rounds=params.inner_fill_rounds,
        )

    labels1, labels2 = labels_fn(frames)
    labels1 = jax.device_put(np.asarray(labels1))
    b, hc, wc = labels1.shape
    p = hc * wc
    k = params.max_candidates
    kr = max(k, min(p, max(4 * k, 64, min(p // 16, 1024))))
    n_roots_host = None

    # ---- scratch variant of rank_roots with static stubs ----
    @functools.partial(
        jax.jit, static_argnames=("kr", "min_px", "mode")
    )
    def rank_var(labels, kr, min_px, mode):
        b, hc, wc = labels.shape
        p = hc * wc
        krp = _round_up(kr, 128)

        def kernel(lab_ref, out_ref):
            lab = lab_ref[0]
            ri = jax.lax.broadcasted_iota(jnp.int32, (hc, wc), 0)
            ci = jax.lax.broadcasted_iota(jnp.int32, (hc, wc), 1)
            lin = ri * wc + ci
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, krp), 1)
            is_root = lab == lin
            t = min(int(min_px), 3)
            if t > 1 and mode != "nopre":
                rr2 = t - 1
                cnt = jnp.zeros((hc, wc), jnp.int32)
                for dy in range(0, rr2 + 1):
                    rolled_r = (
                        lab if dy == 0
                        else jnp.concatenate([lab[dy:], lab[:dy]], axis=0)
                    )
                    for dx in range(-rr2, rr2 + 1):
                        if dy == 0 and dx < 0:
                            continue
                        sh = pltpu.roll(rolled_r, (-dx) % wc, axis=1)
                        cnt = cnt + (sh == lab).astype(jnp.int32)
                is_root = is_root & (cnt >= t)
            is_root = is_root.astype(jnp.int32)
            n_roots = jnp.sum(is_root)
            pref = is_root
            sh = 1
            while sh < wc:
                moved = pltpu.roll(pref, sh, axis=1)
                pref = pref + jnp.where(ci >= sh, moved, 0)
                sh *= 2
            rowtot = jnp.sum(is_root, axis=1, keepdims=True)
            rpref = rowtot
            sh = 1
            while sh < hc:
                moved = jnp.concatenate(
                    [jnp.zeros((sh, 1), jnp.int32), rpref[:-sh]], axis=0
                )
                rpref = rpref + moved
                sh *= 2
            rank = pref + (rpref - rowtot) - 1
            ranked = jnp.where(is_root == 1, rank, -1)

            def body(r, carry):
                roots_v, sizes_v = carry
                hit = ranked == r
                root_r = jnp.min(jnp.where(hit, lin, p))
                size_r = jnp.sum((lab == root_r).astype(jnp.int32))
                roots_v = jnp.where(
                    lane == r, root_r.astype(jnp.float32), roots_v
                )
                sizes_v = jnp.where(
                    lane == r, size_r.astype(jnp.float32), sizes_v
                )
                return roots_v, sizes_v

            def body_noreduce(r, carry):
                # Same plane ops, reductions replaced by r-derived
                # constants (keeps the wheres + compares, drops the
                # min/sum reductions).
                roots_v, sizes_v = carry
                hit = (ranked == r).astype(jnp.int32)
                root_r = hit[0, 0] + r
                size_r = (lab == root_r).astype(jnp.int32)[0, 0] + r
                roots_v = jnp.where(
                    lane == r, root_r.astype(jnp.float32), roots_v
                )
                sizes_v = jnp.where(
                    lane == r, size_r.astype(jnp.float32), sizes_v
                )
                return roots_v, sizes_v

            roots_v = jnp.zeros((1, krp), jnp.float32)
            sizes_v = jnp.full((1, krp), -1.0, jnp.float32)
            if mode == "noloop":
                roots_v = roots_v + ranked[0, 0]
            elif mode == "noreduce":
                roots_v, sizes_v = jax.lax.fori_loop(
                    0, jnp.minimum(n_roots, kr), body_noreduce,
                    (roots_v, sizes_v),
                )
            else:
                roots_v, sizes_v = jax.lax.fori_loop(
                    0, jnp.minimum(n_roots, kr), body, (roots_v, sizes_v)
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
                    (1, hc, wc), lambda i: (i, 0, 0),
                    memory_space=pltpu.VMEM,
                )
            ],
            out_specs=pl.BlockSpec(
                (1, 8, krp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((b, 8, krp), jnp.float32),
        )(labels)
        return out

    def timeit(name, fn, *args):
        out = fn(*args)
        chk = np.asarray(jnp.ravel(out)[:1])
        t0 = time.perf_counter()
        for _ in range(30):
            out = fn(*args)
        chk = np.asarray(jnp.ravel(out)[:1])
        dt = (time.perf_counter() - t0) / 30 * 1e3
        print(f"{name:>28}: {dt:7.2f} ms", flush=True)
        return dt

    r1, s1, n1 = rank_roots_kernel(labels1, kr, params.min_component_px)
    nroots = np.asarray(n1)
    print(
        f"grid {hc}x{wc} kr={kr} n_roots: mean {nroots.mean():.1f} "
        f"max {nroots.max()} min {nroots.min()}"
    )

    timeit("rank full", lambda l: rank_var(l, kr, 3, "full"), labels1)
    timeit("rank no-prefilter", lambda l: rank_var(l, kr, 3, "nopre"),
           labels1)
    timeit("rank no-loop", lambda l: rank_var(l, kr, 3, "noloop"),
           labels1)
    timeit("rank loop-no-reduce",
           lambda l: rank_var(l, kr, 3, "noreduce"), labels1)

    # fit_lanes: full vs lane counts (cost should track used lanes)
    used_r = jnp.arange(kr, dtype=jnp.int32)[None, :] < n1[:, None]
    sizes_m = jnp.where(used_r, s1, -1)
    sizes, sel = jax.lax.top_k(sizes_m, k)
    roots = jnp.take_along_axis(r1, sel, axis=1)
    lane_used = sizes >= 0
    sizes_pos = jnp.maximum(sizes, 0)
    print("used lanes/frame mean:",
          float(jnp.mean(jnp.sum(lane_used, axis=1))))
    timeit(
        "fit_lanes full",
        lambda l: fit_lanes_kernel(
            l, roots, sizes_pos, lane_used, ds, params.containment_slack
        )[0],
        labels1,
    )
    half = lane_used & (
        jnp.arange(k, dtype=jnp.int32)[None, :] % 2 == 0
    )
    timeit(
        "fit_lanes half-lanes",
        lambda l: fit_lanes_kernel(
            l, roots, sizes_pos, half, ds, params.containment_slack
        )[0],
        labels1,
    )
    none = jnp.zeros_like(lane_used)
    timeit(
        "fit_lanes no-lanes",
        lambda l: fit_lanes_kernel(
            l, roots, sizes_pos, none, ds, params.containment_slack
        )[0],
        labels1,
    )

    # ---- scratch per-lane-chain variant with reductions stubbed ----
    # Same plane ops as fit_lanes_kernel; every jnp.sum/max/min plane
    # reduction replaced by a [0, 0] element read (garbage outputs —
    # attribution only).
    @functools.partial(jax.jit, static_argnames=("ds", "cs", "mode"))
    def fit_var(labels, roots, sizes, use, ds, cs, mode):
        b, hc, wc = labels.shape
        k = roots.shape[1]
        p = hc * wc
        kp = _round_up(k, 8)
        params_ = jnp.zeros((b, 8, 128), jnp.float32)
        params_ = params_.at[:, 0, :k].set(roots.astype(jnp.float32))
        params_ = params_.at[:, 1, :k].set(sizes.astype(jnp.float32))
        params_ = params_.at[:, 2, :k].set(use.astype(jnp.float32))

        def kernel(lab_ref, par_ref, out_ref):
            lab = lab_ref[0]
            ri = jax.lax.broadcasted_iota(jnp.int32, (hc, wc), 0)
            ci = jax.lax.broadcasted_iota(jnp.int32, (hc, wc), 1)
            lin = ri * wc + ci
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
            cxs = (ds - 1) * 0.5
            cxp = ci.astype(jnp.float32) * ds + cxs
            cyp = ri.astype(jnp.float32) * ds + cxs
            slack = cs * ds

            def red_sum(x):
                if mode == "noreduce":
                    return x[0, 0]
                return jnp.sum(x)

            def red_max(x):
                if mode == "noreduce":
                    return x[0, 0]
                return jnp.max(x)

            def red_min(x):
                if mode == "noreduce":
                    return x[0, 0]
                return jnp.min(x)

            for kk in range(k):
                root_k = par_ref[0, 0, kk].astype(jnp.int32)
                size_k = par_ref[0, 1, kk]
                lane_used = par_ref[0, 2, kk] > 0.5

                @pl.when(lane_used)
                def _(kk=kk, root_k=root_k, size_k=size_k):
                    member = lab == root_k
                    szf = jnp.maximum(size_k, 1.0)
                    cenx = red_sum(jnp.where(member, cxp, 0.0)) / szf
                    ceny = red_sum(jnp.where(member, cyp, 0.0)) / szf

                    def amax(score):
                        s = jnp.where(member, score, -jnp.inf)
                        m = red_max(s)
                        cand = jnp.where(s == m, lin, jnp.int32(p))
                        return red_min(cand).astype(jnp.int32)

                    def amin(score):
                        s = jnp.where(member, score, jnp.inf)
                        m = red_min(s)
                        cand = jnp.where(s == m, lin, jnp.int32(p))
                        return red_min(cand).astype(jnp.int32)

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
                    idd = amin(cross)
                    bx, by = cx_of(ib), cy_of(ib)
                    ddx, ddy = cx_of(idd), cy_of(idd)
                    area2 = (
                        ax * by - bx * ay + bx * qcy - qcx * by
                        + qcx * ddy - ddx * qcy + ddx * ay - ax * ddy
                    )
                    sgn = jnp.where(area2 >= 0, 1.0, -1.0)
                    inside = jnp.ones((hc, wc), dtype=bool)
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
                        inside = inside & (
                            cyp * av - cxp * bv + c0 >= -slack * elen
                        )
                    frac = red_sum(
                        jnp.where(member & inside, 1.0, 0.0)
                    ) / szf
                    vals = [ax, ay, bx, by, qcx, qcy, ddx, ddy,
                            frac, cenx, ceny]
                    row = jnp.zeros((1, 128), jnp.float32)
                    for fi, v in enumerate(vals):
                        row = jnp.where(lane == fi, v, row)
                    out_ref[0, kk] = row[0]

                @pl.when(jnp.logical_not(lane_used))
                def _(kk=kk):
                    out_ref[0, kk] = jnp.zeros((128,), jnp.float32)

            for extra in range(k, kp):
                out_ref[0, extra] = jnp.zeros((128,), jnp.float32)

        return pl.pallas_call(
            kernel,
            grid=(b,),
            in_specs=[
                pl.BlockSpec(
                    (1, hc, wc), lambda i: (i, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 8, 128), lambda i: (i, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, kp, 128), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((b, kp, 128), jnp.float32),
        )(labels, params_)

    cs = params.containment_slack
    timeit(
        "fit_var full (ctrl)",
        lambda l: fit_var(l, roots, sizes_pos, lane_used, ds, cs, "full"),
        labels1,
    )
    timeit(
        "fit_var no-reduce",
        lambda l: fit_var(
            l, roots, sizes_pos, lane_used, ds, cs, "noreduce"
        ),
        labels1,
    )


if __name__ == "__main__":
    main()
