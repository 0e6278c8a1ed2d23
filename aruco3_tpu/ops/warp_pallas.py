"""Pallas bilinear-evaluation kernel for the perspective warp.

EXPERIMENTAL / SUPERSEDED: the production detector uses
ops.warp_gather (per-window DMAs from three sources, natively batched);
this kernel predates it, keeps the windows-in-XLA split, and survives
as a second implementation exercised by tests/test_pallas_kernels.py —
useful as a minimal example of the transposed-weights MXU evaluation.

The XLA MXU warp (rectify.warp_patches_mxu) materializes the separable
bilinear weight matrices and the T intermediate — (B, K, S^2, 64) tensors,
~2.5 GB of HBM traffic per 64-frame batch.  This kernel evaluates the same
math per candidate entirely in VMEM: build the (S^2, win) weight planes in
registers/VMEM, one MXU matmul against the candidate's window, a weighted
row-sum, and only the (S^2,) sample vector ever touches HBM.

The window selection (pyramid level + dynamic slice) stays in XLA — it is
cheap and shape-polymorphic; the kernel takes the already-selected windows.
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


@functools.partial(jax.jit, static_argnames=("interpret",))
def warp_eval(
    windows: jnp.ndarray,  # (N, win, win) float32 — selected pyramid windows
    ux: jnp.ndarray,  # (N, S2) float32 — sample x in window coords
    uy: jnp.ndarray,  # (N, S2) float32
    interpret: bool = False,
) -> jnp.ndarray:
    """Bilinear samples (N, S2): sum_xy wx[s,x] wy[s,y] window[y,x].

    Out-of-window coordinates produce all-zero weights (black), matching
    rectify.warp_patches_mxu.
    """
    n, win, _ = windows.shape
    s2 = ux.shape[1]
    s2p = _round_up(s2, 128)
    grp = 8  # candidates per grid step
    npad = _round_up(n, grp)

    wpad = jnp.zeros((npad, win, win), jnp.bfloat16)
    wpad = wpad.at[:n].set(windows.astype(jnp.bfloat16))
    # Pad coords far outside the window: zero weights.
    uxp = jnp.full((npad, s2p), -1e6, jnp.float32).at[:n, :s2].set(ux)
    uyp = jnp.full((npad, s2p), -1e6, jnp.float32).at[:n, :s2].set(uy)

    def kernel(win_ref, ux_ref, uy_ref, out_ref):
        jc = jax.lax.broadcasted_iota(jnp.int32, (1, win), 1).astype(
            jnp.float32
        )

        def body(g, _):
            u = ux_ref[g][:, None] - jc  # (s2p, win)
            wx = jnp.maximum(0.0, 1.0 - jnp.abs(u)).astype(jnp.bfloat16)
            v = uy_ref[g][:, None] - jc
            wy = jnp.maximum(0.0, 1.0 - jnp.abs(v))
            t = jnp.dot(
                wx,
                win_ref[g].T,
                preferred_element_type=jnp.float32,
            )  # (s2p, win): t[s, y]
            out_ref[g] = jnp.sum(wy * t, axis=1)
            return 0

        for g in range(grp):  # static unroll: dynamic ref indexing inside
            body(g, 0)         # fori_loop serializes badly in Mosaic

    out = pl.pallas_call(
        kernel,
        grid=(npad // grp,),
        in_specs=[
            pl.BlockSpec(
                (grp, win, win), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (grp, s2p), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (grp, s2p), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (grp, s2p), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((npad, s2p), jnp.float32),
        interpret=interpret,
    )(wpad, uxp, uyp)
    return out[:n, :s2]
