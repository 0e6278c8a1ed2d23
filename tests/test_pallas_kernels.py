"""Pallas kernels vs their XLA oracles (interpret mode on CPU)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aruco3_tpu import frontend, rectify, segment
from aruco3_tpu.dictionaries import ARDictionary
from aruco3_tpu.ops.frontend_pallas import fused_threshold_open_pool
from aruco3_tpu.ops.warp_pallas import warp_eval
from aruco3_tpu.render import render_marker


@pytest.mark.parametrize(
    "shape,ds", [((2, 123, 217), 3), ((1, 480, 640), 4), ((2, 96, 128), 2)]
)
def test_fused_frontend_matches_xla(shape, ds, rng):
    g = rng.integers(0, 256, size=shape, dtype=np.uint8)
    bref = jax.vmap(
        lambda x: segment.open_mask(~frontend.adaptive_threshold(x, 7), 2)
    )(jnp.asarray(g))
    cref = jax.vmap(lambda x: segment.pool_black(x, ds))(bref)
    black, coarse = fused_threshold_open_pool(
        jnp.asarray(g), 7, 2, ds, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(black), np.asarray(bref))
    np.testing.assert_array_equal(np.asarray(coarse), np.asarray(cref))


@pytest.mark.parametrize(
    "shape,ds",
    [((1, 123, 217), 3), ((1, 240, 320), 4), ((1, 270, 2400), 10)],
)
def test_fused_frontend_packed_plane(shape, ds, rng):
    """emit_packed bits 0-8 must equal the XLA packed plane; the padding
    (which the refinement kernel DMAs into) must be written zeros.
    The wide case exercises the column-tiled (4K-class) path."""
    g = rng.integers(0, 256, size=shape, dtype=np.uint8)
    h, w = shape[1], shape[2]
    black, coarse, packed = fused_threshold_open_pool(
        jnp.asarray(g), 7, 2, ds, interpret=True, emit_packed=True
    )
    bref = jax.vmap(
        lambda x: segment.open_mask(~frontend.adaptive_threshold(x, 7), 2)
    )(jnp.asarray(g))
    zero_inner = jnp.zeros(
        (shape[0], -(-h // ds), -(-w // ds)), dtype=bool
    )
    pref = jax.vmap(
        lambda gg, bb, ii: segment.build_packed_plane(gg, bb, ii, ds)
    )(jnp.asarray(g), bref, zero_inner)
    got = np.asarray(packed)
    np.testing.assert_array_equal(got[:, :h, :w], np.asarray(pref))
    np.testing.assert_array_equal(np.asarray(black), np.asarray(bref))
    assert (got[:, h:, :] == 0).all()
    assert (got[:, :, w:] == 0).all()


def test_fused_frontend_marker_image(rng):
    d = ARDictionary.new_from_named_dict("ARUCO_DEFAULT")
    corners = np.array([[60, 50], [260, 60], [250, 250], [55, 240]], float)
    img = render_marker(d, 7, (320, 300), corners, noise_sigma=2.0)
    bref = segment.open_mask(
        ~frontend.adaptive_threshold(jnp.asarray(img), 7), 2
    )
    cref = segment.pool_black(bref, 4)
    black, coarse = fused_threshold_open_pool(
        jnp.asarray(img), 7, 2, 4, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(black), np.asarray(bref))
    np.testing.assert_array_equal(np.asarray(coarse), np.asarray(cref))


def test_refine_pallas_matches_xla(rng):
    from aruco3_tpu.ops.refine_pallas import refine_corners_batch

    b, k, h, w, ds = 2, 6, 240, 320, 8
    wn = segment.refine_window_size(segment.QuadParams(), ds)
    grey = jnp.asarray(rng.integers(0, 256, size=(b, h, w), dtype=np.uint8))
    black = jnp.asarray(rng.random((b, h, w)) < 0.3)
    inner_coarse = jnp.asarray(
        rng.random((b, -(-h // ds), -(-w // ds))) < 0.5
    )
    quads = jnp.asarray(
        rng.uniform(10, 200, size=(b, k, 4, 2)).astype(np.float32)
    )
    cents = jnp.mean(quads, axis=2)
    is_inner = jnp.asarray(rng.random((b, k)) < 0.5)

    ref = jax.vmap(
        lambda bl, q, c, g, ic, ii: segment.refine_corners(
            bl, q, c, ds, wn, grey=g, inner_coarse=ic, is_inner=ii
        )
    )(black, quads, cents, grey, inner_coarse, is_inner)

    packed = jax.vmap(
        lambda g, bl, ic: segment.build_packed_plane(g, bl, ic, ds)
    )(grey, black, inner_coarse)
    got = refine_corners_batch(
        packed, quads, cents, is_inner, ds, wn, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_warp_pallas_matches_mxu(rng):
    h, w, K, S = 480, 640, 8, 49
    grey = jnp.asarray(rng.integers(0, 256, size=(h, w), dtype=np.uint8))
    quads = jnp.asarray(
        rng.uniform(50, 400, size=(K, 4, 2)).astype(np.float32)
    )
    levels = max(1, int(math.ceil(math.log2(max(h, w) / 60.0))) + 1)
    pyr = rectify.build_pyramid(grey, levels)
    H, _ = rectify.homography_square_to_quad(quads, S)
    a = np.asarray(rectify.warp_patches_mxu(pyr, H, quads, S))
    windows, ux, uy, bad = rectify._warp_setup(pyr, H, quads, S)
    v = warp_eval(windows, ux, uy, interpret=True)
    b = np.asarray(jnp.where(bad, 0.0, v).reshape(K, S, S))
    # Both paths round through bf16; agreement within one grey level.
    assert np.abs(a - b).max() < 1.5
