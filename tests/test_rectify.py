"""Rectification/decode tests (reference aruco.rs:234-326 semantics)."""

import jax.numpy as jnp
import numpy as np
import pytest

from aruco3_tpu import rectify
from aruco3_tpu.dictionaries import ARDictionary
from aruco3_tpu.render import render_marker


def test_homography_square_to_quad_maps_corners():
    quad = np.array(
        [[[200.0, 140.0], [440.0, 150.0], [430.0, 380.0], [190.0, 370.0]]],
        dtype=np.float32,
    )
    H, valid = rectify.homography_square_to_quad(jnp.asarray(quad), 49)
    assert np.asarray(valid)[0]
    H = np.asarray(H)[0]
    src = np.array(
        [[0, 0, 1], [49, 0, 1], [49, 49, 1], [0, 49, 1]], dtype=np.float64
    )
    mapped = src @ H.T
    mapped = mapped[:, :2] / mapped[:, 2:3]
    np.testing.assert_allclose(mapped, quad[0], atol=1e-2)


def test_homography_degenerate_quad_invalid():
    quad = np.zeros((1, 4, 2), dtype=np.float32)  # all corners identical
    _, valid = rectify.homography_square_to_quad(jnp.asarray(quad), 49)
    assert not np.asarray(valid)[0]


def test_warp_identity_patch():
    # A quad exactly covering a gradient region: patch should reproduce it.
    img = np.tile(np.arange(100, dtype=np.uint8)[None, :], (100, 1))
    quad = np.array([[[10.0, 10.0], [59.0, 10.0], [59.0, 59.0], [10.0, 59.0]]])
    H, _ = rectify.homography_square_to_quad(jnp.asarray(quad, jnp.float32), 49)
    patch = np.asarray(rectify.warp_patches(jnp.asarray(img), H, 49))[0]
    # patch x=0 samples img x=10, patch x=48 samples img x=58
    assert abs(patch[0, 0] - 10) < 1.0
    assert abs(patch[0, 48] - 58) < 1.0
    assert abs(patch[24, 24] - 34) < 1.0


def test_warp_out_of_bounds_black():
    img = np.full((50, 50), 200, dtype=np.uint8)
    quad = np.array([[[-30.0, -30.0], [-5.0, -30.0], [-5.0, -5.0], [-30.0, -5.0]]])
    H, _ = rectify.homography_square_to_quad(jnp.asarray(quad, jnp.float32), 49)
    patch = np.asarray(rectify.warp_patches(jnp.asarray(img), H, 49))[0]
    assert (patch == 0).all()


def test_otsu_bimodal():
    rng = np.random.default_rng(3)
    a = rng.normal(40, 5, size=(49 * 49 // 2))
    b = rng.normal(200, 5, size=(49 * 49 - a.size))
    patch = np.concatenate([a, b]).reshape(1, 49, 49)
    level = int(np.asarray(rectify.otsu_level(jnp.asarray(patch, jnp.float32)))[0])
    # The between-class variance is flat across the empty valley; ties go to
    # the first (lowest) level, so the cut lands just above the dark mode.
    assert 50 < level < 190
    binar = patch > level
    assert binar.mean() == pytest.approx(0.5, abs=0.01)


def test_resize_triangle_preserves_constant():
    patch = np.full((1, 49, 49), 173.0, dtype=np.float32)
    out = np.asarray(rectify.resize_triangle(jnp.asarray(patch), 7))
    np.testing.assert_allclose(out, 173.0, atol=1e-3)


def test_decode_rendered_marker_all_dicts():
    # Render each dictionary's marker 0 fronto-parallel and decode the grid
    # directly (no detection): one of the 4 rotations must match the code.
    for name in (
        "ARUCO_DEFAULT",
        "APRILTAG_16H5",
        "APRILTAG_36H11",
        "CHILITAGS",
        "ARUCO_MIP_36H12",
    ):
        d = ARDictionary.new_from_named_dict(name)
        corners = np.array(
            [[30.0, 30.0], [226.0, 30.0], [226.0, 226.0], [30.0, 226.0]]
        )
        img = render_marker(d, 0, (256, 256), corners, noise_sigma=0.0)
        quad = jnp.asarray(corners[None], jnp.float32)
        H, hv = rectify.homography_square_to_quad(quad, 49)
        patches = rectify.warp_patches(jnp.asarray(img), H, 49)
        bits, valid = rectify.decode_patches(patches, d.get_mark_size())
        assert np.asarray(hv)[0] and np.asarray(valid)[0], name
        ids, dists = d.find_nearest_bits(bits[0])
        dists = np.asarray(dists)
        ids = np.asarray(ids)
        best = dists.argmin()
        assert dists[best] == 0, (name, dists)
        assert ids[best] == 0, (name, ids)
        # LSB-first rendering + MSB-first decode = the match sits at
        # rotation 2 (180 degrees), see dictionaries.rs:211 TODO.
        assert best == 2, (name, dists)


def test_bits_to_u32_pairs_roundtrip(rng):
    for nb in (16, 25, 36, 64):
        mask = (
            ~np.uint64(0)
            if nb >= 64
            else (np.uint64(1) << np.uint64(nb)) - np.uint64(1)
        )
        vals = rng.integers(0, 2**63, size=8, dtype=np.uint64) & mask
        bits = ((vals[:, None] >> np.arange(nb, dtype=np.uint64)) & 1).astype(
            np.int32
        )
        pairs = np.asarray(rectify.bits_to_u32_pairs(jnp.asarray(bits)))
        back = pairs[:, 0].astype(np.uint64) | (
            pairs[:, 1].astype(np.uint64) << np.uint64(32)
        )
        np.testing.assert_array_equal(back, vals)
