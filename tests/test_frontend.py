"""Frontend tests: luma conversion + adaptive threshold vs a brute-force
oracle (semantics of reference aruco.rs:60-61 / imageproc adaptive_threshold)."""

import jax.numpy as jnp
import numpy as np

from aruco3_tpu import frontend


def brute_force_threshold(grey: np.ndarray, r: int) -> np.ndarray:
    h, w = grey.shape
    out = np.zeros((h, w), dtype=bool)
    g = grey.astype(np.int64)
    for y in range(h):
        for x in range(w):
            y0, y1 = max(0, y - r), min(h - 1, y + r)
            x0, x1 = max(0, x - r), min(w - 1, x + r)
            box = g[y0 : y1 + 1, x0 : x1 + 1]
            out[y, x] = g[y, x] * box.size >= box.sum()
    return out


def test_adaptive_threshold_matches_bruteforce(rng):
    grey = rng.integers(0, 256, size=(37, 53), dtype=np.uint8)
    for r in (1, 3, 7):
        ours = np.asarray(frontend.adaptive_threshold(jnp.asarray(grey), r))
        oracle = brute_force_threshold(grey, r)
        np.testing.assert_array_equal(ours, oracle)


def test_adaptive_threshold_flat_is_white():
    # Exact-mean pixels (flat regions) classify as foreground/white — the
    # hole-fill quad extraction relies on flat background staying white.
    grey = np.full((32, 32), 200, dtype=np.uint8)
    ours = np.asarray(frontend.adaptive_threshold(jnp.asarray(grey), 7))
    assert ours.all()


def test_adaptive_threshold_edge_structure():
    # A black square on white: white pixels near the edge must stay white,
    # black pixels must stay black.
    img = np.full((64, 64), 255, dtype=np.uint8)
    img[20:44, 20:44] = 0
    white = np.asarray(frontend.adaptive_threshold(jnp.asarray(img), 7))
    assert white[19, 32] and white[32, 19]  # white side of the edge
    assert not white[21, 32] and not white[32, 21]  # black side


def test_luma_weights():
    rgb = np.zeros((1, 3, 3), dtype=np.uint8)
    rgb[0, 0] = [255, 0, 0]
    rgb[0, 1] = [0, 255, 0]
    rgb[0, 2] = [0, 0, 255]
    grey = np.asarray(frontend.rgb_to_luma_u8(jnp.asarray(rgb)))
    assert grey[0, 0] == round(0.212671 * 255)
    assert grey[0, 1] == round(0.715160 * 255)
    assert grey[0, 2] == round(0.072169 * 255)


def test_luma_passthrough_and_rgba():
    g = np.arange(12, dtype=np.uint8).reshape(3, 4)
    out = np.asarray(frontend.rgb_to_luma_u8(jnp.asarray(g)))
    np.testing.assert_array_equal(out, g)
    rgba = np.stack([g, g, g, np.full_like(g, 7)], axis=-1)
    out = np.asarray(frontend.rgb_to_luma_u8(jnp.asarray(rgba)))
    np.testing.assert_array_equal(out, g)
