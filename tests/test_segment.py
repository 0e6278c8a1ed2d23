"""Quad-extraction tests: CCL, quad fitting, and the geometry filters with
reference semantics (aruco.rs:124-232)."""

import jax.numpy as jnp
import numpy as np

from aruco3_tpu import segment


def test_label_components_two_blobs():
    m = np.zeros((32, 32), dtype=bool)
    m[2:10, 2:10] = True
    m[20:30, 18:28] = True
    labels = np.asarray(segment.label_components(jnp.asarray(m), 8))
    p = 32 * 32
    assert (labels[~m] == p).all()
    l1 = labels[2:10, 2:10]
    l2 = labels[20:30, 18:28]
    assert (l1 == l1[0, 0]).all()
    assert (l2 == l2[0, 0]).all()
    assert l1[0, 0] != l2[0, 0]


def test_label_components_ring():
    # A thin ring must converge to a single label (worst case for
    # propagation depth).
    m = np.zeros((64, 64), dtype=bool)
    m[8:56, 8:56] = True
    m[10:54, 10:54] = False  # 2px ring
    labels = np.asarray(segment.label_components(jnp.asarray(m), 16))
    vals = labels[m]
    assert (vals == vals[0]).all()


def test_fit_quads_rotated_square():
    # Rasterize a rotated filled square, fit, and compare to true corners.
    h = w = 96
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    ang = 0.5
    c, s = np.cos(ang), np.sin(ang)
    u = (xx - 48) * c + (yy - 48) * s
    v = -(xx - 48) * s + (yy - 48) * c
    m = (np.abs(u) <= 25) & (np.abs(v) <= 25)
    labels = segment.label_components(jnp.asarray(m), 12)
    fit = segment.fit_quads(labels, ds=1, params=segment.QuadParams(max_candidates=4))
    valid = np.asarray(fit["valid"])
    assert valid[0]
    quads = np.asarray(fit["quads"])[0]
    true = []
    for su, sv in [(-25, -25), (25, -25), (25, 25), (-25, 25)]:
        true.append([48 + su * c - sv * s, 48 + su * s + sv * c])
    true = np.array(true)
    # Every fitted corner is near some true corner.
    for q in quads:
        assert np.min(np.linalg.norm(true - q, axis=-1)) < 3.0


def test_fit_rejects_disk():
    h = w = 96
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    m = (xx - 48) ** 2 + (yy - 48) ** 2 <= 30**2
    labels = segment.label_components(jnp.asarray(m), 12)
    fit = segment.fit_quads(labels, ds=1, params=segment.QuadParams(max_candidates=4))
    assert not np.asarray(fit["valid"])[0]


def test_enforce_clockwise():
    # reference aruco.rs:400-412 (y-down screen space)
    clockwise = np.array([[0, 0], [0, 1], [1, 1], [1, 0]], dtype=np.float32)
    counter = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], dtype=np.float32)
    out = np.asarray(
        segment.enforce_clockwise(jnp.asarray(np.stack([clockwise, counter])))
    )
    np.testing.assert_array_equal(out[0], out[1])


def test_min_edge_gate_quirk():
    # The squared min edge is compared against the linear threshold
    # (reference aruco.rs:149-156).  A 10px square has edge_sq=100.
    quad = np.array([[[0, 0], [10, 0], [10, 10], [0, 10]]], dtype=np.float32)
    assert np.asarray(segment.min_edge_gate(jnp.asarray(quad), 100.0))[0]
    assert not np.asarray(segment.min_edge_gate(jnp.asarray(quad), 101.0))[0]


def test_discard_too_near():
    # reference aruco.rs:446-459: 4 near-identical quads -> 1 survivor.
    quads = np.array(
        [
            [[0, 0], [10, 0], [10, 10], [0, 10]],
            [[1, 0], [10, 0], [10, 10], [0, 10]],
            [[0, 0], [10, 2], [10, 10], [0, 10]],
            [[0, 0], [10, 0], [10, 10], [3, 10]],
        ],
        dtype=np.float32,
    )
    valid = np.ones(4, dtype=bool)
    out = np.asarray(
        segment.discard_too_near(jnp.asarray(quads), jnp.asarray(valid), 10.0)
    )
    assert out.sum() == 1


def test_discard_too_near_keeps_distant():
    quads = np.array(
        [
            [[0, 0], [10, 0], [10, 10], [0, 10]],
            [[100, 100], [110, 100], [110, 110], [100, 110]],
        ],
        dtype=np.float32,
    )
    valid = np.ones(2, dtype=bool)
    out = np.asarray(
        segment.discard_too_near(jnp.asarray(quads), jnp.asarray(valid), 10.0)
    )
    assert out.all()


def test_pool_black_band_sensitivity():
    m = np.zeros((8, 8), dtype=bool)
    m[0:4, 0:4] = True
    pooled = np.asarray(segment.pool_black(jnp.asarray(m), 4))
    assert pooled[0, 0] and not pooled[0, 1] and not pooled[1, 1]
    # A 3px band crossing a cell must register (count >= ds/2)...
    m2 = np.zeros((8, 8), dtype=bool)
    m2[2:5, :] = True
    pooled2 = np.asarray(segment.pool_black(jnp.asarray(m2), 8))
    assert pooled2[0, 0]
    # ...but a single residual speck must not.
    m3 = np.zeros((8, 8), dtype=bool)
    m3[3, 3] = True
    pooled3 = np.asarray(segment.pool_black(jnp.asarray(m3), 8))
    assert not pooled3[0, 0]


def test_open3_denoises():
    rng = np.random.default_rng(0)
    noise = rng.random((64, 64)) < 0.3  # salt-and-pepper
    band = np.zeros((64, 64), dtype=bool)
    band[30:38, :] = True
    cleaned = np.asarray(segment.open3(jnp.asarray(noise & ~band)))
    assert cleaned.mean() < 0.02  # specks gone
    cleaned_band = np.asarray(segment.open3(jnp.asarray(band)))
    assert cleaned_band[33, 30:40].all()  # band interior intact


def test_inner_pass_component_enclosed_by_border_band():
    """A component inside the filled hole of a BORDER-CONNECTED closed
    band: pass 1 merges it with the band (the blob root lies on the
    band), so depth 0's pass-1 label reuse must not swallow it — the
    rescue gate defers it to the next peel depth, where it gets its own
    root (the reference follows its hole border, aruco.rs:64)."""
    h = w = 48
    m = np.zeros((h, w), bool)
    m[8, 8:40] = True
    m[39, 8:40] = True
    m[8:40, 8] = True
    m[8:40, 39] = True
    m[0:8, 20] = True        # strut: band is border-connected
    m[20:26, 20:26] = True   # enclosed component
    params = segment.QuadParams(max_candidates=8, max_inner_candidates=8)
    labels, labels2 = segment.label_planes(jnp.asarray(m), params)
    labels2 = np.asarray(labels2)
    inner = np.zeros((h, w), bool)
    inner[20:26, 20:26] = True
    lin = np.arange(h * w).reshape(h, w)
    vals = labels2[inner]
    assert (vals == vals[0]).all() and vals[0] != h * w
    # Root convention: the component's label is one of its OWN cells.
    assert ((labels2 == lin) & inner).any()
