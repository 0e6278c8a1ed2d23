"""IPPE pose solver tests, incl. the golden C++ IPPE parity vectors
(carried from reference src/pose.rs:350-598)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aruco3_tpu import pose
from aruco3_tpu.camera import CameraIntrinsics


def test_marker_transforms():
    # reference pose.rs:379-392
    p = pose.MarkerPose(
        error=jnp.asarray(0.0),
        rotation=jnp.array(
            [[0.0, 0.0, 1.0], [0.0, 1.0, 0.0], [1.0, 0.0, 0.0]]
        ),
        translation=jnp.array([1.0, 2.0, 3.0]),
    )
    pts = np.array([[0.0, 0.0, 0.0], [7.0, 11.0, 13.0]])
    out = np.asarray(p.apply_transform_to_points(pts))
    np.testing.assert_allclose(
        out, [[1.0, 2.0, 3.0], [14.0, 13.0, 10.0]], atol=1e-6
    )


def test_marker_identity_random(rng):
    # reference pose.rs:394-439 — random rigid transforms must invert exactly.
    failures = 0
    for _ in range(50):
        t = rng.random(3).astype(np.float32)
        row1 = np.array([1 + rng.random(), 1 + rng.random(), 0.0])
        row2 = np.array([0.0, 1.1 + rng.random(), 1 + rng.random()])
        row1 /= np.linalg.norm(row1)
        row2 /= np.linalg.norm(row2)
        row3 = np.cross(row1, row2)
        row3 /= np.linalg.norm(row3)
        for _ in range(10):
            row2 = np.cross(row3, row1)
            row1 = np.cross(row2, row3)
        row1 /= np.linalg.norm(row1)
        row2 /= np.linalg.norm(row2)
        row3 /= np.linalg.norm(row3)
        R = np.stack([row1, row2, row3], axis=1).astype(np.float32)
        p = pose.MarkerPose(
            error=jnp.asarray(0.0),
            rotation=jnp.asarray(R),
            translation=jnp.asarray(t),
        )
        pts = rng.random((20, 3)).astype(np.float32)
        round_trip = np.asarray(
            p.apply_inverse_transform_to_points(
                p.apply_transform_to_points(pts)
            )
        )
        if np.abs(round_trip - pts).sum(axis=-1).max() > 1e-5:
            failures += 1
    assert failures == 0


def test_gen_marker_square():
    # reference pose.rs:441-455
    sq = np.asarray(pose.make_marker_square(11.0))
    np.testing.assert_allclose(
        sq,
        [
            [-5.5, 5.5, 0.0],
            [5.5, 5.5, 0.0],
            [5.5, -5.5, 0.0],
            [-5.5, -5.5, 0.0],
        ],
    )


def test_homography_solve():
    # Golden values from reference pose.rs:457-474.
    target = jnp.array([[0.1, 0.1], [0.3, 0.1], [0.3, 0.3], [0.1, 0.3]])
    expected = np.array(
        [
            [0.01818181818181819, 0.0, 0.2],
            [0.0, -0.01818181818181819, 0.2],
            [0.0, 0.0, 1.0],
        ]
    )
    h = np.asarray(
        pose.compute_homography_from_marker_square(11.0, target)
    )
    assert np.abs(h - expected).sum() < 1e-5


def test_homography_solve2():
    # Golden values from reference pose.rs:554-572.
    pts = jnp.array(
        [
            [-0.090, -0.089],
            [-0.095, -0.150],
            [-0.080, -0.170],
            [-0.075, -0.090],
        ]
    )
    expected = np.array(
        [
            [0.0001197249881460392, -0.00193812233285917, -0.08585585585585585],
            [-0.003084400189663352, -0.00115457562825984, -0.1225675675675677],
            [-0.004504504504504568, 0.01351351351351346, 1.0],
        ]
    )
    h = np.asarray(pose.compute_homography_from_marker_square(19.0, pts))
    assert np.abs(h - expected).max() < 1e-5


def test_canonical_solve():
    # Golden values from reference pose.rs:476-512.
    target = jnp.array([[0.1, 0.1], [0.3, 0.1], [0.3, 0.3], [0.1, 0.3]])
    sq = pose.make_marker_square(11.0)
    h = pose.compute_homography_from_marker_square(11.0, target)
    rot, tr, err = pose.solve_canonical_form(sq, target, h)
    rot, tr = np.asarray(rot), np.asarray(tr)
    rot_a = np.array(
        [[1.0, 0.0, 0.0], [0.0, -1.0, 0.0], [0.0, 0.0, -1.0]]
    )
    t_a = np.array([11.0, 11.0, 55.0])
    rot_b = np.array(
        [
            [0.9259259259259256, 0.07407407407407443, -0.3703703703703712],
            [-0.0740740740740744, -0.9259259259259256, -0.3703703703703713],
            [-0.3703703703703712, 0.3703703703703713, -0.8518518518518512],
        ]
    )
    t_b = np.array([10.79629629629629, 10.79629629629629, 55.0])
    assert np.abs(rot[0] - rot_a).sum() < 1e-5
    assert np.abs(rot[1] - rot_b).sum() < 1e-5
    assert np.abs(tr[0] - t_a).sum() < 1e-4
    assert np.abs(tr[1] - t_b).sum() < 1e-4


def test_e2e_pose():
    # Golden values from reference pose.rs:514-552.
    target = [(90, 89), (95, 150), (80, 170), (75, 90)]
    pa, pb = pose.solve_with_undistorted_points(target, 17.0, (1000, 1000))
    pa_t = np.array([20.32196265994096, 29.69316666108512, 238.3658341694123])
    pa_r = np.array(
        [
            [0.07313995850727262, 0.2953796077825095, 0.9525762089070907],
            [0.9973210134149258, -0.02055233410014844, -0.07020254813082821],
            [-0.001158736630905738, 0.9551588814795613, -0.2960914866390682],
        ]
    )
    pb_t = np.array([19.85146615649354, 29.20013946746331, 234.3277337340188])
    pb_r = np.array(
        [
            [0.05174977302896467, 0.1311239186581316, -0.9900143832021767],
            [0.9667844474723887, -0.2550432732960733, 0.01675592050389792],
            [-0.2502994069448807, -0.957997623536802, -0.1399669967559523],
        ]
    )
    assert np.abs(np.asarray(pa.rotation) - pa_r).sum() < 2e-5
    assert np.abs(np.asarray(pb.rotation) - pb_r).sum() < 2e-5
    assert np.abs(np.asarray(pa.translation) - pa_t).sum() < 5e-4
    assert np.abs(np.asarray(pb.translation) - pb_t).sum() < 5e-4
    # Best-first ordering (reference pose.rs:76-80).
    assert float(pa.error) <= float(pb.error)


def test_e2e_pose2():
    # Golden values from reference pose.rs:554-598.
    pts = [(-0.090, -0.089), (-0.095, -0.150), (-0.080, -0.170), (-0.075, -0.090)]
    pa, pb = pose.solve_with_normalized_points(pts, 19.0)
    pa_t = np.array([-22.712781796404, -33.18648038591866, 266.408873483460])
    pa_r = np.array(
        [
            [-0.07313995850727262, -0.2953796077825095, -0.9525762089070907],
            [-0.9973210134149258, 0.02055233410014844, 0.07020254813082821],
            [-0.001158736630905738, 0.9551588814795613, -0.2960914866390682],
        ]
    )
    pb_t = np.array([-22.18693276313984, -32.6354499930472, 261.8957024086092])
    pb_r = np.array(
        [
            [-0.05174977302896467, -0.1311239186581316, 0.9900143832021767],
            [-0.9667844474723887, 0.2550432732960733, -0.01675592050389792],
            [-0.2502994069448807, -0.957997623536802, -0.1399669967559523],
        ]
    )
    assert np.abs(np.asarray(pa.rotation) - pa_r).max() < 1e-5
    assert np.abs(np.asarray(pb.rotation) - pb_r).max() < 1e-5
    assert np.abs(np.asarray(pa.translation) - pa_t).max() < 1e-3
    assert np.abs(np.asarray(pb.translation) - pb_t).max() < 1e-3


def test_solve_with_intrinsics_matches_manual_unprojection():
    intr = CameraIntrinsics.new(640, 480, 500.0, 500.0)
    corners = [(300, 200), (340, 202), (338, 242), (298, 240)]
    pa, _ = pose.solve_with_intrinsics(corners, 50.0, intr)
    manual = [
        ((x - intr.principal_x) / intr.focal_x, (y - intr.principal_y) / intr.focal_y)
        for x, y in corners
    ]
    pa2, _ = pose.solve_with_normalized_points(manual, 50.0)
    np.testing.assert_allclose(
        np.asarray(pa.translation), np.asarray(pa2.translation), atol=1e-6
    )


def test_batched_solve_matches_scalar():
    rng = np.random.default_rng(7)
    batch = []
    for _ in range(8):
        # Random plausible quads in normalized coords.
        c = rng.uniform(-0.3, 0.3, size=2)
        r = rng.uniform(0.05, 0.15)
        ang = rng.uniform(0, 2 * np.pi)
        quad = []
        for k in range(4):
            a = ang + k * np.pi / 2 + rng.uniform(-0.2, 0.2)
            quad.append(c + r * np.array([np.cos(a), np.sin(a)]))
        batch.append(quad)
    batch = np.array(batch, dtype=np.float32)  # (8, 4, 2)
    rot, tr, err = jax.jit(pose.solve_normalized_batch, static_argnums=())(
        jnp.asarray(batch), 20.0
    )
    for i in range(8):
        pa, pb = pose.solve_with_normalized_points(batch[i], 20.0)
        np.testing.assert_allclose(
            np.asarray(rot)[i, 0], np.asarray(pa.rotation), atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(tr)[i, 1], np.asarray(pb.translation), atol=1e-2
        )


def test_estimate_pose_alias():
    target = [(90, 89), (95, 150), (80, 170), (75, 90)]
    pa, pb = pose.estimate_pose(target, 17.0, (1000, 1000))
    assert float(pa.error) <= float(pb.error)
