#!/usr/bin/env python3
"""Pose-accuracy simulator: render -> detect -> IPPE -> compare.

Counterpart of the reference's macroquad 3-D harness
(reference examples/macroquad_detect.rs:125-161), which renders a marker
from a known camera pose and displays ground-truth-vs-estimated camera
position error.  This version sweeps a camera orbit, runs the full
detect+pose path on each rendered view, and reports translation/rotation
error statistics.

Usage: python examples/pose_accuracy_sim.py [n_views]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import sys

import numpy as np

from aruco3_tpu import ARDictionary, CameraIntrinsics, Detector, DetectorConfig, pose
from aruco3_tpu.render import project_marker_corners, render_marker


def main() -> None:
    n_views = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    dictionary = ARDictionary.new_from_named_dict("ARUCO_DEFAULT")
    detector = Detector(DetectorConfig(), dictionary)
    intr = CameraIntrinsics.new_from_fov_horizontal(
        np.deg2rad(60.0), 36.0, 640, 480
    )
    # Express intrinsics in pixels for projection (focal in mm * px/mm).
    px_per_mm = 640 / 36.0
    intr_px = CameraIntrinsics.new(
        640, 480, intr.focal_x * px_per_mm, intr.focal_y * px_per_mm
    )
    marker_mm = 40.0
    marker_id = 17

    t_errs, r_errs, misses = [], [], 0
    rng = np.random.default_rng(0)
    for i in range(n_views):
        yaw = rng.uniform(-0.6, 0.6)
        pitch = rng.uniform(-0.5, 0.5)
        cy, sy = np.cos(yaw), np.sin(yaw)
        cp, sp = np.cos(pitch), np.sin(pitch)
        r_yaw = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
        r_pitch = np.array([[1, 0, 0], [0, cp, -sp], [0, sp, cp]])
        # Face the camera: flip Y/Z of the canonical marker frame.
        rot = r_yaw @ r_pitch @ np.diag([1.0, -1.0, -1.0])
        trans = np.array(
            [rng.uniform(-30, 30), rng.uniform(-20, 20), rng.uniform(250, 450)]
        )
        corners = project_marker_corners(rot, trans, marker_mm, intr_px)
        img = render_marker(
            dictionary, marker_id, (640, 480), corners, noise_sigma=2.0,
            rng=rng,
        )
        det = detector.detect(img)
        match = [m for m in det.markers if m.id == marker_id]
        if not match:
            misses += 1
            continue
        best, _alt = pose.solve_with_intrinsics(
            match[0].corners, marker_mm, intr_px
        )
        t_est = np.asarray(best.translation)
        t_errs.append(np.linalg.norm(t_est - trans))
        z_true = rot[:, 2]
        z_est = np.asarray(best.rotation)[:, 2]
        r_errs.append(
            np.degrees(np.arccos(np.clip(np.dot(z_true, z_est), -1, 1)))
        )

    t_errs, r_errs = np.array(t_errs), np.array(r_errs)
    print(f"views: {n_views}  detected: {n_views - misses}")
    if len(t_errs):
        print(
            f"translation error mm: mean={t_errs.mean():.2f} "
            f"p95={np.percentile(t_errs, 95):.2f} max={t_errs.max():.2f}"
        )
        print(
            f"normal-axis error deg: mean={r_errs.mean():.2f} "
            f"p95={np.percentile(r_errs, 95):.2f} max={r_errs.max():.2f}"
        )


if __name__ == "__main__":
    main()
