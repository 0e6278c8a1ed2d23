"""Robustness: false positives, heavy noise, scale/rotation sweeps."""

import numpy as np
import pytest

from aruco3_tpu import ARDictionary, Detector, DetectorConfig
from aruco3_tpu.render import random_marker_scene, render_marker


@pytest.fixture(scope="module")
def det():
    return Detector(
        DetectorConfig(), ARDictionary.new_from_named_dict("ARUCO_DEFAULT")
    )


def test_no_false_positives_on_noise(det):
    rng = np.random.default_rng(0)
    fp = 0
    for _ in range(6):
        img = rng.integers(0, 256, size=(480, 640), dtype=np.uint8)
        fp += len(det.detect(img).markers)
    assert fp == 0


def test_no_false_positives_on_structure(det):
    # Non-marker structure: filled disks and stripes must not decode.
    img = np.full((480, 640), 255, dtype=np.uint8)
    yy, xx = np.meshgrid(np.arange(480), np.arange(640), indexing="ij")
    img[(xx - 160) ** 2 + (yy - 160) ** 2 < 90**2] = 0
    img[:, 400:420] = 0
    img[300:320, :] = 0
    rng = np.random.default_rng(1)
    img = np.clip(
        img.astype(np.float64) + rng.normal(0, 2, img.shape), 0, 255
    ).astype(np.uint8)
    assert len(det.detect(img).markers) == 0


def test_heavy_noise_detection(det):
    # sigma=8 noise: marker must still decode.
    rng = np.random.default_rng(2)
    corners = np.array([[180, 130], [460, 140], [450, 390], [170, 380]], float)
    img = render_marker(
        det.dictionary, 77, (640, 480), corners, noise_sigma=8.0, rng=rng
    )
    out = det.detect(img)
    assert any(m.id == 77 for m in out.markers)


def test_rotation_sweep(det):
    # Full in-plane rotation sweep: every orientation must detect.
    hits = 0
    n = 8
    for i in range(n):
        ang = i * 2 * np.pi / n + 0.1
        c, s = np.cos(ang), np.sin(ang)
        base = np.array([[-0.5, -0.5], [0.5, -0.5], [0.5, 0.5], [-0.5, 0.5]])
        rot = np.array([[c, -s], [s, c]])
        quad = base @ rot.T * 240 + [320, 240]
        img = render_marker(
            det.dictionary, 33, (640, 480), quad, noise_sigma=2.0
        )
        if any(m.id == 33 for m in det.detect(img).markers):
            hits += 1
    assert hits == n


def test_low_contrast(det):
    # Marker at reduced contrast (gray-on-lighter-gray) still detects.
    corners = np.array([[180, 130], [460, 140], [450, 390], [170, 380]], float)
    img = render_marker(
        det.dictionary,
        9,
        (640, 480),
        corners,
        background=170,
        marker_white=170,
        marker_black=90,
        noise_sigma=2.0,
    )
    out = det.detect(img)
    assert any(m.id == 9 for m in out.markers)


def test_corner_accuracy_statistics(det):
    rng = np.random.default_rng(3)
    errs = []
    for _ in range(8):
        mid = int(rng.integers(0, len(det.dictionary)))
        img, truth, _ = random_marker_scene(
            det.dictionary, mid, (640, 480), rng=rng, noise_sigma=2.0
        )
        match = [m for m in det.detect(img).markers if m.id == mid]
        if not match:
            continue
        found = np.array(match[0].corners, float)
        best = min(
            np.linalg.norm(np.roll(found, r, axis=0) - truth, axis=-1).mean()
            for r in range(4)
        )
        errs.append(best)
    assert len(errs) >= 7
    assert np.mean(errs) < 2.5
    assert np.max(errs) < 5.0
