"""End-to-end detector tests: the randomized render->detect->pose round
trip the reference only scaffolded (see SURVEY §4.2), plus API parity
checks against reference aruco.rs behaviour."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aruco3_tpu import (
    ARDictionary,
    Detection,
    Detector,
    DetectorConfig,
    pose,
)
from aruco3_tpu.render import (
    project_marker_corners,
    random_marker_scene,
    render_marker,
)
from aruco3_tpu.camera import CameraIntrinsics


def cyclic_corner_error(found, truth):
    """Min over cyclic shifts of the mean corner distance."""
    found = np.asarray(found, dtype=np.float64)
    best = np.inf
    for r in range(4):
        err = np.linalg.norm(np.roll(found, r, axis=0) - truth, axis=-1).mean()
        best = min(best, err)
    return best


@pytest.fixture(scope="module")
def aruco_detector():
    return Detector(
        DetectorConfig(), ARDictionary.new_from_named_dict("ARUCO_DEFAULT")
    )


def test_detect_single_marker(aruco_detector):
    d = aruco_detector.dictionary
    corners = np.array([[200, 140], [440, 150], [430, 380], [190, 370]], float)
    img = render_marker(d, 5, (640, 480), corners, noise_sigma=2.0)
    det = aruco_detector.detect(img)
    assert len(det.markers) == 1
    m = det.markers[0]
    assert m.id == 5
    assert m.hamming_distance == 0
    assert cyclic_corner_error(m.corners, corners) < 2.0
    # Detection exposes intermediates (reference aruco.rs:15-21).
    assert det.grey is not None and det.grey.shape == (480, 640)
    assert len(det.candidates) >= 1
    assert len(det.homographies) == len(det.candidates)
    assert det.homographies[0].shape == (49, 49)


def test_detect_noiseless(aruco_detector):
    d = aruco_detector.dictionary
    corners = np.array([[150, 120], [470, 140], [450, 400], [170, 380]], float)
    img = render_marker(d, 42, (640, 480), corners, noise_sigma=0.0)
    det = aruco_detector.detect(img)
    assert any(m.id == 42 for m in det.markers)


def test_randomized_e2e_recall(aruco_detector):
    """Randomized single-marker scenes: >=95% recall, exact ids."""
    d = aruco_detector.dictionary
    rng = np.random.default_rng(123)
    n, hits = 24, 0
    for _ in range(n):
        mid = int(rng.integers(0, len(d)))
        img, truth, _ = random_marker_scene(d, mid, (640, 480), rng=rng)
        det = aruco_detector.detect(img)
        match = [m for m in det.markers if m.id == mid]
        if match and cyclic_corner_error(match[0].corners, truth) < 4.0:
            hits += 1
    assert hits / n >= 0.95, f"recall {hits}/{n}"


def test_multiple_markers(aruco_detector):
    d = aruco_detector.dictionary
    img = np.full((480, 640), 255, dtype=np.uint8)
    quads = {
        7: np.array([[60, 60], [220, 64], [216, 220], [56, 216]], float),
        99: np.array([[380, 240], [560, 250], [550, 430], [370, 420]], float),
    }
    for mid, q in quads.items():
        sub = render_marker(d, mid, (640, 480), q, noise_sigma=0.0, background=255)
        img = np.minimum(img, sub)
    rng = np.random.default_rng(5)
    img = np.clip(
        img.astype(np.float64) + rng.normal(0, 2.0, img.shape), 0, 255
    ).astype(np.uint8)
    det = aruco_detector.detect(img)
    ids = sorted(m.id for m in det.markers)
    assert ids == [7, 99]
    for m in det.markers:
        assert cyclic_corner_error(m.corners, quads[m.id]) < 3.0


def test_dark_background_marker(aruco_detector):
    """A marker with a white quiet zone on a black scene must decode — the
    reference finds it via Suzuki-Abe hole borders (aruco.rs:64); here the
    inner (hole-border) segmentation pass recovers it."""
    d = aruco_detector.dictionary
    corners = np.array([[200, 140], [440, 150], [430, 380], [190, 370]], float)
    img = render_marker(
        d, 5, (640, 480), corners, background=0, quiet_zone_cells=2,
        noise_sigma=2.0,
    )
    det = aruco_detector.detect(img)
    match = [m for m in det.markers if m.id == 5]
    assert match, det.stats
    assert match[0].hamming_distance == 0
    assert cyclic_corner_error(match[0].corners, corners) < 2.5


def test_nested_marker(aruco_detector):
    """Marker on a dark plate on a white scene (two nesting levels)."""
    d = aruco_detector.dictionary
    corners = np.array([[240, 180], [400, 190], [390, 340], [230, 330]], float)
    mimg = render_marker(
        d, 17, (640, 480), corners, background=0, quiet_zone_cells=2,
        noise_sigma=0.0,
    )
    scene = np.full((480, 640), 255, np.uint8)
    rect = np.zeros((480, 640), bool)
    rect[120:410, 150:490] = True
    scene = np.where(rect, mimg, scene)
    rng = np.random.default_rng(3)
    scene = np.clip(
        scene.astype(np.float64) + rng.normal(0, 2.0, scene.shape), 0, 255
    ).astype(np.uint8)
    det = aruco_detector.detect(scene)
    match = [m for m in det.markers if m.id == 17]
    assert match, det.stats
    assert cyclic_corner_error(match[0].corners, corners) < 2.5


def test_component_overflow_is_reported():
    """More components than candidate lanes must be visible in stats — the
    reference's candidate list is unbounded (aruco.rs:124-166), so silent
    capacity loss is not acceptable."""
    d = ARDictionary.new_from_named_dict("ARUCO_DEFAULT")
    det = Detector(DetectorConfig(max_candidates=4, max_inner_candidates=2), d)
    img = np.full((480, 640), 255, np.uint8)
    centers = [(110, 110), (320, 110), (530, 110), (110, 330), (320, 330),
               (530, 330)]
    for i, (cx, cy) in enumerate(centers):
        q = np.array(
            [[cx - 55, cy - 55], [cx + 55, cy - 55], [cx + 55, cy + 55],
             [cx - 55, cy + 55]], float,
        )
        sub = render_marker(d, 10 + i, (640, 480), q, noise_sigma=0.0)
        img = np.minimum(img, sub)
    out = det.detect(img)
    assert len(out.markers) == 4  # all 4 lanes productive
    assert out.stats["components_overflow"] >= 2
    # With enough lanes all 6 decode and overflow goes to zero.
    det_wide = Detector(DetectorConfig(max_candidates=16), d)
    out_wide = det_wide.detect(img)
    assert sorted(m.id for m in out_wide.markers) == list(range(10, 16))
    assert out_wide.stats["components_overflow"] == 0


def test_clutter_does_not_starve_marker(aruco_detector):
    """A marker below a field of small clutter components must still get a
    candidate lane: lane assignment prioritizes component SIZE, not raster
    order (the reference's candidate list is unbounded, aruco.rs:124-166,
    so clutter ahead of a marker cannot displace it)."""
    d = aruco_detector.dictionary
    img = np.full((480, 640), 255, np.uint8)
    # 64 small squares above the marker (all earlier in raster order).
    for row in range(8):
        for col in range(8):
            y = 16 + row * 24
            x = 40 + col * 70
            img[y : y + 14, x : x + 14] = 0
    corners = np.array(
        [[180, 250], [460, 258], [450, 450], [170, 442]], float
    )
    sub = render_marker(d, 30, (640, 480), corners, noise_sigma=0.0)
    img = np.minimum(img, sub)
    det = aruco_detector.detect(img)
    match = [m for m in det.markers if m.id == 30]
    assert match, det.stats
    assert cyclic_corner_error(match[0].corners, corners) < 2.5


@pytest.mark.parametrize("size", [(1280, 720), (1000, 1000)])
def test_detect_odd_pyramid_sizes(aruco_detector, size):
    """Resolutions whose pyramid levels hit odd sizes below the warp
    window (720p level 4 is 45x80) must not crash the pyramid builder."""
    w, h = size
    d = aruco_detector.dictionary
    corners = np.array(
        [
            [w * 0.3, h * 0.3],
            [w * 0.7, h * 0.32],
            [w * 0.68, h * 0.7],
            [w * 0.28, h * 0.68],
        ],
        float,
    )
    img = render_marker(d, 12, (w, h), corners, noise_sigma=2.0)
    det = aruco_detector.detect(img)
    match = [m for m in det.markers if m.id == 12]
    assert match, det.stats
    assert cyclic_corner_error(match[0].corners, corners) < 4.0


def test_contour_simplification_epsilon_wired():
    """epsilon maps onto the containment gate (the RDP-analogue): a disk
    is rejected as a quad candidate at the reference default but accepted
    with a much looser epsilon (reference aruco.rs:133 semantics: larger
    RDP epsilon lets blobbier contours simplify to 4 vertices)."""
    d = ARDictionary.new_from_named_dict("ARUCO_DEFAULT")
    yy, xx = np.mgrid[0:480, 0:640]
    disk = (yy - 240) ** 2 + (xx - 320) ** 2 <= 130**2
    img = np.where(disk, 0, 255).astype(np.uint8)
    strict = Detector(DetectorConfig(), d).detect(img)
    loose = Detector(
        DetectorConfig(contour_simplification_epsilon=0.4), d
    ).detect(img)
    assert strict.stats["candidates"] == 0, strict.stats
    assert loose.stats["candidates"] >= 1, loose.stats


def test_detect_rgb_input(aruco_detector):
    d = aruco_detector.dictionary
    corners = np.array([[200, 140], [440, 150], [430, 380], [190, 370]], float)
    g = render_marker(d, 5, (640, 480), corners, noise_sigma=2.0)
    rgb = np.stack([g, g, g], axis=-1)
    det = aruco_detector.detect(rgb)
    assert any(m.id == 5 for m in det.markers)


def test_filter_high_bit_errors_off():
    # With the filter off, candidates decode regardless of tau
    # (reference aruco.rs:96).
    d = ARDictionary.new_from_named_dict("ARUCO_DEFAULT")
    det_on = Detector(DetectorConfig(), d)
    det_off = Detector(DetectorConfig(filter_high_bit_errors=False), d)
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, size=(480, 640), dtype=np.uint8)
    on = det_on.detect(img)
    off = det_off.detect(img)
    assert len(off.markers) >= len(on.markers)


def test_detect_other_dictionaries():
    for name in ("APRILTAG_36H11", "APRILTAG_16H5", "ARUCO_MIP_36H12"):
        d = ARDictionary.new_from_named_dict(name)
        det = Detector(DetectorConfig(), d)
        corners = np.array(
            [[180, 120], [460, 135], [445, 400], [165, 385]], float
        )
        img = render_marker(d, 3, (640, 480), corners, noise_sigma=2.0)
        out = det.detect(img)
        assert any(m.id == 3 for m in out.markers), name


def test_detect_batch_matches_single(aruco_detector):
    d = aruco_detector.dictionary
    rng = np.random.default_rng(77)
    imgs, mids = [], []
    for _ in range(4):
        mid = int(rng.integers(0, len(d)))
        img, _, _ = random_marker_scene(d, mid, (320, 240), rng=rng)
        imgs.append(img)
        mids.append(mid)
    batch = jnp.asarray(np.stack(imgs))
    out = aruco_detector.detect_batch(batch)
    valid = np.asarray(out["marker_valid"])
    ids = np.asarray(out["marker_id"])
    for b in range(4):
        det = aruco_detector.detect(imgs[b])
        batch_ids = sorted(ids[b][valid[b]].tolist())
        single_ids = sorted(m.id for m in det.markers)
        assert batch_ids == single_ids


def test_e2e_pose_recovery():
    """Render a marker from a known camera pose, detect, solve IPPE, and
    compare the recovered pose (mirrors the reference's macroquad manual
    accuracy harness, examples/macroquad_detect.rs:143-161)."""
    d = ARDictionary.new_from_named_dict("ARUCO_DEFAULT")
    det = Detector(DetectorConfig(), d)
    intr = CameraIntrinsics.new(640, 480, 700.0, 700.0)
    # Ground truth: marker 40mm, tilted and offset in front of the camera.
    ang = 0.4
    R = np.array(
        [
            [np.cos(ang), 0, np.sin(ang)],
            [0, 1, 0],
            [-np.sin(ang), 0, np.cos(ang)],
        ]
    ) @ np.diag([1.0, -1.0, -1.0])  # face the camera (+Z forward)
    t = np.array([5.0, -8.0, 320.0])
    corners = project_marker_corners(R, t, 40.0, intr)
    img = render_marker(d, 11, (640, 480), corners, noise_sigma=2.0)
    out = det.detect(img)
    match = [m for m in out.markers if m.id == 11]
    assert match
    best, _ = pose.solve_with_intrinsics(match[0].corners, 40.0, intr)
    # Corner-0 alignment: detection rotates corners so corner 0 is the
    # marker's top-left; translation must match regardless.
    assert np.abs(np.asarray(best.translation) - t).max() < 8.0
    z_axis_true = R[:, 2]
    z_axis_est = np.asarray(best.rotation)[:, 2]
    assert np.dot(z_axis_true, z_axis_est) > 0.95
