"""Spatial (single-frame, row-sharded) detection must match the
single-device path bit-for-bit on the virtual 8-device mesh."""

import jax
import numpy as np
import pytest

from aruco3_tpu import ARDictionary, Detector, DetectorConfig
from aruco3_tpu.parallel.sharding import make_mesh
from aruco3_tpu.parallel.spatial import detect_spatial
from aruco3_tpu.render import random_marker_scene


@pytest.fixture(scope="module")
def det():
    return Detector(
        DetectorConfig(max_candidates=16),
        ARDictionary.new_from_named_dict("ARUCO_DEFAULT"),
    )


def test_spatial_matches_single_device(det):
    rng = np.random.default_rng(21)
    mesh = make_mesh(8, axis="rows")
    for trial in range(3):
        mid = int(rng.integers(0, len(det.dictionary)))
        # H chosen divisible by 8 * ds(=2 for 320x240? -> ds=2) anyway;
        # detect_spatial pads as needed.
        img, truth, _ = random_marker_scene(
            det.dictionary, mid, (320, 240), rng=rng
        )
        single = det.detect(img)
        out = jax.device_get(detect_spatial(det, img, mesh=mesh))
        valid = out["marker_valid"]
        ids = out["marker_id"].tolist()
        spatial_ids = sorted(
            i for i, v in zip(ids, valid.tolist()) if v
        )
        single_ids = sorted(m.id for m in single.markers)
        assert spatial_ids == single_ids, trial
        # Corner agreement for matched markers (identical masks -> identical
        # quads up to float determinism).
        if single.markers:
            corners_single = np.array(single.markers[0].corners, float)
            k = int(np.argmax(valid))
            corners_spatial = out["marker_corners"][k]
            assert (
                np.abs(np.sort(corners_spatial.ravel()) -
                       np.sort(corners_single.ravel())).max() <= 1.0
            )


def test_spatial_pads_odd_heights(det):
    rng = np.random.default_rng(5)
    mesh = make_mesh(8, axis="rows")
    mid = 3
    img, _, _ = random_marker_scene(det.dictionary, mid, (320, 250), rng=rng)
    out = jax.device_get(detect_spatial(det, img, mesh=mesh))
    ids = [
        i
        for i, v in zip(out["marker_id"].tolist(), out["marker_valid"])
        if v
    ]
    assert mid in ids
