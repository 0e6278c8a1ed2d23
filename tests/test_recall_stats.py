"""Large-sample recall + corner-error statistics (VERDICT round-1 item:
n=24 cannot support a 99% claim; this suite uses 216 seeded scenes).

Scenes are generated fully inside the frame (no clipped markers — those
are misses for the reference pipeline too, see tests/test_parity.py) and
run through detect_batch in chunks so the whole suite costs one compile.
Set ARUCO3_RECALL_SCENES to scale the sample.
"""

import os

import jax.numpy as jnp
import numpy as np

from aruco3_tpu import ARDictionary, Detector, DetectorConfig
from aruco3_tpu.render import render_marker


def _scene(d, rng, w=320, h=240, noise=2.0):
    side = rng.uniform(0.30, 0.52) * min(w, h)
    # Corner radius <= side*(0.5*sqrt(2) + persp) — keep fully inside.
    margin = side * 0.85
    cx = rng.uniform(margin, w - margin)
    cy = rng.uniform(margin, h - margin)
    ang = rng.uniform(0, 2 * np.pi)
    base = np.array([[-0.5, -0.5], [0.5, -0.5], [0.5, 0.5], [-0.5, 0.5]])
    rot = np.array(
        [[np.cos(ang), -np.sin(ang)], [np.sin(ang), np.cos(ang)]]
    )
    quad = base @ rot.T * side
    quad += rng.uniform(-0.10, 0.10, size=(4, 2)) * side
    quad += np.array([cx, cy])
    mid = int(rng.integers(0, len(d)))
    img = render_marker(
        d, mid, (w, h), quad, noise_sigma=noise, rng=rng
    )
    return img, mid, quad


def _cyclic_err(found, truth):
    found = np.asarray(found, dtype=np.float64)
    return min(
        np.linalg.norm(np.roll(found, r, axis=0) - truth, axis=-1).mean()
        for r in range(4)
    )


def test_recall_and_corner_distribution():
    n = int(os.environ.get("ARUCO3_RECALL_SCENES", "216"))
    chunk = 24
    d = ARDictionary.new_from_named_dict("ARUCO_DEFAULT")
    det = Detector(DetectorConfig(), d)
    rng = np.random.default_rng(20260816)

    scenes = [_scene(d, rng) for _ in range(n)]
    hits = 0
    errs = []
    for i in range(0, n, chunk):
        batch = scenes[i : i + chunk]
        imgs = jnp.asarray(np.stack([s[0] for s in batch]))
        out = det.detect_batch(imgs)
        valid = np.asarray(out["marker_valid"])
        ids = np.asarray(out["marker_id"])
        corners = np.asarray(out["marker_corners"])
        for b, (_, mid, truth) in enumerate(batch):
            lanes = np.where(valid[b] & (ids[b] == mid))[0]
            cand = [
                _cyclic_err(corners[b, k], truth)
                for k in lanes
            ]
            good = [e for e in cand if e < 5.0]
            if good:
                hits += 1
                errs.append(min(good))

    recall = hits / n
    errs = np.array(errs)
    assert recall >= 0.99, f"recall {hits}/{n}"
    # Bounds guard the BASELINE.md corner-accuracy claims (500-scene run:
    # mean 0.74 px, p99 1.24 px) with sampling headroom at n=216.
    assert errs.mean() < 0.85, f"mean corner err {errs.mean():.3f}"
    assert np.percentile(errs, 99) < 1.75, (
        f"p99 corner err {np.percentile(errs, 99):.3f}"
    )
