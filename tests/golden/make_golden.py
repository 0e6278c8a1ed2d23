#!/usr/bin/env python3
"""Regenerate the golden fixtures for the oracle's CV primitives.

The parity oracle (aruco3_tpu/oracle.py) re-expresses the Rust crates the
reference depends on (imageproc 0.25, image 0.25) in numpy.  No Rust
toolchain exists in this environment, so the oracle's semantics cannot be
executed against the real crates here; these fixtures pin them instead:

  * each JSON file holds small inputs plus the oracle's outputs;
  * tests/test_golden.py asserts the oracle still reproduces them
    (guards drift on our side);
  * tests/golden/rust_validation/ is a ready-to-run cargo crate that
    loads the same files and asserts them against the actual crates —
    runnable in minutes in any cargo-equipped environment.

Inputs are deterministic (fixed seed).  Run from the repo root:
    python tests/golden/make_golden.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np

from aruco3_tpu import oracle
from aruco3_tpu.rectify import _triangle_resize_matrix

HERE = os.path.dirname(os.path.abspath(__file__))


def dump(name, obj):
    path = os.path.join(HERE, name)
    with open(path, "w") as f:
        json.dump(obj, f, separators=(",", ":"))
    print(f"wrote {path} ({os.path.getsize(path)} bytes)")


def main():
    rng = np.random.default_rng(20260817)

    # ---- adaptive_threshold (imageproc::contrast::adaptive_threshold,
    # reference aruco.rs:61).  Cases chosen to expose the tie policy
    # (uniform regions: pixel == box mean) and border clamping.
    at_cases = []
    imgs = [
        np.full((12, 16), 128, np.uint8),  # all ties
        np.tile(np.arange(16, dtype=np.uint8) * 16, (12, 1)),  # ramp
        rng.integers(0, 256, size=(18, 24), dtype=np.uint8),  # random
        np.where(
            rng.random((14, 14)) < 0.5, 0, 255
        ).astype(np.uint8),  # binary noise
    ]
    for img in imgs:
        out = oracle.adaptive_threshold_np(img, 3)  # window=7 -> radius 3
        at_cases.append(
            {
                "radius": 3,
                "height": img.shape[0],
                "width": img.shape[1],
                "input": img.ravel().tolist(),
                "white": out.astype(int).ravel().tolist(),
            }
        )
    dump("adaptive_threshold.json", {"cases": at_cases})

    # ---- otsu_level (imageproc::contrast::otsu_level, aruco.rs:264).
    ot_cases = []
    patches = [
        np.concatenate(
            [rng.normal(40, 10, 1200), rng.normal(210, 12, 1201)]
        ),
        rng.uniform(0, 255, 2401),
        np.concatenate([np.zeros(2000), np.full(401, 255.0)]),
        np.full(2401, 77.0),
    ]
    for p in patches:
        vals = np.clip(np.round(p), 0, 255).astype(np.uint8)
        ot_cases.append(
            {
                "input": vals.tolist(),
                "level": oracle.otsu_level_np(vals.astype(np.float64)),
            }
        )
    dump("otsu.json", {"cases": ot_cases})

    # ---- Triangle resize (image::imageops::resize FilterType::Triangle,
    # aruco.rs:273).  49x49 -> mark_size for the dictionary sizes in use.
    tr_cases = []
    for dst in (6, 7, 8):
        img = rng.integers(0, 256, size=(49, 49), dtype=np.uint8)
        L = _triangle_resize_matrix(49, dst)
        out = L @ img.astype(np.float64) @ L.T
        # Binarized variant: exactly the pipeline's use (Otsu-binarized
        # input, >127 bit read afterwards) — must agree bit-for-bit.
        level = oracle.otsu_level_np(img.astype(np.float64))
        binar = np.where(img.astype(np.float64) > level, 255.0, 0.0)
        outb = L @ binar @ L.T
        tr_cases.append(
            {
                "src": 49,
                "dst": dst,
                "input": img.ravel().tolist(),
                "output_float": np.round(out, 4).ravel().tolist(),
                "otsu_level": level,
                "bits_gt127": (outb > 127.0).astype(int).ravel().tolist(),
            }
        )
    # The resampling matrix itself for dst=6 (weights are the crate
    # semantics in closed form: centers at (i+0.5)*ratio, support = ratio,
    # kernel w(t) = max(0, 1-|t|) with t in source units / ratio,
    # normalized per output pixel).
    tr_cases.append(
        {
            "src": 49,
            "dst": 6,
            "matrix": np.round(
                _triangle_resize_matrix(49, 6), 6
            ).ravel().tolist(),
        }
    )
    dump("triangle_resize.json", {"cases": tr_cases})

    # ---- find_contours (imageproc::contours::find_contours, Suzuki-Abe,
    # aruco.rs:64).  Masks exercising outer borders, hole borders, nested
    # structures, single pixels and diagonal contacts.
    fc_cases = []
    masks = []
    m = np.zeros((12, 14), bool)
    m[2:9, 3:11] = True
    m[4:7, 5:9] = False  # hole
    masks.append(m)
    m = np.zeros((10, 10), bool)
    m[1, 1] = True  # isolated pixel
    m[3:6, 3:6] = True
    m[7, 7] = True
    m[6, 6] = True  # diagonal contact with block? (separate touch case)
    masks.append(m)
    m = np.zeros((16, 16), bool)
    m[1:15, 1:15] = True
    m[3:13, 3:13] = False
    m[5:11, 5:11] = True  # ring in ring (nested markers)
    m[7:9, 7:9] = False
    masks.append(m)
    masks.append(rng.random((12, 12)) < 0.4)
    for m in masks:
        contours = oracle.find_contours_np(m)
        fc_cases.append(
            {
                "height": m.shape[0],
                "width": m.shape[1],
                "input": m.astype(int).ravel().tolist(),
                # Traversal order is part of Suzuki-Abe; keep it.  The
                # Rust harness may compare contours as point-sets if
                # imageproc's start-pixel convention differs.
                "contours": [c.tolist() for c in contours],
            }
        )
    dump("find_contours.json", {"cases": fc_cases})

    # ---- approximate_polygon_dp (imageproc::geometry, aruco.rs:133) with
    # the reference's eps = n_points * 0.05.
    dp_cases = []
    polys = []
    # Clean rectangle border walk.
    rect = []
    for x in range(3, 20):
        rect.append((x, 2))
    for y in range(3, 14):
        rect.append((19, y))
    for x in range(18, 2, -1):
        rect.append((x, 13))
    for y in range(12, 2, -1):
        rect.append((3, y))
    polys.append(np.array(rect))
    # Jittered quad (like a real thresholded contour).
    t = np.linspace(0, 2 * np.pi, 60, endpoint=False)
    sq = np.stack(
        [
            np.clip(np.cos(t) * 1.6, -1, 1) * 20 + 25,
            np.clip(np.sin(t) * 1.6, -1, 1) * 15 + 20,
        ],
        axis=-1,
    )
    polys.append(np.round(sq).astype(np.int64))
    # A blobby circle that must NOT simplify to 4 points.
    circ = np.stack(
        [np.cos(t) * 18 + 25, np.sin(t) * 18 + 25], axis=-1
    )
    polys.append(np.round(circ).astype(np.int64))
    for p in polys:
        eps = len(p) * 0.05
        out = oracle.approximate_polygon_dp(p, eps)
        dp_cases.append(
            {
                "epsilon": eps,
                "input": np.asarray(p).tolist(),
                "output": np.asarray(out).tolist(),
            }
        )
    dump("polygon_dp.json", {"cases": dp_cases})


if __name__ == "__main__":
    main()
