"""Drift guard: the oracle must keep reproducing the committed golden
fixtures (tests/golden/) that pin its imageproc/image crate semantics.

The fixtures' other half lives in tests/golden/rust_validation — a cargo
crate that checks the same files against the real Rust crates (not
runnable here: no Rust toolchain in this environment)."""

import json
import os

import numpy as np
import pytest

from aruco3_tpu import oracle
from aruco3_tpu.rectify import _triangle_resize_matrix

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def load(name):
    with open(os.path.join(GOLDEN, name)) as f:
        return json.load(f)


def test_adaptive_threshold_golden():
    for c in load("adaptive_threshold.json")["cases"]:
        img = np.array(c["input"], np.uint8).reshape(c["height"], c["width"])
        out = oracle.adaptive_threshold_np(img, c["radius"])
        np.testing.assert_array_equal(
            out.astype(int).ravel(), np.array(c["white"])
        )


def test_otsu_golden():
    for c in load("otsu.json")["cases"]:
        vals = np.array(c["input"], np.float64)
        assert oracle.otsu_level_np(vals) == c["level"]


def test_triangle_resize_golden():
    for c in load("triangle_resize.json")["cases"]:
        if "input" not in c or not c.get("input"):
            L = _triangle_resize_matrix(c["src"], c["dst"])
            np.testing.assert_allclose(
                L.ravel(), np.array(c["matrix"]), atol=1e-5
            )
            continue
        img = np.array(c["input"], np.float64).reshape(c["src"], c["src"])
        L = _triangle_resize_matrix(c["src"], c["dst"])
        out = L @ img @ L.T
        np.testing.assert_allclose(
            out.ravel(), np.array(c["output_float"]), atol=2e-3
        )
        binar = np.where(img > c["otsu_level"], 255.0, 0.0)
        outb = L @ binar @ L.T
        np.testing.assert_array_equal(
            (outb > 127.0).astype(int).ravel(), np.array(c["bits_gt127"])
        )


def test_find_contours_golden():
    for c in load("find_contours.json")["cases"]:
        mask = (
            np.array(c["input"]).reshape(c["height"], c["width"]) != 0
        )
        contours = oracle.find_contours_np(mask)
        got = sorted(
            tuple(sorted(map(tuple, ct.tolist()))) for ct in contours
        )
        want = sorted(
            tuple(sorted(map(tuple, ct))) for ct in c["contours"]
        )
        assert got == want


def test_polygon_dp_golden():
    for c in load("polygon_dp.json")["cases"]:
        out = oracle.approximate_polygon_dp(
            np.array(c["input"], np.int64), c["epsilon"]
        )
        np.testing.assert_array_equal(out, np.array(c["output"]))
