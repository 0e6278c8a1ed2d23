#!/usr/bin/env python3
"""Detect markers in an image and write an annotated copy.

Counterpart of the reference's manual detect-and-annotate test loop
(reference src/aruco.rs:351-398): loads a PGM (or synthesizes a random
marker scene when no path is given), runs the detector, prints each
marker's id / Hamming distance / corners, and writes DEBUG_detected.ppm.

Usage:
  python examples/detect_image.py [image.pgm] [DICT_NAME]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import sys

import numpy as np

from aruco3_tpu import ARDictionary, Detector, DetectorConfig
from aruco3_tpu.render import random_marker_scene
from aruco3_tpu.utils.imageio import draw_marker_overlay, read_pgm, write_ppm


def main() -> None:
    dict_name = sys.argv[2] if len(sys.argv) > 2 else "ARUCO_DEFAULT"
    dictionary = ARDictionary.new_from_named_dict(dict_name)

    if len(sys.argv) > 1:
        img = read_pgm(sys.argv[1])
        truth = None
    else:
        rng = np.random.default_rng()
        mid = int(rng.integers(0, len(dictionary)))
        img, corners, _ = random_marker_scene(
            dictionary, mid, (800, 600), rng=rng
        )
        truth = (mid, corners)
        print(f"synthesized scene with marker id={mid}")

    detector = Detector(DetectorConfig(), dictionary)
    detection = detector.detect(img)

    print(f"candidates: {len(detection.candidates)}")
    print(f"stage stats: {detection.stats}")
    for m in detection.markers:
        print(
            f"marker id={m.id} hamming={m.hamming_distance} "
            f"corners={m.corners} code={m.code:#x}"
        )
    if truth and not any(m.id == truth[0] for m in detection.markers):
        print("NOTE: ground-truth marker was not recovered")

    out = draw_marker_overlay(detection.grey, detection.markers)
    write_ppm("DEBUG_detected.ppm", out)
    print("wrote DEBUG_detected.ppm")


if __name__ == "__main__":
    main()
