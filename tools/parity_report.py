#!/usr/bin/env python
"""Full-size reference-parity measurement (recorded in BASELINE.md).

Runs the randomized scene mix (plain/dark/multi/nested) through both the
TPU detector and the reference-pipeline oracle and prints recall/parity/
corner statistics.  Runs on CPU (the oracle is host-side anyway and the
detector's CPU path is bit-identical to the TPU path's semantics).

Usage: python tools/parity_report.py [n_scenes] [width height]
"""

import json
import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")

from aruco3_tpu.parity import run_parity  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    size = (
        (int(sys.argv[2]), int(sys.argv[3]))
        if len(sys.argv) > 3
        else (320, 240)
    )
    t0 = time.time()
    res = run_parity(n_scenes=n, image_size=size, seed=1234)
    s = res.summary()
    s["image_size"] = list(size)
    s["seconds"] = round(time.time() - t0, 1)
    print(json.dumps(s))


if __name__ == "__main__":
    main()
