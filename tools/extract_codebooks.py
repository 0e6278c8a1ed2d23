#!/usr/bin/env python3
"""Extract the static fiducial codebook DATA tables from the reference crate.

The marker code tables in /root/reference/src/dictionaries.rs:5-19 are static
published data (originating from js-aruco2 / the AprilTag project), not program
logic.  We persist them as a compact binary `.npz` so the Python package ships
data, not a textual translation of the reference source.

Each dictionary is stored as an (N, 2) uint32 array: column 0 = low 32 bits,
column 1 = high 32 bits of each u64 code word.  Per-dictionary metadata
(num_bits, tau) mirrors the registry at reference dictionaries.rs:30-113.
"""

import re
import sys

import numpy as np

REF = "/root/reference/src/dictionaries.rs"

# name -> (num_bits, declared_tau); tau 0 means "compute min pairwise Hamming
# distance" (reference dictionaries.rs:124,129-138).
REGISTRY = {
    "ARUCO": (25, 3),
    "ARUCO_MIP_36H12": (36, 12),
    "APRILTAG_16H5": (16, 5),
    "APRILTAG_25H7": (25, 7),
    "APRILTAG_25H9": (25, 9),
    "APRILTAG_36H9": (36, 9),
    "APRILTAG_36H10": (36, 10),
    "APRILTAG_36H11": (36, 11),
    "ARTAG": (36, 0),
    "ARTOOLKITPLUS": (36, 0),
    "ARTOOLKITPLUSBCH": (36, 0),
    "ARUCO_MIP_16H3": (16, 3),
    "ARUCO_MIP_25H7": (25, 7),
    "CHILITAGS": (64, 5),
}
# ARUCO_DEFAULT is an alias for ARUCO (reference dictionaries.rs:6) — handled
# in the loader, not duplicated in the data file.


def main() -> None:
    src = open(REF, encoding="utf-8").read()
    out: dict[str, np.ndarray] = {}
    meta_names = []
    meta_bits = []
    meta_tau = []
    for m in re.finditer(
        r"const ([A-Z_0-9]+): &'static \[u64\] = &\[([^\]]*)\];", src, re.S
    ):
        name, body = m.group(1), m.group(2)
        if name not in REGISTRY:
            continue
        codes = [int(tok, 0) for tok in re.split(r"[,\s]+", body.strip()) if tok]
        arr = np.empty((len(codes), 2), dtype=np.uint32)
        arr[:, 0] = np.array([c & 0xFFFFFFFF for c in codes], dtype=np.uint64)
        arr[:, 1] = np.array([c >> 32 for c in codes], dtype=np.uint64)
        out[f"codes_{name}"] = arr
        nb, tau = REGISTRY[name]
        meta_names.append(name)
        meta_bits.append(nb)
        meta_tau.append(tau)
        print(f"{name}: {len(codes)} codes, num_bits={nb}, tau={tau}")

    missing = set(REGISTRY) - set(meta_names)
    if missing:
        sys.exit(f"missing dictionaries: {missing}")

    out["names"] = np.array(meta_names)
    out["num_bits"] = np.array(meta_bits, dtype=np.int32)
    out["tau"] = np.array(meta_tau, dtype=np.int32)
    np.savez_compressed("/root/repo/aruco3_tpu/data/codebooks.npz", **out)
    print("wrote aruco3_tpu/data/codebooks.npz")


if __name__ == "__main__":
    main()
