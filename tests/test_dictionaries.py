"""Dictionary + Hamming matcher parity tests.

Mirrors reference test suites at src/lib.rs:23-48 (hamming_distance) and
src/dictionaries.rs:235-282 (tau sanity, find_nearest, try_find_nearest),
plus data-integrity checks over all 15 codebooks.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from aruco3_tpu.dictionaries import (
    ARDictionary,
    calculate_tau,
    get_dictionary_names,
)
from aruco3_tpu.utils.bits import hamming_distance

EXPECTED_COUNTS = {
    "ARUCO": 1023,
    "ARUCO_DEFAULT": 1023,
    "ARUCO_MIP_16H3": 250,
    "ARUCO_MIP_25H7": 100,
    "ARUCO_MIP_36H12": 250,
    "APRILTAG_16H5": 30,
    "APRILTAG_25H7": 242,
    "APRILTAG_25H9": 35,
    "APRILTAG_36H9": 5329,
    "APRILTAG_36H10": 2320,
    "APRILTAG_36H11": 587,
    "ARTAG": 1024,
    "ARTOOLKITPLUS": 512,
    "ARTOOLKITPLUSBCH": 4096,
    "CHILITAGS": 1024,
}


def test_hamming_distance():
    # reference src/lib.rs:28-40
    for i in range(255):
        assert hamming_distance(i, i) == 0
    assert hamming_distance(0xFFFFFFFF, 0x0) == 32
    assert hamming_distance(0x0, 0xFFFFFFFFFFFFFFFF) == 64
    assert hamming_distance(0x80000000, 0x40000000) == 2


def test_all_dictionaries_present():
    names = get_dictionary_names()
    assert set(names) == set(EXPECTED_COUNTS)
    for n in names:
        d = ARDictionary.new_from_named_dict(n)
        assert len(d) == EXPECTED_COUNTS[n], n
        assert d.num_bits <= 64
        # Codes must fit in the declared bit budget... CHILITAGS declares 64
        # bits but its codes use fewer; just sanity-check the range.
        assert int(d.code_list.max()) < (1 << 64)


def test_tau_sanity():
    # reference dictionaries.rs:239-243
    d = ARDictionary.new_from_named_dict("ARUCO_DEFAULT")
    assert d.tau == 3


def test_tau_computed_for_declared_zero():
    # ARTAG/ARTOOLKITPLUS/ARTOOLKITPLUSBCH declare tau=0 -> computed as the
    # min pairwise Hamming distance (reference dictionaries.rs:124,129-138).
    # Quirk reproduced faithfully: the ARTAG table contains one duplicated
    # code word, so its computed tau is 0 and the strict `dist < tau` filter
    # rejects every ARTAG decode — exactly as the reference behaves.
    expected = {"ARTAG": 0, "ARTOOLKITPLUS": 4, "ARTOOLKITPLUSBCH": 9}
    for name, tau in expected.items():
        d = ARDictionary.new_from_named_dict(name)
        assert d.tau == tau, name
        assert d.tau == calculate_tau(d.code_list)


def test_case_insensitive_and_unknown():
    d = ARDictionary.new_from_named_dict("aruco_default")
    assert d.name == "ARUCO_DEFAULT"
    with pytest.raises(KeyError):
        ARDictionary.new_from_named_dict("NOT_A_DICT")


def test_find_nearest_aruco_default():
    # reference dictionaries.rs:245-269
    d = ARDictionary.new_from_named_dict("ARUCO_DEFAULT")
    idx, dist = d.find_nearest(0x1084210)
    assert (idx, dist) == (0, 0)
    idx, dist = d.find_nearest(0x1084209)
    assert (idx, dist) == (2, 0)
    idx, dist = d.find_nearest(0b00000001_00001000_01000010_00001001)
    assert (idx, dist) == (2, 0)
    idx, dist = d.find_nearest(0b00000001_00001000_01000010_10001001)
    assert (idx, dist) == (2, 1)


def test_try_find_nearest():
    # reference dictionaries.rs:271-281
    d = ARDictionary.new_from_named_dict("ARUCO_DEFAULT")
    assert d.try_find_nearest(0x1084210) == (0, 0)
    # Flip more bits than tau allows and expect rejection.
    code = int(d.code_list[0])
    corrupted = code ^ 0b1011011  # flip 5 bits... may land near another code
    res = d.try_find_nearest(corrupted)
    if res is not None:
        # If it matched something, the match must genuinely be within tau.
        idx, dist = res
        assert dist < d.tau
        assert hamming_distance(corrupted, int(d.code_list[idx])) == dist


def test_batched_matcher_matches_host_scan():
    rng = np.random.default_rng(42)
    for name in ("ARUCO_DEFAULT", "APRILTAG_36H11", "CHILITAGS"):
        d = ARDictionary.new_from_named_dict(name)
        codes = d.code_list.astype(np.uint64)
        # Random queries: real codes with random bit flips + pure noise.
        queries = []
        for _ in range(16):
            base = int(codes[rng.integers(len(codes))])
            nflips = int(rng.integers(0, 6))
            for _ in range(nflips):
                base ^= 1 << int(rng.integers(d.num_bits))
            queries.append(base)
        queries.extend(
            int(x) & ((1 << d.num_bits) - 1)
            for x in rng.integers(0, 2**63, size=8, dtype=np.uint64)
        )
        bitvecs = np.stack(
            [
                ((q >> np.arange(d.num_bits, dtype=np.uint64)) & 1).astype(
                    np.int32
                )
                for q in np.array(queries, dtype=np.uint64)
            ]
        )
        ids, dists = d.find_nearest_bits(jnp.asarray(bitvecs))
        ids, dists = np.asarray(ids), np.asarray(dists)
        for q, i, dist in zip(queries, ids, dists):
            host = [hamming_distance(q, int(c)) for c in codes]
            assert dist == min(host)
            assert i == int(np.argmin(host))  # lowest-index tie-break


def test_mark_sizes():
    # get_mark_size = ceil(sqrt(num_bits)) + 2 (reference dictionaries.rs:151-156)
    expect = {
        "ARUCO_DEFAULT": 7,
        "APRILTAG_16H5": 6,
        "APRILTAG_25H9": 7,
        "APRILTAG_36H11": 8,
        "CHILITAGS": 10,
    }
    for name, size in expect.items():
        assert ARDictionary.new_from_named_dict(name).get_mark_size() == size


def test_make_binary_image():
    d = ARDictionary.new_from_named_dict("ARUCO_DEFAULT")
    width, bits = d.make_binary_image(0)
    assert width == 7
    assert bits.shape == (49,)
    m = bits.reshape(7, 7)
    # Border ring must be all black (False).
    assert not m[0, :].any() and not m[-1, :].any()
    assert not m[:, 0].any() and not m[:, -1].any()
    # Inner grid encodes the code LSB-first row-major
    # (reference dictionaries.rs:223).
    code = int(d.code_list[0])
    inner = m[1:-1, 1:-1].reshape(-1)
    for i in range(d.num_bits):
        assert inner[i] == bool(code & (1 << i))
