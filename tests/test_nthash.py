"""Golden tests: ntHash kernel vs values generated from the reference header.

tests/golden/nthash_golden.json was produced by a throwaway C++ harness
compiled against the read-only reference's vendored
vendor/nthash/nthash.hpp (sliding NTC64 + NTE64); only the numeric
vectors live in this repo.
"""

import json
import os

import numpy as np
import pytest

from abyss_tpu.core import alphabet
from abyss_tpu.ops import nthash

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "nthash_golden.json")


def load_cases():
    with open(GOLDEN) as f:
        return json.load(f)["cases"]


@pytest.mark.parametrize("case", load_cases(), ids=lambda c: f"k{c['k']}")
def test_window_hashes_match_reference(case):
    k = case["k"]
    codes = alphabet.encode(case["seq"])[None, :]
    fwd, rev, canon, valid = nthash.kmer_hashes(codes, k)
    fwd = np.asarray(fwd)[0]
    rev = np.asarray(rev)[0]
    canon = np.asarray(canon)[0]
    assert np.asarray(valid)[0].all()
    np.testing.assert_array_equal(fwd, np.array([int(x) for x in case["fwd"]], dtype=np.uint64))
    np.testing.assert_array_equal(rev, np.array([int(x) for x in case["rev"]], dtype=np.uint64))
    np.testing.assert_array_equal(canon, np.array([int(x) for x in case["canon"]], dtype=np.uint64))


@pytest.mark.parametrize("case", load_cases()[:6], ids=lambda c: f"k{c['k']}")
def test_multi_hashes_match_reference(case):
    k = case["k"]
    codes = alphabet.encode(case["seq"])[None, :]
    _, _, canon, _ = nthash.kmer_hashes(codes, k)
    mh = np.asarray(nthash.multi_hashes(canon[:, :1], k, 5))[0, 0]
    expect = np.array([int(x) for x in case["nte_canon0"]], dtype=np.uint64)
    np.testing.assert_array_equal(mh, expect)


@pytest.mark.parametrize("case", load_cases()[:9], ids=lambda c: f"k{c['k']}")
def test_incremental_rolls_match_batch(case):
    k = case["k"]
    codes = alphabet.encode(case["seq"])
    fwd, rev, _, _ = nthash.kmer_hashes(codes[None], k)
    fwd = np.asarray(fwd)[0]
    rev = np.asarray(rev)[0]
    # roll right across every window
    f, r = fwd[0], rev[0]
    for i in range(1, len(fwd)):
        f, r = nthash.roll_right(f, r, k, codes[i - 1], codes[i + k - 1])
        assert int(f) == int(fwd[i]) and int(r) == int(rev[i]), i
    # roll left back across every window
    f, r = fwd[-1], rev[-1]
    for i in range(len(fwd) - 2, -1, -1):
        f, r = nthash.roll_left(f, r, k, codes[i + k], codes[i])
        assert int(f) == int(fwd[i]) and int(r) == int(rev[i]), i


def test_invalid_windows_masked():
    k = 5
    seq = "ACGTNACGTACGT"
    codes = alphabet.encode(seq)[None, :]
    _, _, _, valid = nthash.kmer_hashes(codes, k)
    valid = np.asarray(valid)[0]
    # windows overlapping position 4 (N) are invalid
    for i in range(len(valid)):
        assert valid[i] == (not (i <= 4 <= i + k - 1))


def test_revcomp_invariance():
    # canonical hash of a k-mer equals canonical hash of its reverse complement
    rng = np.random.default_rng(0)
    k = 21
    codes = rng.integers(0, 4, size=(8, k), dtype=np.uint8)
    rc = alphabet.revcomp_codes(codes)
    _, _, c1, _ = nthash.kmer_hashes(codes, k)
    _, _, c2, _ = nthash.kmer_hashes(rc, k)
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))


# --- masked / spaced-seed hashing (maskHash parity) -------------------------

MASK_GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                           "maskhash_golden.json")


def load_mask_cases():
    with open(MASK_GOLDEN) as f:
        return json.load(f)["cases"]


@pytest.mark.parametrize("case", load_mask_cases(),
                         ids=lambda c: c["mask"][:12])
def test_masked_hashes_match_reference(case):
    codes = alphabet.encode(case["seq"])[None, :]
    _, _, canon, valid = nthash.masked_kmer_hashes(codes, case["mask"])
    got = np.asarray(canon)[0]
    want = np.array([int(x) for x in case["masked"]], dtype=np.uint64)
    assert np.array_equal(got[: len(want)], want)


def test_spaced_seed_patterns():
    assert nthash.kmer_pair_mask(24, 8) == "1" * 8 + "0" * 8 + "1" * 8
    qr = nthash.qr_seed(11)
    assert len(qr) == 11 and set(qr) <= {"0", "1"}
    pair = nthash.qr_seed_pair(30, 11)
    assert len(pair) == 30
    assert pair == pair[::-1]  # symmetric


def test_masked_hash_ignores_gap_bases():
    # changing a masked (gap) base must not change the masked hash
    mask = nthash.kmer_pair_mask(24, 8)
    seq = "ACGTACGTACGTACGTACGTACGT"
    alt = seq[:12] + ("A" if seq[12] != "A" else "C") + seq[13:]
    c1 = nthash.masked_kmer_hashes(alphabet.encode(seq)[None, :], mask)
    c2 = nthash.masked_kmer_hashes(alphabet.encode(alt)[None, :], mask)
    assert int(np.asarray(c1[2])[0, 0]) == int(np.asarray(c2[2])[0, 0])
