"""Extension engine tests on tiny constructed graphs (the style of the
reference's Unittest/Graph/ExtendPathTest.cpp: build a small graph
inline, assert path results)."""

import numpy as np
import jax.numpy as jnp
import pytest

from abyss_tpu.core import alphabet
from abyss_tpu.dbg import extend as ext
from abyss_tpu.ops import bloom, nthash


K = 11


def make_filter(seqs, k=K, threshold=1, size=1 << 18):
    f = bloom.CountingBloomFilter.create(size, k, num_hashes=4,
                                         threshold=threshold)
    for s in seqs:
        codes = alphabet.encode(s)[None]
        _, _, canon, valid = nthash.kmer_hashes(jnp.asarray(codes), k)
        f = f.insert(canon, valid)
    return f


def rnd(n, seed):
    rng = np.random.default_rng(seed)
    return "".join("ACGT"[i] for i in rng.integers(0, 4, n))


def test_linear_path_extends_to_end():
    seq = rnd(60, 1)
    f = make_filter([seq])
    seed = alphabet.encode(seq[:K])[None]
    buf, length, status = ext.extend_forward(f, seed, K, trim=K)
    assert status[0] == ext.DEAD_END
    got = alphabet.decode(buf[0, :length[0]])
    assert got == seq


def test_chunked_extension_stitches():
    seq = rnd(400, 2)
    f = make_filter([seq])
    seed = alphabet.encode(seq[:K])[None]
    buf, length, status = ext.extend_forward(f, seed, K, trim=K, chunk=64)
    assert status[0] == ext.DEAD_END
    assert alphabet.decode(buf[0, :length[0]]) == seq


def test_fork_stops_ambiguous():
    # two sequences share a prefix then diverge: real fork -> AMBI_OUT
    common = rnd(40, 3)
    a = common + rnd(30, 4)
    b = common + rnd(30, 5)
    f = make_filter([a, b])
    seed = alphabet.encode(common[:K])[None]
    buf, length, status = ext.extend_forward(f, seed, K, trim=5)
    assert status[0] == ext.AMBI_OUT
    got = alphabet.decode(buf[0, :length[0]])
    # stops exactly at the true divergence point (the random suffixes may
    # share a few leading bases)
    shared = common
    for x, y in zip(a[len(common):], b[len(common):]):
        if x != y:
            break
        shared += x
    assert got == shared


def test_join_stops_ambi_in():
    # two sequences converge into a shared suffix: walking the suffix's
    # strand from inside should stop where the in-degree becomes 2
    common = rnd(40, 6)
    a = rnd(30, 7) + common
    b = rnd(30, 8) + common
    f = make_filter([a, b])
    # seed inside branch a, before the join
    seed = alphabet.encode(a[:K])[None]
    buf, length, status = ext.extend_forward(f, seed, K, trim=5)
    got = alphabet.decode(buf[0, :length[0]])
    # should extend into the common region and stop at/in the join area
    assert status[0] in (ext.AMBI_IN, ext.AMBI_OUT)
    assert got.startswith(a[:K])
    assert len(got) <= len(a)


def test_false_positive_branch_ignored():
    # a 1-kmer spur off a linear path must not stop extension when its
    # depth < trim (successor doubling schedule eliminates it)
    seq = rnd(60, 9)
    pos = 30
    spur = seq[pos - K + 1:pos] + ("A" if seq[pos] != "A" else "C")
    f = make_filter([seq, spur])
    seed = alphabet.encode(seq[:K])[None]
    buf, length, status = ext.extend_forward(f, seed, K, trim=8)
    got = alphabet.decode(buf[0, :length[0]])
    assert got == seq
    assert status[0] == ext.DEAD_END


def test_cycle_detection():
    # circular sequence: extension must terminate with CYCLE
    core = rnd(50, 10)
    circ = core + core[:K - 1 + 5]  # wrap enough to close the k-mer cycle
    f = make_filter([core + core[:K]])  # all k-mers of the circle
    seed = alphabet.encode(core[:K])[None]
    buf, length, status = ext.extend_forward(f, seed, K, trim=5, chunk=32)
    assert status[0] == ext.CYCLE
    # path length should be about the cycle length
    assert length[0] >= len(core) - 1


def test_batch_of_many_paths():
    k = 17  # large enough that 16 random 80-mers share no k-mers
    seqs = [rnd(80, 20 + i) for i in range(16)]
    f = make_filter(seqs, k=k)
    seeds = np.stack([alphabet.encode(s[:k]) for s in seqs])
    buf, length, status = ext.extend_forward(f, seeds, k, trim=5)
    for i, s in enumerate(seqs):
        assert alphabet.decode(buf[i, :length[i]]) == s
        assert status[i] == ext.DEAD_END


def test_lookahead_ok():
    seq = rnd(40, 30)
    f = make_filter([seq])
    first = alphabet.encode(seq[:K])[None]
    last = alphabet.encode(seq[-K:])[None]
    assert ext.lookahead_ok(f, last, K, 5)[0] == False  # blunt right end
    assert ext.lookahead_ok(f, first, K, 5)[0] == True


def test_doubling_schedule():
    assert ext.doubling_schedule(0) == [0]
    assert ext.doubling_schedule(1) == [0, 1]
    assert ext.doubling_schedule(25) == [0, 1, 2, 4, 8, 16, 25]


def test_successor_decision():
    # one deep branch + one shallow: deep wins at the right schedule level
    depths = np.array([[8, 2, 0, 0]])
    present = np.array([[True, True, False, False]])
    code, base = ext.successor_decision(depths, present, trim=8)
    assert code[0] == ext.ACTIVE and base[0] == 0
    # two deep branches: ambiguous
    depths = np.array([[8, 8, 0, 0]])
    code, _ = ext.successor_decision(depths, present, trim=8)
    assert code[0] == ext.AMBI_OUT
    # no branches: dead end
    code, _ = ext.successor_decision(
        np.zeros((1, 4), int), np.zeros((1, 4), bool), trim=8)
    assert code[0] == ext.DEAD_END
