"""Counting Bloom filter semantics: conservative update, thresholds,
order invariance, and agreement with exact k-mer counting."""

import numpy as np
import jax.numpy as jnp

from abyss_tpu.core import alphabet
from abyss_tpu.ops import bloom, nthash


def kmer_canon(seq, k):
    codes = alphabet.encode(seq)[None]
    _, _, canon, valid = nthash.kmer_hashes(codes, k)
    return np.asarray(canon)[0], np.asarray(valid)[0]


def test_insert_contains_roundtrip():
    k = 21
    f = bloom.CountingBloomFilter.create(1 << 16, k, num_hashes=4, threshold=2)
    rng = np.random.default_rng(3)
    seq = "".join("ACGT"[i] for i in rng.integers(0, 4, 300))
    canon, valid = kmer_canon(seq, k)
    f = f.insert(jnp.asarray(canon), jnp.asarray(valid))
    # inserted once: count == 1 -> not "solid" at threshold 2
    counts = np.asarray(f.count(jnp.asarray(canon)))
    assert (counts >= 1).all()
    f = f.insert(jnp.asarray(canon), jnp.asarray(valid))
    assert np.asarray(f.contains(jnp.asarray(canon))).all()


def test_absent_kmers_mostly_absent():
    k = 21
    f = bloom.CountingBloomFilter.create(1 << 18, k, num_hashes=4, threshold=1)
    rng = np.random.default_rng(4)
    seq = "".join("ACGT"[i] for i in rng.integers(0, 4, 500))
    canon, valid = kmer_canon(seq, k)
    f = f.insert(jnp.asarray(canon), jnp.asarray(valid))
    other = "".join("ACGT"[i] for i in rng.integers(0, 4, 500))
    canon2, _ = kmer_canon(other, k)
    fp = np.asarray(f.contains(jnp.asarray(canon2))).mean()
    assert fp < 0.02, fp


def test_duplicate_multiplicity_in_single_batch():
    k = 5
    f = bloom.CountingBloomFilter.create(1 << 14, k, num_hashes=3, threshold=3)
    seq = "ACGTA" * 4  # contains repeated k-mers
    canon, valid = kmer_canon(seq, k)
    # one batch with repeats: counts must reflect within-batch multiplicity
    f = f.insert(jnp.asarray(canon), jnp.asarray(valid))
    counts = np.asarray(f.count(jnp.asarray(canon)))
    # k-mer ACGTA occurs multiple times in the batch
    uniq, cnt = np.unique(canon, return_counts=True)
    for u, c in zip(uniq, cnt):
        got = counts[np.asarray(canon) == u]
        assert (got >= c).all()  # conservative: at least the true multiplicity


def test_batch_order_invariance():
    k = 11
    rng = np.random.default_rng(5)
    seq = "".join("ACGT"[i] for i in rng.integers(0, 4, 400))
    canon, valid = kmer_canon(seq, k)
    canon, valid = jnp.asarray(canon), jnp.asarray(valid)

    f1 = bloom.CountingBloomFilter.create(1 << 16, k)
    f1 = f1.insert(canon, valid)

    f2 = bloom.CountingBloomFilter.create(1 << 16, k)
    perm = rng.permutation(canon.shape[0])
    f2 = f2.insert(canon[perm], valid[perm])

    np.testing.assert_array_equal(np.asarray(f1.counters),
                                  np.asarray(f2.counters))


def test_counts_match_exact_counts():
    """On a collision-free filter, conservative min-count == exact count."""
    k = 17
    rng = np.random.default_rng(6)
    seq = "".join("ACGT"[i] for i in rng.integers(0, 4, 2000))
    canon, valid = kmer_canon(seq, k)
    f = bloom.CountingBloomFilter.create(1 << 22, k, num_hashes=4)
    f = f.insert(jnp.asarray(canon), jnp.asarray(valid))
    counts = np.asarray(f.count(jnp.asarray(canon)))
    uniq, exact = np.unique(canon, return_counts=True)
    exact_of = dict(zip(uniq.tolist(), exact.tolist()))
    mismatches = sum(
        1 for c, n in zip(canon, counts) if n != exact_of[int(c)])
    assert mismatches == 0


def test_streaming_equals_single_batch():
    k = 13
    rng = np.random.default_rng(7)
    seq = "".join("ACGT"[i] for i in rng.integers(0, 4, 600))
    canon, valid = kmer_canon(seq, k)
    canon, valid = jnp.asarray(canon), jnp.asarray(valid)
    f1 = bloom.CountingBloomFilter.create(1 << 16, k).insert(canon, valid)
    f2 = bloom.CountingBloomFilter.create(1 << 16, k)
    # streamed in 3 chunks: conservative update may differ only by being
    # *lower*; with a collision-free table it must be equal
    n = canon.shape[0]
    for lo in range(0, n, n // 3 + 1):
        hi = min(lo + n // 3 + 1, n)
        f2 = f2.insert(canon[lo:hi], valid[lo:hi])
    c1 = np.asarray(f1.count(canon))
    c2 = np.asarray(f2.count(canon))
    np.testing.assert_array_equal(c1, c2)


def test_bit_filter():
    k = 9
    f = bloom.BitBloomFilter.create(1 << 16, k, num_hashes=4)
    rng = np.random.default_rng(8)
    seq = "".join("ACGT"[i] for i in rng.integers(0, 4, 200))
    canon, valid = kmer_canon(seq, k)
    assert not np.asarray(f.contains(jnp.asarray(canon))).any()
    f = f.insert(jnp.asarray(canon), jnp.asarray(valid))
    assert np.asarray(f.contains(jnp.asarray(canon))).all()


def test_masked_lanes_are_noops():
    k = 9
    f = bloom.CountingBloomFilter.create(1 << 14, k)
    canon = jnp.asarray(np.array([123456789, 987654321], dtype=np.uint64))
    mask = jnp.asarray([True, False])
    f = f.insert(canon, mask)
    c = np.asarray(f.count(canon))
    assert c[0] >= 1
    # second k-mer was masked: (may still collide, but with 2^14 slots
    # and 4 hashes min-count is 0 with overwhelming probability)
    assert c[1] == 0


def test_recommended_sizes():
    c, v = bloom.recommended_sizes(9 * (1 << 20))
    assert c == 1 << 23 and v == 1 << 20


def test_cascading_levels_semantics():
    """One insert promotes one level; contains == seen >= depth times
    (Bloom/CascadingBloomFilter.h)."""
    k = 9
    f = bloom.CascadingBloomFilter.create(1 << 16, k, depth=3)
    canon = jnp.asarray(np.array([0x1234567, 0xABCDEF01, 0x55AA55AA],
                                 dtype=np.uint64))
    assert np.asarray(f.count(canon)).tolist() == [0, 0, 0]
    f = f.insert(canon[:1])
    assert np.asarray(f.count(canon)).tolist() == [1, 0, 0]
    f = f.insert(canon[:2])
    assert np.asarray(f.count(canon)).tolist() == [2, 1, 0]
    f = f.insert(canon)
    assert np.asarray(f.count(canon)).tolist() == [3, 2, 1]
    assert np.asarray(f.contains(canon)).tolist() == [True, False, False]
    # saturation at depth
    f = f.insert(canon[:1])
    assert int(np.asarray(f.count(canon[:1]))[0]) == 3


def test_cascading_batch_matches_sequential():
    """A batch with duplicate keys == the same keys inserted one at a
    time (order-invariant batched promotion)."""
    k = 11
    rng = np.random.default_rng(5)
    seq = "".join("ACGT"[i] for i in rng.integers(0, 4, 300))
    canon, valid = kmer_canon(seq, k)
    canon = canon[valid]
    batch = np.concatenate([canon, canon[::2], canon[::4]])  # mults 1-3
    f1 = bloom.CascadingBloomFilter.create(1 << 16, k, depth=3)
    f1 = f1.insert(jnp.asarray(batch))
    f2 = bloom.CascadingBloomFilter.create(1 << 16, k, depth=3)
    for h in batch:
        f2 = f2.insert(jnp.asarray(np.array([h], dtype=np.uint64)))
    np.testing.assert_array_equal(np.asarray(f1.levels),
                                  np.asarray(f2.levels))


def test_cascading_save_load_union(tmp_path):
    k = 9
    a = bloom.CascadingBloomFilter.create(1 << 14, k, depth=2)
    b = bloom.CascadingBloomFilter.create(1 << 14, k, depth=2)
    ka = jnp.asarray(np.array([111, 222], dtype=np.uint64))
    kb = jnp.asarray(np.array([333, 444], dtype=np.uint64))
    a = a.insert(ka).insert(ka)
    b = b.insert(kb).insert(kb)
    u = bloom.union(a, b)
    assert np.asarray(u.contains(ka)).all()
    assert np.asarray(u.contains(kb)).all()
    p = str(tmp_path / "c.npz")
    bloom.save_filter(p, u)
    v = bloom.load_filter(p)
    assert isinstance(v, bloom.CascadingBloomFilter)
    assert np.asarray(v.contains(ka)).all() and v.depth == 2


def test_cascading_windowed_union_matches_single_shot():
    """Window-sharded cascade builds OR-merge to the single-shot filter
    (CascadingBloomFilterWindow.h semantics: single-index cascade, each
    key's state lives in one window)."""
    k = 11
    rng = np.random.default_rng(21)
    seq = "".join("ACGT"[i] for i in rng.integers(0, 4, 400))
    canon, valid = kmer_canon(seq, k)
    canon = np.concatenate([canon[valid], canon[valid][::2]])
    size = 1 << 14
    single = bloom.CascadingBloomFilter.create(size, k, num_hashes=1,
                                               depth=2)
    single = single.insert(jnp.asarray(canon))
    merged = None
    nw = 4
    for i in range(nw):
        shard = bloom.CascadingBloomFilter.create(size, k, num_hashes=1,
                                                  depth=2)
        shard = shard.insert_window(jnp.asarray(canon), i * size // nw,
                                    (i + 1) * size // nw)
        merged = shard if merged is None else bloom.union(merged, shard)
    np.testing.assert_array_equal(np.asarray(single.levels),
                                  np.asarray(merged.levels))


def test_cascading_window_requires_single_hash():
    f = bloom.CascadingBloomFilter.create(1 << 14, 9, num_hashes=4)
    try:
        f.insert_window(jnp.asarray(np.array([1], np.uint64)), 0, 100)
    except ValueError:
        pass
    else:
        raise AssertionError("expected ValueError for H>1 windowed build")
