"""Sorted-table k-mer counter: exactness + drop-in compatibility with
the counting Bloom filter in the extension engine."""

import numpy as np
import jax.numpy as jnp

from abyss_tpu import sim
from abyss_tpu.core import alphabet
from abyss_tpu.dbg import extend as ext
from abyss_tpu.ops import nthash, sorted_filter


def test_counts_exact():
    k = 21
    rng = np.random.default_rng(1)
    seq = "".join("ACGT"[i] for i in rng.integers(0, 4, 2000))
    codes = alphabet.encode(seq)[None]
    f = sorted_filter.build_sorted_filter([codes, codes], k, threshold=2)
    _, _, canon, valid = nthash.kmer_hashes(jnp.asarray(codes), k)
    counts = np.asarray(f.count(canon, valid))
    canon_np = np.asarray(canon)[0]
    uniq, exact = np.unique(canon_np, return_counts=True)
    of = dict(zip(uniq.tolist(), (2 * exact).tolist()))
    for c, n in zip(canon_np, counts[0]):
        assert n == of[int(c)]
    # absent k-mers are 0 (no false positives)
    other = alphabet.encode(sim.random_genome(500, seed=9))[None]
    _, _, canon2, valid2 = nthash.kmer_hashes(jnp.asarray(other), k)
    assert np.asarray(f.count(canon2, valid2)).max() == 0


def test_streaming_reduction_matches():
    k = 15
    rng = np.random.default_rng(2)
    batches = [rng.integers(0, 4, (64, 80), dtype=np.uint8)
               for _ in range(4)]
    one = sorted_filter.build_sorted_filter(batches, k)
    ctr = sorted_filter.SortedKmerCounter(k, reduce_every=1000)
    for b in batches:
        _, _, canon, valid = nthash.kmer_hashes(jnp.asarray(b), k)
        ctr.add(canon, valid)
    two = ctr.finalize()
    np.testing.assert_array_equal(np.asarray(one.kmers),
                                  np.asarray(two.kmers))
    np.testing.assert_array_equal(np.asarray(one.counts),
                                  np.asarray(two.counts))


def test_extension_engine_with_sorted_filter():
    """The extension engine runs unchanged on the sorted filter."""
    k = 15
    genome = sim.random_genome(400, seed=3)
    codes = alphabet.encode(genome)[None]
    f = sorted_filter.build_sorted_filter([codes], k, threshold=1)
    seed = alphabet.encode(genome[:k])[None]
    buf, length, status = ext.extend_forward(f, seed, k, trim=k)
    assert status[0] == ext.DEAD_END
    assert alphabet.decode(buf[0, :length[0]]) == genome


def test_join_counts_randomized_vs_numpy():
    import numpy as np
    import jax.numpy as jnp
    from abyss_tpu.ops.sort_join import join_counts
    rng = np.random.default_rng(0)
    for trial in range(5):
        table = np.unique(rng.integers(0, 1 << 62, size=3000,
                                       dtype=np.uint64))
        counts = rng.integers(1, 1000, size=len(table)).astype(np.int32)
        # queries: half hits, half misses, duplicates included
        hits = rng.choice(table, size=2000)
        misses = rng.integers(0, 1 << 62, size=2000, dtype=np.uint64)
        queries = np.concatenate([hits, misses])
        rng.shuffle(queries)
        got = np.asarray(join_counts(jnp.asarray(table),
                                     jnp.asarray(counts),
                                     jnp.asarray(queries)))
        lut = dict(zip(table.tolist(), counts.tolist()))
        want = np.array([lut.get(int(q), 0) for q in queries], np.int32)
        assert np.array_equal(got, want), trial


def test_join_counts_packed_vs_exact():
    import numpy as np
    import jax.numpy as jnp
    from abyss_tpu.ops.sort_join import (join_counts, join_counts_packed,
                                         pack_table)
    rng = np.random.default_rng(7)
    table = np.unique(rng.integers(0, 1 << 62, size=5000, dtype=np.uint64))
    counts = rng.integers(1, 30000, size=len(table)).astype(np.int32)
    hits = rng.choice(table, size=3000)
    misses = rng.integers(0, 1 << 62, size=3000, dtype=np.uint64)
    queries = np.concatenate([hits, misses])
    rng.shuffle(queries)
    exact = np.asarray(join_counts(jnp.asarray(table), jnp.asarray(counts),
                                   jnp.asarray(queries)))
    packed = np.asarray(join_counts_packed(
        pack_table(jnp.asarray(table), jnp.asarray(counts)),
        jnp.asarray(queries)))
    # 40-bit-prefix collisions are ~1e-8 here: results must agree
    assert np.array_equal(exact, packed)


def test_count_bulk_packed_default():
    import numpy as np
    import jax.numpy as jnp
    from abyss_tpu.ops.sorted_filter import SortedKmerCounter
    from abyss_tpu.ops import nthash
    rng = np.random.default_rng(9)
    codes = rng.integers(0, 4, size=(64, 100), dtype=np.uint8)
    ctr = SortedKmerCounter(25, 1)
    _, _, canon, valid = nthash.kmer_hashes(jnp.asarray(codes), 25)
    ctr.add(canon, valid)
    f = ctr.finalize()
    assert f.packed is not None
    c_fast = np.asarray(f.count_bulk(canon, valid))
    c_exact = np.asarray(f.count_bulk(canon, valid, exact=True))
    c_point = np.asarray(f.count(canon, valid))
    assert np.array_equal(c_fast, c_exact)
    assert np.array_equal(c_fast, c_point)


def test_join_counts_merge_vs_packed():
    """The bitonic-merge probe must agree with the packed-sort probe
    on every shape (pow2 padding, empty table, tiny/lopsided sizes)."""
    import numpy as np
    import jax.numpy as jnp
    from abyss_tpu.ops.sort_join import (join_counts_merge,
                                         join_counts_packed, pack_table)
    rng = np.random.default_rng(17)
    for M, N in [(4000, 3000), (1, 1), (257, 1), (1, 300), (0, 64),
                 (1024, 1024)]:
        table = np.unique(
            rng.integers(0, 2 << 61, size=max(M, 1), dtype=np.uint64))[:M]
        table.sort()
        counts = rng.integers(1, 1000, size=len(table)).astype(np.int32)
        q = rng.integers(0, 2 << 61, size=N, dtype=np.uint64)
        if len(table):
            q[: N // 2] = rng.choice(table, size=N // 2)
        pt = pack_table(jnp.asarray(table), jnp.asarray(counts))
        a = np.asarray(join_counts_packed(pt, jnp.asarray(q)))
        b = np.asarray(join_counts_merge(pt, jnp.asarray(q)))
        assert np.array_equal(a, b), (M, N)


def test_join_solid_packed_and_contains_bulk():
    """u32-finish solidity probe == thresholded packed counts, and
    contains_bulk routes through it with identical results."""
    import numpy as np
    import jax.numpy as jnp
    from abyss_tpu.ops import nthash
    from abyss_tpu.ops.sort_join import (join_counts_packed,
                                         join_solid_packed, pack_table)
    from abyss_tpu.ops.sorted_filter import SortedKmerCounter
    rng = np.random.default_rng(23)
    table = np.unique(rng.integers(0, 2 << 61, size=4000,
                                   dtype=np.uint64))
    counts = rng.integers(1, 6, size=len(table)).astype(np.int32)
    q = rng.integers(0, 2 << 61, size=3000, dtype=np.uint64)
    q[:1500] = rng.choice(table, size=1500)
    pt = pack_table(jnp.asarray(table), jnp.asarray(counts))
    c = np.asarray(join_counts_packed(pt, jnp.asarray(q)))
    for thr in (1, 2, 4):
        s = np.asarray(join_solid_packed(pt, jnp.asarray(q), thr))
        assert np.array_equal(s, c >= thr), thr

    codes = rng.integers(0, 4, size=(64, 100), dtype=np.uint8)
    ctr = SortedKmerCounter(25, 1)
    _, _, canon, valid = nthash.kmer_hashes(jnp.asarray(codes), 25)
    ctr.add(canon, valid)
    f = ctr.finalize()
    got = np.asarray(f.contains_bulk(canon, valid))
    want = np.asarray(f.count_bulk(canon, valid, exact=True)
                      >= f.threshold) & np.asarray(valid)
    assert np.array_equal(got, want)


def test_running_scans_match_numpy():
    """ops/scan Hillis-Steele ladders == numpy accumulate, all dtypes,
    both directions, non-pow2 lengths."""
    import numpy as np
    import jax.numpy as jnp
    from abyss_tpu.ops.scan import running_max, running_min, running_sum
    rng = np.random.default_rng(0)
    for n in (1, 3, 128, 4097):
        for dt in (np.int32, np.uint64):
            x = rng.integers(0, 1000, size=n).astype(dt)
            assert np.array_equal(
                np.asarray(running_max(jnp.asarray(x))),
                np.maximum.accumulate(x))
            assert np.array_equal(
                np.asarray(running_min(jnp.asarray(x), reverse=True)),
                np.minimum.accumulate(x[::-1])[::-1])
            assert np.array_equal(
                np.asarray(running_sum(jnp.asarray(x))),
                np.cumsum(x).astype(dt))


def test_join_rows_exact_including_lsb_neighbors():
    """join_rows must be exact on full 64-bit keys — packed k-mers that
    differ only in the low bit are distinct table entries (the flag-bit
    trick of join_counts would alias them)."""
    import jax.numpy as jnp
    from abyss_tpu.ops.sort_join import join_rows
    table = np.array([4, 5, 10, 11, 200], dtype=np.uint64)  # LSB pairs!
    queries = np.array([5, 4, 11, 10, 200, 7, 0], dtype=np.uint64)
    rows = np.asarray(join_rows(jnp.asarray(table), jnp.asarray(queries)))
    assert rows.tolist() == [1, 0, 3, 2, 4, -1, -1]


def test_join_rows_random_matches_searchsorted():
    rng = np.random.default_rng(17)
    import jax.numpy as jnp
    from abyss_tpu.ops.sort_join import join_rows
    table = np.unique(rng.integers(0, 1 << 48, 5000).astype(np.uint64))
    queries = np.concatenate([
        rng.choice(table, 3000),
        rng.integers(0, 1 << 48, 3000).astype(np.uint64)])
    rng.shuffle(queries)
    rows = np.asarray(join_rows(jnp.asarray(table), jnp.asarray(queries)))
    idx = np.searchsorted(table, queries)
    idx = np.minimum(idx, len(table) - 1)
    expect = np.where(table[idx] == queries, idx, -1)
    np.testing.assert_array_equal(rows, expect)
