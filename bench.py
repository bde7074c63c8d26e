"""Benchmark: solid-k-mer load + probe throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Models the pipeline's actual HOT LOOP: stage 1 counts every read
batch's k-mers into the filter (device sort + scan-only RLE), then the
assembly classifies every read batch against the finished table (the
packed sort-merge probe, ops/sort_join.py).  The table is built ONCE
from a fixed read sample and stays fixed while batches stream — like
the real pipeline, where the k-mer filter is finished before
classification starts.

  * count: per-batch sort+RLE reduction (SortedKmerCounter._sort_rle)
  * probe: join_solid_packed — one packed u64 sort of (table+batch),
    count-transport scan, u32 order-restoring sort

Batch size default 49152 reads: probe throughput rises with batch (the
fixed table amortizes across more queries) until sort-rate decay wins;
with unstable sorts 49152 beats 32768 by ~5% combined (BENCH_NOTES.md).

Timing method: the axon platform's block_until_ready is unreliable and
a D2H sync pays ~35 ms of tunnel latency, so each op is measured by
running N iterations inside one on-device fori_loop (with per-iteration
input perturbation to defeat loop-invariant hoisting) and differencing
against a 1-iteration run.

vs_baseline compares against the reference's own hot loop compiled from
its vendored headers on this host's CPU (BASELINE_MEASURED.json,
combined insert+probe rate, all cores).
"""

import json
import os
import time

import numpy as np

import abyss_tpu  # noqa: F401  (x64 on)
import jax
import jax.numpy as jnp

from abyss_tpu.ops import nthash
from abyss_tpu.ops.sort_join import join_solid_packed, pack_table
from abyss_tpu.ops.sorted_filter import SortedKmerCounter

K = int(os.environ.get("BENCH_K", 25))
BATCH = int(os.environ.get("BENCH_BATCH", 49152))
TABLE_READS = int(os.environ.get("BENCH_TABLE_READS", 16384))
READ_LEN = 100
ITERS = int(os.environ.get("BENCH_ITERS", 6))


def _sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf.ravel()[0:1])


def _timed(fn, reps=3):
    _sync(fn())  # compile
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _sync(fn())
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[reps // 2]


def _loop_rate(mk_loop, n=ITERS):
    """Per-op seconds via (t_N - t_1) / (N - 1)."""
    t1 = _timed(mk_loop(1))
    tn = _timed(mk_loop(n))
    return max((tn - t1) / (n - 1), 1e-9)


def main():
    rng = np.random.default_rng(0)
    codes = jax.device_put(
        rng.integers(0, 4, size=(BATCH, READ_LEN), dtype=np.uint8))
    kmers_per_batch = BATCH * (READ_LEN - K + 1)

    # ---- fixed table: the filter the probe runs against -------------------
    codes_t = jax.device_put(
        rng.integers(0, 4, size=(TABLE_READS, READ_LEN), dtype=np.uint8))
    _, _, canon_t, valid_t = nthash.kmer_hashes(codes_t, K)
    skf = SortedKmerCounter(K, 1)
    skf.add(canon_t, valid_t)
    table = skf.finalize()
    packed = pack_table(table.kmers, table.counts)

    # ---- load: count a batch's k-mers (sort + RLE) ------------------------
    def mk_count_loop(n):
        @jax.jit
        def f(c):
            def body(i, acc):
                # perturb input each iteration to defeat hoisting
                cc = jnp.bitwise_and(c + i.astype(jnp.uint8), jnp.uint8(3))
                canon, valid = nthash.canonical_hashes(cc, K)
                keys, counts = SortedKmerCounter._sort_rle(
                    jnp.where(valid, canon,
                              jnp.uint64(0xFFFFFFFFFFFFFFFF)).reshape(-1))
                return acc ^ keys[0] ^ jnp.uint64(counts[1])
            return jax.lax.fori_loop(0, n, body, jnp.uint64(0))
        return lambda: f(codes)

    t_count = _loop_rate(mk_count_loop)

    # ---- probe: classify a batch against the fixed table ------------------
    def mk_probe_loop(n):
        @jax.jit
        def f(tbl_p, c):
            def body(i, acc):
                cc = jnp.bitwise_and(c + i.astype(jnp.uint8), jnp.uint8(3))
                _, _, canon, valid = nthash.kmer_hashes(cc, K)
                solid = join_solid_packed(tbl_p, canon.reshape(-1), 1)
                return acc + jnp.where(valid.reshape(-1), solid,
                                       False).sum(dtype=jnp.int64)
            return jax.lax.fori_loop(0, n, body, jnp.int64(0))
        return lambda: f(packed, codes)

    t_probe = _loop_rate(mk_probe_loop)

    count_rate = kmers_per_batch / t_count
    probe_rate = kmers_per_batch / t_probe
    combined = kmers_per_batch / (t_count + t_probe)

    # ---- bloom insert: MEASURED, both update modes --------------------
    # (replaces the round-1 hardcoded prior; "sort" is the merge
    # reformulation of gather+scatter-max, ops/sort_join.py)
    from abyss_tpu.ops.bloom import CountingBloomFilter
    bloom_bits = int(os.environ.get("BENCH_BLOOM_SIZE", 1 << 24))
    bloom_rates = {}
    for mode in ("scatter", "sort"):
        if os.environ.get("BENCH_SKIP_BLOOM"):
            break
        filt = CountingBloomFilter.create(
            bloom_bits, K, 4, 2)._replace(update_mode=mode)

        def mk_bloom_loop(n, filt=filt):
            @jax.jit
            def f(f0, c):
                def body(i, facc):
                    cc = jnp.bitwise_and(c + i.astype(jnp.uint8),
                                         jnp.uint8(3))
                    _, _, canon, valid = nthash.kmer_hashes(cc, K)
                    return facc.insert(canon.reshape(-1),
                                       valid.reshape(-1))
                return jax.lax.fori_loop(0, n, body, f0).counters
            return lambda: f(filt, codes)

        t_bloom = _loop_rate(mk_bloom_loop)
        bloom_rates[mode] = round(kmers_per_batch / t_bloom)

    # ---- hash-only rate per implementation (VERDICT r1 #10) -----------
    hash_rates = {}
    for impl in ("xla", "pallas"):
        if os.environ.get("BENCH_SKIP_HASH"):
            break
        if impl == "pallas" and jax.devices()[0].platform not in (
                "tpu", "axon"):
            continue

        def mk_hash_loop(n, impl=impl):
            @jax.jit
            def f(c):
                def body(i, acc):
                    cc = jnp.bitwise_and(c + i.astype(jnp.uint8),
                                         jnp.uint8(3))
                    if impl == "pallas":
                        from abyss_tpu.ops.pallas_kernels import \
                            kmer_hashes_pallas
                        canon, valid = kmer_hashes_pallas(cc, K)
                    else:
                        _, _, canon, valid = nthash.kmer_hashes(cc, K)
                    return acc ^ canon[0, 0] ^ jnp.uint64(
                        valid.sum(dtype=jnp.int32))
                return jax.lax.fori_loop(0, n, body, jnp.uint64(0))
            return lambda: f(codes)

        try:
            t_hash = _loop_rate(mk_hash_loop)
            hash_rates[impl] = round(kmers_per_batch / t_hash)
        except Exception as e:  # kernel may reject this Mosaic build
            hash_rates[impl] = f"failed: {type(e).__name__}"

    # ---- wide mode (k=96, the README.md:259-263 E. coli config):
    # canonical ntHash fingerprints through the same sort/RLE + packed
    # probe machinery (round-3 verdict #10)
    wide_rates = {}
    if not os.environ.get("BENCH_SKIP_WIDE"):
        WK = int(os.environ.get("BENCH_WIDE_K", 96))
        WLEN = 150
        wcodes = jax.device_put(rng.integers(
            0, 4, size=(BATCH, WLEN), dtype=np.uint8))
        wkmers = BATCH * (WLEN - WK + 1)
        wskf = SortedKmerCounter(WK, 1)
        _, _, wcanon_t, wvalid_t = nthash.kmer_hashes(
            jax.device_put(rng.integers(
                0, 4, size=(TABLE_READS, WLEN), dtype=np.uint8)), WK)
        wskf.add(wcanon_t, wvalid_t)
        wtable = wskf.finalize()
        wpacked = pack_table(wtable.kmers, wtable.counts)

        def mk_wcount_loop(n):
            @jax.jit
            def f(c):
                def body(i, acc):
                    cc = jnp.bitwise_and(c + i.astype(jnp.uint8),
                                         jnp.uint8(3))
                    _, _, canon, valid = nthash.kmer_hashes(cc, WK)
                    keys, counts = SortedKmerCounter._sort_rle(
                        jnp.where(valid, canon,
                                  jnp.uint64(0xFFFFFFFFFFFFFFFF)
                                  ).reshape(-1))
                    return acc ^ keys[0] ^ jnp.uint64(counts[1])
                return jax.lax.fori_loop(0, n, body, jnp.uint64(0))
            return lambda: f(wcodes)

        def mk_wprobe_loop(n):
            @jax.jit
            def f(tbl_p, c):
                def body(i, acc):
                    cc = jnp.bitwise_and(c + i.astype(jnp.uint8),
                                         jnp.uint8(3))
                    _, _, canon, valid = nthash.kmer_hashes(cc, WK)
                    solid = join_solid_packed(tbl_p, canon.reshape(-1), 1)
                    return acc + jnp.where(valid.reshape(-1), solid,
                                           False).sum(dtype=jnp.int64)
                return jax.lax.fori_loop(0, n, body, jnp.int64(0))
            return lambda: f(wpacked, wcodes)

        t_wc = _loop_rate(mk_wcount_loop)
        t_wp = _loop_rate(mk_wprobe_loop)
        wide_rates = {
            "k": WK,
            "count_kmers_per_s": round(wkmers / t_wc),
            "probe_kmers_per_s": round(wkmers / t_wp),
            "combined_kmers_per_s": round(wkmers / (t_wc + t_wp)),
        }

    baseline_path = os.path.join(os.path.dirname(__file__),
                                 "BASELINE_MEASURED.json")
    try:
        with open(baseline_path) as f:
            base = json.load(f)["k25"]["combined_kmers_per_s"]
        vs = combined / base
    except Exception:
        vs = 0.0

    print(json.dumps({
        "metric": "kmer_load_probe_kmers_per_sec_per_chip",
        "value": round(combined),
        "unit": "kmers/s",
        "vs_baseline": round(vs, 3),
        "detail": {
            "sorted_count_kmers_per_s": round(count_rate),
            "sorted_probe_kmers_per_s": round(probe_rate),
            "bloom_insert_kmers_per_s": bloom_rates,
            "wide_mode": wide_rates,
            "hash_kmers_per_s": hash_rates,
            "hash_impl_engine_paths": nthash.resolved_impl(),
            "k": K, "batch": BATCH,
            "distinct_kmers_in_table": int(table.n),
            "device": str(jax.devices()[0]),
            "timing": "on-device fori_loop amortized (N-1 differencing)",
        },
    }))


if __name__ == "__main__":
    main()
