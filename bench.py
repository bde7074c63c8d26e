"""Benchmark: Bloom load+probe throughput on one TPU chip (HOT LOOP 1).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline compares against the reference's own hot loop compiled from
its vendored headers on this host's CPU (BASELINE_MEASURED.json,
combined insert+probe rate, all cores).
"""

import json
import os
import sys
import time

import numpy as np

import abyss_tpu  # noqa: F401  (x64 on)
import jax
import jax.numpy as jnp

from abyss_tpu.ops import nthash
from abyss_tpu.ops.bloom import CountingBloomFilter

K = int(os.environ.get("BENCH_K", 25))
H = 4
BATCH = int(os.environ.get("BENCH_BATCH", 4096))
READ_LEN = 100
FILTER_SIZE = 1 << int(os.environ.get("BENCH_FILTER_LOG2", 28))
ITERS = int(os.environ.get("BENCH_ITERS", 10))


def main():
    rng = np.random.default_rng(0)
    codes = jnp.asarray(
        rng.integers(0, 4, size=(BATCH, READ_LEN), dtype=np.uint8))
    kmers_per_batch = BATCH * (READ_LEN - K + 1)

    @jax.jit
    def load_step(counters, codes):
        cbf = CountingBloomFilter(counters=counters, k=K, num_hashes=H,
                                  threshold=2)
        _, _, canon, valid = nthash.kmer_hashes(codes, K)
        return cbf.insert(canon, valid).counters

    @jax.jit
    def probe_step(counters, codes):
        cbf = CountingBloomFilter(counters=counters, k=K, num_hashes=H,
                                  threshold=2)
        _, _, canon, valid = nthash.kmer_hashes(codes, K)
        return cbf.count(canon, valid).sum()

    counters = jnp.zeros(FILTER_SIZE + 1, jnp.uint8)
    # warmup / compile
    counters = jax.block_until_ready(load_step(counters, codes))
    _ = jax.block_until_ready(probe_step(counters, codes))

    t0 = time.perf_counter()
    for _ in range(ITERS):
        counters = load_step(counters, codes)
    jax.block_until_ready(counters)
    t_insert = (time.perf_counter() - t0) / ITERS

    t0 = time.perf_counter()
    s = 0
    for _ in range(ITERS):
        s = probe_step(counters, codes)
    jax.block_until_ready(s)
    t_probe = (time.perf_counter() - t0) / ITERS

    insert_rate = kmers_per_batch / t_insert
    probe_rate = kmers_per_batch / t_probe
    combined = kmers_per_batch / (t_insert + t_probe)

    baseline_path = os.path.join(os.path.dirname(__file__),
                                 "BASELINE_MEASURED.json")
    vs = None
    try:
        with open(baseline_path) as f:
            base = json.load(f)["k25"]["combined_kmers_per_s"]
        vs = combined / base
    except Exception:
        vs = 0.0

    print(json.dumps({
        "metric": "bloom_load_probe_kmers_per_sec_per_chip",
        "value": round(combined),
        "unit": "kmers/s",
        "vs_baseline": round(vs, 3),
        "detail": {
            "insert_kmers_per_s": round(insert_rate),
            "probe_kmers_per_s": round(probe_rate),
            "k": K, "batch": BATCH, "filter_bytes": FILTER_SIZE,
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()
