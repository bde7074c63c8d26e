"""Exact hash-DBG engine tests (the ABYSS-classic engine)."""

import numpy as np
import pytest
import jax.numpy as jnp

from abyss_tpu import sim
from abyss_tpu.core import alphabet
from abyss_tpu.dbg import hash_dbg


def codes_of(seqs, L=None):
    L = L or max(len(s) for s in seqs)
    out = np.full((len(seqs), L), alphabet.BAD, np.uint8)
    for i, s in enumerate(seqs):
        c = alphabet.encode(s)
        out[i, :len(c)] = c
    return out


def test_pack_matches_manual():
    k = 5
    seq = "ACGTT"
    f, rc, canon, valid = hash_dbg.pack_kmers(codes_of([seq]), k)
    want = 0
    for ch in seq:
        want = (want << 2) | "ACGT".index(ch)
    assert int(np.asarray(f)[0, 0]) == want
    assert hash_dbg.unpack_kmer(want, k) == seq
    rcs = alphabet.revcomp(seq)
    wantrc = 0
    for ch in rcs:
        wantrc = (wantrc << 2) | "ACGT".index(ch)
    assert int(np.asarray(rc)[0, 0]) == wantrc


def test_rc_packed():
    k = 21
    rng = np.random.default_rng(0)
    seq = "".join("ACGT"[i] for i in rng.integers(0, 4, k))
    f, rc, _, _ = hash_dbg.pack_kmers(codes_of([seq]), k)
    got = np.asarray(hash_dbg._rc_packed(jnp.asarray(f), k))
    assert int(got[0, 0]) == int(np.asarray(rc)[0, 0])


def test_count_kmers():
    k = 7
    # ACGTACGTAC windows pair up as reverse complements -> 2 canonical
    # k-mers, each seen twice per read
    t = hash_dbg.count_kmers([codes_of(["ACGTACGTAC", "ACGTACGTAC"])], k)
    assert len(t.kmers) == 2 and (t.counts == 4).all()
    # canonical dedupe: a revcomp read counts the same k-mers
    t2 = hash_dbg.count_kmers(
        [codes_of(["ACGTACGTAC", alphabet.revcomp("ACGTACGTAC")])], k)
    assert np.array_equal(t.kmers, t2.kmers)
    assert (t2.counts == 4).all()


def test_assemble_single_sequence():
    k = 15
    genome = sim.random_genome(300, seed=3)
    t = hash_dbg.count_kmers([codes_of([genome])], k)
    hash_dbg.apply_coverage_threshold(t, 1)
    hash_dbg.build_adjacency(t)
    contigs = hash_dbg.assemble(t)
    assert len(contigs) == 1
    s, cov = contigs[0]
    assert s == genome or s == alphabet.revcomp(genome)


def test_assemble_fork_splits():
    k = 15
    rng = np.random.default_rng(4)
    common = "".join("ACGT"[i] for i in rng.integers(0, 4, 80))
    a = common + "".join("ACGT"[i] for i in rng.integers(0, 4, 60))
    b = common + "".join("ACGT"[i] for i in rng.integers(0, 4, 60))
    t = hash_dbg.count_kmers([codes_of([a, b])], k)
    hash_dbg.build_adjacency(t)
    contigs = hash_dbg.assemble(t)
    # ~3 contigs: common stem + two branch arms (plus possible extra
    # splits at hairpin palindromes in the random sequence, which the
    # reference also splits on, Assembly/DBG.h:202-207)
    assert 3 <= len(contigs) <= 6
    total = sum(len(s) for s, _ in contigs)
    assert total >= len(a) + 60 - 2 * k
    # every contig is a substring of one of the inputs (or its rc)
    arc, brc = alphabet.revcomp(a), alphabet.revcomp(b)
    for s, _ in contigs:
        assert s in a or s in b or s in arc or s in brc


def test_full_engine_with_errors():
    k = 21
    genome = sim.random_genome(5000, seed=5)
    pr = sim.simulate_paired_reads(genome, coverage=40, read_len=100,
                                   error_rate=0.005, seed=6)
    seqs = [s for _, s, _ in pr.reads1] + [s for _, s, _ in pr.reads2]
    batches = [codes_of(seqs[i:i + 512], L=100)
               for i in range(0, len(seqs), 512)]
    # kc=3: recurring-error k-mers (count 2) would otherwise form bubbles,
    # which this engine leaves to the downstream graph-level PopBubbles
    # (the reference's in-engine BubbleAlgorithm is not yet ported)
    contigs, t = hash_dbg.assemble_reads(batches, k, kc=3, erode_cov=2)
    contigs = [c for c in contigs if len(c[0]) >= 2 * k]
    grc = alphabet.revcomp(genome)
    longest = max(len(s) for s, _ in contigs)
    assert longest > 0.5 * len(genome)
    matched = sum(len(s) for s, _ in contigs
                  if s in genome or s in grc)
    total = sum(len(s) for s, _ in contigs)
    assert matched > 0.9 * total


def test_coverage_threshold_model():
    h = hash_dbg.Histogram()
    # error spike at 1, real coverage peak at ~30
    # note: the tail count must not dip below the valley count, or the
    # reference's firstLocalMinimum resets to the tail and returns 0
    for c, n in [(1, 5000), (2, 800), (3, 100), (25, 200), (30, 400),
                 (35, 200), (40, 150)]:
        h.insert(c, n)
    thr = hash_dbg.coverage_threshold(h)
    assert 3 <= thr <= 10, thr


# --- bubble popping + low-coverage contig loop (round-1 additions) ---------

def test_pop_bubbles_kmer():
    from abyss_tpu import sim
    from abyss_tpu.core import alphabet as _a
    from abyss_tpu.dbg import hash_dbg
    import numpy as np
    # a genome and a SNP variant of its middle: reads from both create a
    # bubble of branch length ~k in the DBG
    g = sim.genome = sim.random_genome(600, seed=21)
    snp = 300
    alt = g[:snp] + ("A" if g[snp] != "A" else "C") + g[snp + 1:]
    k = 21

    def reads_of(seq, mult):
        return [seq[i:i + 60] for _ in range(mult)
                for i in range(0, len(seq) - 60, 7)]

    reads = reads_of(g, 3) + reads_of(alt, 1)
    L = 60
    arr = np.full((len(reads), L), 4, np.uint8)
    for i, r in enumerate(reads):
        arr[i, :len(r)] = _a.encode(r)
    bubbles = []
    contigs, t = hash_dbg.assemble_reads(
        [arr], k, kc=1, erode_cov=0, tip_len=0,
        bubble_len=2 * k, bubbles_out=bubbles)
    # the SNP bubble popped: one branch removed, main contig long
    assert len(bubbles) >= 1
    longest = max(len(s) for s, _ in contigs)
    assert longest > 500


def test_remove_low_coverage_contigs():
    from abyss_tpu import sim
    from abyss_tpu.core import alphabet as _a
    from abyss_tpu.dbg import hash_dbg
    import numpy as np
    k = 21
    main = sim.random_genome(400, seed=22)
    junk = sim.random_genome(120, seed=23)

    def reads_of(seq, mult):
        return [seq[i:i + 60] for _ in range(mult)
                for i in range(0, len(seq) - 60, 5)]

    reads = reads_of(main, 4) + reads_of(junk, 1)
    arr = np.full((len(reads), 60), 4, np.uint8)
    for i, r in enumerate(reads):
        arr[i, :len(r)] = _a.encode(r)
    # junk is at ~5x mean k-mer coverage, main at ~29x
    contigs, t = hash_dbg.assemble_reads(
        [arr], k, kc=1, erode_cov=0, tip_len=0, min_mean_cov=10)
    # the low-coverage junk contig is gone
    assert all(len(s) > 300 for s, _ in contigs), \
        [(len(s), c) for s, c in contigs]


# ---------------------------------------------------------------------------
# wide mode (k > 32): ntHash-fingerprint keys + packed-text side arrays
# (reference supports exact k up to MAX_KMER=192, Common/Kmer.h:129-144)


def test_wide_assemble_single_sequence():
    k = 40
    genome = sim.random_genome(400, seed=7)
    t = hash_dbg.count_kmers([codes_of([genome])], k)
    assert t.wide and t.n == len(genome) - k + 1
    hash_dbg.build_adjacency(t)
    contigs = hash_dbg.assemble(t)
    assert len(contigs) == 1
    s, _ = contigs[0]
    assert s == genome or s == alphabet.revcomp(genome)


def test_wide_matches_packed_at_small_k():
    """The fingerprint engine must assemble the same contigs as the
    exact packed engine where both apply."""
    k = 21
    genome = sim.random_genome(1500, seed=11)
    pr = sim.simulate_paired_reads(genome, coverage=20, read_len=100,
                                   seed=12)
    seqs = [s for _, s, _ in pr.reads1] + [s for _, s, _ in pr.reads2]
    batches = [codes_of(seqs, L=100)]
    tp = hash_dbg.count_kmers(batches, k)
    tw = hash_dbg._count_kmers_wide(batches, k)
    assert not tp.wide and tw.wide
    assert tp.n == tw.n
    np.testing.assert_array_equal(np.sort(tp.counts), np.sort(tw.counts))
    for t in (tp, tw):
        hash_dbg.build_adjacency(t)
    cp = sorted(s for s, _ in hash_dbg.assemble(tp))
    cw = sorted(s for s, _ in hash_dbg.assemble(tw))
    assert cp == cw


def test_wide_full_engine_k96():
    """E. coli-style config (README.md:259-263 documents k=96): reads
    with errors through the full phase sequence at k=96."""
    k = 96
    genome = sim.random_genome(4000, seed=13)
    pr = sim.simulate_paired_reads(genome, coverage=40, read_len=150,
                                   error_rate=0.002, seed=14)
    seqs = [s for _, s, _ in pr.reads1] + [s for _, s, _ in pr.reads2]
    batches = [codes_of(seqs[i:i + 512], L=150)
               for i in range(0, len(seqs), 512)]
    contigs, t = hash_dbg.assemble_reads(batches, k, kc=3, erode_cov=2)
    assert t.wide
    grc = alphabet.revcomp(genome)
    longest = max(len(s) for s, _ in contigs)
    assert longest > 0.5 * len(genome)
    matched = sum(len(s) for s, _ in contigs if s in genome or s in grc)
    total = sum(len(s) for s, _ in contigs)
    assert matched > 0.9 * total


def test_wide_snapshot_roundtrip(tmp_path):
    k = 48
    genome = sim.random_genome(600, seed=15)
    t = hash_dbg.count_kmers([codes_of([genome])], k)
    hash_dbg.build_adjacency(t)
    p = str(tmp_path / "wide.kmer.npz")
    hash_dbg.save_snapshot(t, p)
    t2 = hash_dbg.load_snapshot(p)
    assert t2.wide and t2.k == k
    c1 = sorted(s for s, _ in hash_dbg.assemble(t))
    c2 = sorted(s for s, _ in hash_dbg.assemble(t2))
    assert c1 == c2


def test_trim_flipped_orientation_tip():
    """A tip whose k-mers store in flipped (rc) orientation must still
    be pruned, and the trunk left intact (TrimAlgorithm.h:137-179
    tracks orientation exactly through the walk; VERDICT r1 #5)."""
    from abyss_tpu import sim
    from abyss_tpu.core import alphabet
    k = 25
    trunk = sim.random_genome(300, seed=77)
    # tip: branches off position 150 with 12 novel bases
    tip_seq = trunk[150 - (k - 1):150] + "".join(
        "TGCA"[(i * 7 + 3) % 4] for i in range(12))
    reads = []
    for start in range(0, len(trunk) - 80, 7):
        reads.append(trunk[start:start + 80])
    # feed the tip read REVERSE-COMPLEMENTED so its k-mers meet the
    # table in flipped orientation relative to the trunk walk
    reads.append(alphabet.revcomp(tip_seq))
    reads.append(alphabet.revcomp(tip_seq))
    codes = np.full((len(reads), 80), 4, np.uint8)
    for i, r in enumerate(reads):
        codes[i, :len(r)] = alphabet.encode(r)
    t = hash_dbg.count_kmers([codes], k)
    hash_dbg.apply_coverage_threshold(t, 1)
    hash_dbg.build_adjacency(t)
    n_before = int(t.alive.sum())
    removed = hash_dbg.trim(t, k)
    assert removed >= 11  # the tip-only k-mers (first window can
    # coincide with a trunk k-mer when the first novel base matches)
    contigs = hash_dbg.assemble(t)
    best = max(s for s, c in contigs)
    assert trunk in best or alphabet.revcomp(trunk) in best or \
        best in trunk or best in alphabet.revcomp(trunk)
    # trunk survives in one piece
    assert len(best) >= len(trunk) - 2 * k


def test_trim_keeps_long_branch():
    """Branches longer than the trim limit survive
    (BS_TOO_LONG, TrimAlgorithm.h:150-153)."""
    from abyss_tpu import sim
    from abyss_tpu.core import alphabet
    k = 25
    trunk = sim.random_genome(200, seed=78)
    branch = trunk[100 - (k - 1):100] + sim.random_genome(80, seed=79)
    reads = []
    for start in range(0, len(trunk) - 60, 5):
        reads.append(trunk[start:start + 60])
    for start in range(0, len(branch) - 60, 5):
        reads.append(branch[start:start + 60])
    codes = np.full((len(reads), 60), 4, np.uint8)
    for i, r in enumerate(reads):
        codes[i, :len(r)] = alphabet.encode(r)
    t = hash_dbg.count_kmers([codes], k)
    hash_dbg.apply_coverage_threshold(t, 1)
    hash_dbg.build_adjacency(t)
    alive_before = int(t.alive.sum())
    hash_dbg.trim(t, k)
    # the 80-base branch is > k kmers long: kept
    assert int(t.alive.sum()) > alive_before - 10


def test_erode_strand_threshold():
    """Per-strand erode threshold E (ErodeAlgorithm.h:75-77): a blunt
    k-mer covered on only one strand dies under E=1 even when total
    coverage passes e."""
    from abyss_tpu import sim
    from abyss_tpu.core import alphabet
    k = 25
    seq = sim.random_genome(120, seed=80)
    # every read in the SAME text orientation: one strand only
    reads = [seq] * 4
    codes = np.full((len(reads), 120), 4, np.uint8)
    for i, r in enumerate(reads):
        codes[i, :len(r)] = alphabet.encode(r)
    t = hash_dbg.count_kmers([codes], k, strand_counts=True)
    assert t.fwd_counts is not None
    hash_dbg.build_adjacency(t)
    t2 = hash_dbg.count_kmers([codes], k, strand_counts=True)
    hash_dbg.build_adjacency(t2)
    # e=2 alone keeps everything (coverage 4)
    hash_dbg.erode(t, 2, 0)
    assert int(t.alive.sum()) == t.n
    # E=1 erodes from the blunt ends inward (each k-mer is one-strand)
    n = hash_dbg.erode(t2, 2, 1)
    assert n == t2.n  # the whole single-strand path erodes away


@pytest.mark.slow
def test_trim_fixpoint_equals_ladder_schedule():
    """The direct t-fixpoint trim reaches the same alive set as the
    reference's 1,2,4..t ladder (TrimAlgorithm.h:15-34) on random
    error-laden graphs — the schedule is a cost model, not semantics."""
    from abyss_tpu import sim
    from abyss_tpu.core import alphabet

    def ladder(t, max_tip):
        total, ln = 0, 1
        while ln < max_tip:
            total += hash_dbg._trim_round(t, ln)
            ln *= 2
        while True:
            n = hash_dbg._trim_round(t, max_tip)
            total += n
            if n == 0:
                return total

    for seed in (101, 202, 303):
        rng = np.random.default_rng(seed)
        genome = sim.genome_with_repeats(3000, seed=seed, n_repeats=3,
                                         repeat_len=150)
        reads = sim.simulate_paired_reads(
            genome, coverage=25, read_len=70, error_rate=0.01,
            seed=seed + 1)
        batch = []
        for (n1, s1, _), (n2, s2, _) in zip(reads.reads1, reads.reads2):
            batch.extend([s1, s2])
        codes = np.full((len(batch), 70), 4, np.uint8)
        for i, s in enumerate(batch):
            codes[i, :len(s)] = alphabet.encode(s)
        k = 21
        ta = hash_dbg.count_kmers([codes], k)
        hash_dbg.apply_coverage_threshold(ta, 2)
        hash_dbg.build_adjacency(ta)
        hash_dbg.erode(ta, 2)
        tb = hash_dbg.KmerTable(k, ta.kmers.copy(), ta.counts.copy(),
                                ta.alive.copy())
        hash_dbg.build_adjacency(tb)
        hash_dbg.trim(ta, k)          # direct fixpoint
        ladder(tb, k)                 # reference schedule
        np.testing.assert_array_equal(ta.alive, tb.alive)
