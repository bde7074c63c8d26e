"""End-to-end Bloom-DBG assembly on simulated reads.

The analogue of the reference's integration smoke test
(README.md:245-254: assemble simulated paired reads, check stats)."""

import io

import numpy as np
import pytest

from abyss_tpu import sim
from abyss_tpu.core import alphabet
from abyss_tpu.dbg import bloom_dbg
from abyss_tpu.dbg.params import AssemblyParams
from abyss_tpu.io import fastx


def assemble_sim(genome, k=25, coverage=40, error_rate=0.0, seed=1,
                 tmp_path=None, **pkw):
    pr = sim.simulate_paired_reads(genome, coverage=coverage, read_len=100,
                                   error_rate=error_rate, seed=seed)
    p1 = str(tmp_path / "r1.fq")
    p2 = str(tmp_path / "r2.fq")
    pr.write_fastq(p1, p2)
    params = AssemblyParams(k=k, bloom_bytes=16 << 20, batch_size=1024,
                            max_read_len=128, **pkw)
    out = io.StringIO()
    counters = bloom_dbg.assemble([p1, p2], params, out=out)
    out.seek(0)
    contigs = [(r.id, r.seq) for r in fastx.read_fastx(out)]
    return contigs, counters


def check_contigs_match_genome(contigs, genome, min_len=0):
    """Every contig must align exactly to the genome (error-free reads)."""
    grc = alphabet.revcomp(genome)
    for cid, seq in contigs:
        if len(seq) < min_len:
            continue
        assert seq in genome or seq in grc, \
            f"contig {cid} (len {len(seq)}) not a genome substring"


@pytest.mark.slow
def test_single_unitig_genome(tmp_path):
    # a clean genome with no repeats of length >= k assembles into
    # contigs that exactly tile the genome
    genome = sim.random_genome(8000, seed=42)
    contigs, counters = assemble_sim(genome, k=25, tmp_path=tmp_path)
    assert counters.contig_id >= 1
    check_contigs_match_genome(contigs, genome)
    # nearly all of the genome should be covered by the longest contig
    longest = max(len(s) for _, s in contigs)
    assert longest > 0.95 * len(genome), longest


@pytest.mark.slow
def test_genome_with_repeat_breaks_contigs(tmp_path):
    genome = sim.genome_with_repeats(12000, seed=7, n_repeats=3,
                                     repeat_len=400)
    contigs, counters = assemble_sim(genome, k=25, tmp_path=tmp_path)
    check_contigs_match_genome(contigs, genome)
    total = sum(len(s) for _, s in contigs)
    # unitigs should cover most of the genome (repeat interior emitted once)
    assert total > 0.8 * len(genome)
    assert counters.contig_id >= 3  # repeats break the assembly


@pytest.mark.slow
def test_errors_are_suppressed(tmp_path):
    genome = sim.random_genome(8000, seed=13)
    contigs, counters = assemble_sim(genome, k=25, error_rate=0.01,
                                     coverage=50, tmp_path=tmp_path)
    # with kc=2 most error k-mers (singletons) vanish; recurrent errors can
    # still produce short spurious contigs (the reference emits these too —
    # the downstream pipeline removes them), so only long contigs must
    # match the genome exactly
    # error-bubble arms are exactly 2k-1 bp with coverage ~2/k-mer; they
    # are a bounded fraction of output bases
    check_contigs_match_genome(contigs, genome, min_len=120)
    genome_bases = sum(
        len(s) for _, s in contigs
        if s in genome or alphabet.revcomp(s) in genome)
    total = sum(len(s) for _, s in contigs)
    assert genome_bases > 0.75 * total
    # recurring errors create solid bubbles that break unitigs (the
    # reference fragments the same way; PopBubbles repairs downstream),
    # so only expect moderately long unitigs here
    longest = max(len(s) for _, s in contigs)
    assert longest > 400


@pytest.mark.slow
def test_deterministic_across_batch_sizes(tmp_path):
    genome = sim.random_genome(6000, seed=21)
    pr = sim.simulate_paired_reads(genome, coverage=30, read_len=100, seed=2)
    p1, p2 = str(tmp_path / "a1.fq"), str(tmp_path / "a2.fq")
    pr.write_fastq(p1, p2)

    def run(bs):
        params = AssemblyParams(k=25, bloom_bytes=16 << 20, batch_size=bs,
                                max_read_len=128)
        out = io.StringIO()
        bloom_dbg.assemble([p1, p2], params, out=out)
        out.seek(0)
        return sorted(min(r.seq, alphabet.revcomp(r.seq))
                      for r in fastx.read_fastx(out))

    a = run(512)
    b = run(2048)
    assert a == b


def test_header_format(tmp_path):
    genome = sim.random_genome(3000, seed=33)
    contigs, _ = assemble_sim(genome, k=25, tmp_path=tmp_path)
    # read back full headers
    pr = sim.simulate_paired_reads(genome, coverage=40, read_len=100, seed=1)
    p1, p2 = str(tmp_path / "h1.fq"), str(tmp_path / "h2.fq")
    pr.write_fastq(p1, p2)
    params = AssemblyParams(k=25, bloom_bytes=16 << 20, batch_size=1024,
                            max_read_len=128)
    out = io.StringIO()
    bloom_dbg.assemble([p1, p2], params, out=out)
    out.seek(0)
    recs = list(fastx.read_fastx(out))
    for r in recs:
        parts = r.comment.split()
        assert int(parts[0]) == len(r.seq)       # length field
        assert int(parts[1]) > 0                 # coverage field
        assert parts[2].startswith("read:")      # seeding read id


def test_read_log_trace(tmp_path):
    """-T/--read-log: per-read outcome rows (bloom-dbg.h:186-334)."""
    from abyss_tpu import sim
    from abyss_tpu.dbg import bloom_dbg
    from abyss_tpu.dbg.params import AssemblyParams
    genome = sim.random_genome(2000, seed=61)
    reads = sim.simulate_paired_reads(genome, coverage=15, seed=62)
    p1, p2 = str(tmp_path / "t1.fq"), str(tmp_path / "t2.fq")
    reads.write_fastq(p1, p2)
    log = str(tmp_path / "trace.tsv")
    params = AssemblyParams(k=25, min_cov=2, bloom_bytes=1 << 22,
                            batch_size=512, max_read_len=128,
                            read_log=log)
    with open(tmp_path / "out.fa", "w") as f:
        counters = bloom_dbg.assemble([p1, p2], params, out=f)
    rows = open(log).read().splitlines()
    assert rows[0] == "read_id\toutcome"
    assert len(rows) - 1 == counters.read_count
    outcomes = {r.split("\t")[1] for r in rows[1:]}
    assert "EXTENDED" in outcomes or "ALL_KMERS_VISITED" in outcomes


def test_trim_branch_kmers_batch_matches_singletons():
    """_trim_branch_kmers_batch index bookkeeping: a mixed-length batch
    (short contigs interleaved with junction-adjacent ones) must produce
    exactly the per-contig results, in order (bloom-dbg.h:738-770)."""
    import jax.numpy as jnp

    from abyss_tpu.ops import nthash
    from abyss_tpu.ops.sorted_filter import SortedKmerCounter

    k = 25
    core = sim.random_genome(400, seed=9)
    alt1 = core + sim.random_genome(300, seed=10)
    alt2 = core + sim.random_genome(300, seed=11)   # fork after `core`
    params = AssemblyParams(k=k, bloom_bytes=4 << 20)
    ctr = SortedKmerCounter(k, params.min_cov)
    for seq in (alt1, alt2):
        codes = alphabet.encode(seq)[None, :]
        for _ in range(2):                          # make every k-mer solid
            _, _, canon, valid = nthash.kmer_hashes(jnp.asarray(codes), k)
            ctr.add(canon, valid)
    cbf = ctr.finalize()

    seqs = [
        alphabet.encode(core),                      # ends at the junction
        alphabet.encode(alt1[390:480]),             # spans the junction
        alphabet.encode(core[:k]),                  # len == k: untouched
        alphabet.encode(alt2[375:]),                # starts AT the fork k-mer
        alphabet.encode(core[10:20]),               # len < k: untouched
        alphabet.encode(alt1[100:200]),             # interior, no trim
    ]
    batch = bloom_dbg._trim_branch_kmers_batch(cbf, seqs, params)
    singles = [bloom_dbg._trim_branch_kmers_batch(cbf, [s], params)[0]
               for s in seqs]
    assert len(batch) == len(seqs)
    for got, want in zip(batch, singles):
        np.testing.assert_array_equal(got, want)
    # interior slice has unambiguous edges on both ends: unchanged
    np.testing.assert_array_equal(batch[5], seqs[5])
    # short inputs pass through untouched
    np.testing.assert_array_equal(batch[2], seqs[2])
    np.testing.assert_array_equal(batch[4], seqs[4])
    # the junction-entering contig loses its ambiguous-edge end k-mer
    assert len(batch[3]) < len(seqs[3])
