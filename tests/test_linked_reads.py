"""Linked-read (tigmint/arcs equivalent) tests: molecule inference,
chimera cutting, barcode-link scaffolding, and the lr= CLI tools."""

import numpy as np
import pytest

from abyss_tpu import sim
from abyss_tpu.align.mapper import KmerAligner
from abyss_tpu.scaffold import linked_reads as lr


def _simulate_linked_reads(genome, n_molecules=60, mol_len=800,
                           reads_per_mol=12, read_len=60, seed=0):
    """Sample molecules from the genome, then short reads from each
    molecule, tagged with a BX barcode."""
    rng = np.random.default_rng(seed)
    reads = []  # (id, seq, barcode)
    for m in range(n_molecules):
        start = int(rng.integers(0, max(1, len(genome) - mol_len)))
        bc = f"BC{m:04d}"
        for r in range(reads_per_mol):
            pos = start + int(rng.integers(0, mol_len - read_len))
            reads.append((f"m{m}r{r}", genome[pos:pos + read_len], bc))
    return reads


def _write_linked_fastq(path, reads):
    with open(path, "w") as f:
        for rid, seq, bc in reads:
            f.write(f"@{rid} BX:Z:{bc}\n{seq}\n+\n{'I' * len(seq)}\n")


def _align(contigs, reads, k=32):
    from abyss_tpu.core import alphabet
    al = KmerAligner(contigs, k=k)
    codes = np.full((len(reads), 64), alphabet.BAD, np.uint8)
    lens = np.zeros(len(reads), np.int32)
    ids = []
    for i, (rid, seq, bc) in enumerate(reads):
        c = alphabet.encode(seq)
        codes[i, :len(c)] = c
        lens[i] = len(c)
        ids.append(rid)
    alns = al.align_batch(codes, lens, ids)
    barcodes = {rid: bc for rid, _, bc in reads}
    return alns, barcodes


def test_infer_molecules():
    genome = sim.random_genome(4000, seed=2)
    reads = _simulate_linked_reads(genome, n_molecules=20, seed=2)
    alns, barcodes = _align([("g", genome)], reads)
    mols = lr.infer_molecules(alns, barcodes, max_dist=2000, min_reads=4)
    assert len(mols) >= 15
    for m in mols:
        assert m.end - m.start < 1000  # molecules are ~800bp
        assert m.num_reads >= 4


def test_cut_chimeric_contig():
    # chimera: two unrelated 2kb pieces glued together; molecules never
    # span the junction, so molecule coverage drops there
    a = sim.random_genome(2000, seed=3)
    b = sim.random_genome(2000, seed=4)
    chimera = a + b
    reads = (_simulate_linked_reads(a, n_molecules=80, seed=5)
             + [(f"b{rid}", seq, bc + "b") for rid, seq, bc in
                _simulate_linked_reads(b, n_molecules=80, seed=6)])
    alns, barcodes = _align([("chimera", chimera)], reads)
    mols = lr.infer_molecules(alns, barcodes, max_dist=2000, min_reads=4)
    cut, n_cuts = lr.cut_contigs([("chimera", chimera)], mols,
                                 min_spanning=1, trim_ends=400)
    assert n_cuts >= 1
    # the cut should land near the junction at 2000
    lengths = sorted(len(s) for _, s in cut)
    assert any(abs(len(s) - 2000) < 400 for _, s in cut)


def test_barcode_links_and_rescaffold(tmp_path):
    genome = sim.random_genome(6000, seed=7)
    contigs = [("c0", genome[:3000]), ("c1", genome[3000:])]
    reads = _simulate_linked_reads(genome, n_molecules=120, mol_len=1500,
                                   seed=8)
    alns, barcodes = _align(contigs, reads)
    g = lr.barcode_links(alns, barcodes,
                         {n: len(s) for n, s in contigs},
                         end_len=1500, min_shared=3, min_len=500)
    assert g.num_edges() >= 2  # the c0->c1 link (and its mirror)
    # full lr flow
    p1 = str(tmp_path / "lr.fq")
    _write_linked_fastq(p1, reads)
    scaffolds, st = lr.rescaffold_linked(
        contigs, [p1], align_k=32, min_shared=3, end_len=1500,
        min_pairs=3, min_len=500)
    assert st["links"] >= 1
    # the two contigs join into one scaffold (with an N gap)
    longest = max(len(s) for _, s in scaffolds)
    assert longest > 3000


def test_tigmint_arcs_cli(tmp_path, capsys):
    from abyss_tpu.cli import tools2
    genome = sim.random_genome(5000, seed=9)
    contigs_fa = tmp_path / "ctg.fa"
    contigs_fa.write_text(
        f">c0\n{genome[:2500]}\n>c1\n{genome[2500:]}\n")
    reads = _simulate_linked_reads(genome, n_molecules=100, mol_len=1200,
                                   seed=10)
    fq = str(tmp_path / "lr.fq")
    _write_linked_fastq(fq, reads)
    out_fa = str(tmp_path / "cut.fa")
    bed = str(tmp_path / "mol.bed")
    tools2.tigmint_main([str(contigs_fa), fq, "-o", out_fa, "--bed", bed,
                         "-d", "2000"])
    assert "molecules" in capsys.readouterr().err
    assert open(bed).read().count("\n") > 10
    tools2.arcs_main([str(contigs_fa), fq, "-e", "1200", "-n", "2",
                      "-s", "400"])
    cap = capsys.readouterr()
    assert "digraph" in cap.out
