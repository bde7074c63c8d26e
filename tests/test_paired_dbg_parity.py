"""Paired-DBG parity vs the REAL reference binary (round-3 verdict #5
/ BASELINE config #4): `abyss-paired-dbg` (the PAIRED_DBG
re-instantiation of the Assembly/ stack, ABYSS/abyss.cc:2-7) and our
pair engine must emit the same canonical contig set — including the
'N'-interior contigs where short chains leave positions undetermined.

Reference naming: -k is the PAIR SPAN, -K the single k-mer size
(doc/abyss-pe.1); our engine's (k_single, K_span) argument order is
internal."""

import os
import subprocess

import numpy as np
import pytest

from abyss_tpu import sim
from abyss_tpu.core import alphabet
from abyss_tpu.dbg import paired_dbg
from abyss_tpu.io import fastx

REFBUILD = "/tmp/refbuild"
SCRIPT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts", "refbuild",
    "build_reference.sh")


@pytest.fixture(scope="module")
def ref_pdbg():
    if not os.path.isdir("/root/reference"):
        pytest.skip("no reference tree in this environment")
    r = subprocess.run(["sh", SCRIPT, REFBUILD], capture_output=True,
                       timeout=560)
    binpath = os.path.join(REFBUILD, "abyss-paired-dbg")
    if r.returncode != 0 or not os.path.exists(binpath):
        pytest.skip(f"reference paired-dbg build failed: "
                    f"{r.stderr[-300:]}")
    return binpath


def _fixture(tmp_path, seed=21):
    genome = sim.genome_with_repeats(8000, seed=seed, n_repeats=2,
                                     repeat_len=300)
    reads = sim.simulate_paired_reads(genome, coverage=35, read_len=100,
                                      seed=seed + 1)
    fa = str(tmp_path / "reads.fa")
    seqs = []
    with open(fa, "w") as f:
        for (n1, s1, _), (n2, s2, _) in zip(reads.reads1, reads.reads2):
            f.write(f">{n1}\n{s1}\n>{n2}\n{s2}\n")
            seqs.extend([s1, s2])
    codes = np.full((len(seqs), 100), 4, np.uint8)
    for i, s in enumerate(seqs):
        codes[i, :len(s)] = alphabet.encode(s)
    return fa, codes


def _canon_set(seqs):
    return sorted(min(s, alphabet.revcomp(s)) for s in seqs)


@pytest.mark.slow
def test_packed_pair_parity(ref_pdbg, tmp_path):
    """span 40 of two 16-mers (packed u64 pair mode)."""
    fa, codes = _fixture(tmp_path)
    out = str(tmp_path / "ref-1.fa")
    r = subprocess.run(
        [ref_pdbg, "-k40", "-K16", "-e0", "-E0", "-c0", "--kc=2",
         "-q0", "-o", out, fa],
        capture_output=True, timeout=300)
    assert r.returncode == 0, r.stderr[-400:]
    ref = _canon_set(rec.seq for rec in fastx.read_fastx(out))

    contigs = paired_dbg.assemble_pairs([codes], 16, 40, kc=2)
    ours = _canon_set(s for s, _ in contigs)
    assert ours == ref


@pytest.mark.slow
def test_wide_pair_parity(ref_pdbg, tmp_path):
    """span 80 of two 40-mers — the BASELINE config #4 shape
    (k=80 K=40), our wide fingerprint pair mode vs the reference's
    MAX_KMER=192 multi-word KmerPair."""
    fa, codes = _fixture(tmp_path, seed=31)
    out = str(tmp_path / "ref80-1.fa")
    r = subprocess.run(
        [ref_pdbg, "-k80", "-K40", "-e0", "-E0", "-c0", "--kc=2",
         "-q0", "-o", out, fa],
        capture_output=True, timeout=300)
    assert r.returncode == 0, r.stderr[-400:]
    ref = _canon_set(rec.seq for rec in fastx.read_fastx(out))

    contigs = paired_dbg.assemble_pairs([codes], 40, 80, kc=2)
    ours = _canon_set(s for s, _ in contigs)
    assert ours == ref
