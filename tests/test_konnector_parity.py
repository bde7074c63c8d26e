"""Konnector engine parity vs the REAL reference binary (round-3
verdict #4): per-pair search-result classes from the reference's -t
trace file must agree with our engine's outcomes on a simulated
library, and unique-path merged pseudo-reads must be byte-identical.

The reference builds a 2-level CascadingBloomFilter (-c2 default,
Bloom FPR ~0 at -b200M for this scale); we use the exact sorted filter
at threshold 2, so the only possible divergences are reference Bloom
false positives and batch-vs-vertex cost-cap ordering — both absent on
this fixture."""

import os
import subprocess

import numpy as np
import pytest

from abyss_tpu import sim
from abyss_tpu.core import alphabet
from abyss_tpu.gap import konnector
from abyss_tpu.ops import nthash
from abyss_tpu.ops.sorted_filter import SortedKmerCounter

REFBUILD = "/tmp/refbuild"
SCRIPT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts", "refbuild",
    "build_reference.sh")
K = 25


@pytest.fixture(scope="module")
def ref_konnector():
    if not os.path.isdir("/root/reference"):
        pytest.skip("no reference tree in this environment")
    r = subprocess.run(["sh", SCRIPT, REFBUILD], capture_output=True,
                       timeout=560)
    binpath = os.path.join(REFBUILD, "konnector")
    if r.returncode != 0 or not os.path.exists(binpath):
        pytest.skip(f"reference konnector build failed: "
                    f"{r.stderr[-300:]}")
    return binpath


@pytest.fixture(scope="module")
def library(tmp_path_factory):
    """Mixed library over a repeat-bearing genome: connectable pairs,
    over-long fragments (> -F), and pairs straddling repeats."""
    genome = sim.genome_with_repeats(30000, seed=40, n_repeats=4,
                                     repeat_len=300)
    reads = sim.simulate_paired_reads(genome, coverage=30, read_len=100,
                                      fragment_mean=400, fragment_sd=40,
                                      seed=41)
    r1 = list(reads.reads1)
    r2 = list(reads.reads2)
    # a handful of over-long fragments: NO_PATH via max_frag
    codes = alphabet.encode(genome)
    for j in range(8):
        s = 1000 + 2500 * j
        frag = 1400
        c1 = codes[s:s + 100]
        c2 = alphabet.revcomp_codes(codes[s + frag - 100:s + frag])
        r1.append((f"long_{j}/1", alphabet.decode(c1), "I" * 100))
        r2.append((f"long_{j}/2", alphabet.decode(c2), "I" * 100))
    d = tmp_path_factory.mktemp("konnparity")
    p1, p2 = str(d / "r1.fa"), str(d / "r2.fa")
    with open(p1, "w") as f1, open(p2, "w") as f2:
        for (n1, s1, _), (n2, s2, _) in zip(r1, r2):
            f1.write(f">{n1}\n{s1}\n")
            f2.write(f">{n2}\n{s2}\n")
    return genome, r1, r2, p1, p2, str(d)


@pytest.mark.slow
def test_class_and_sequence_parity(ref_konnector, library):
    genome, r1, r2, p1, p2, d = library

    trace = os.path.join(d, "trace.tsv")
    pref = os.path.join(d, "ref")
    r = subprocess.run(
        [ref_konnector, f"-k{K}", "-b200M", "-o", pref, "-t", trace,
         p1, p2],
        capture_output=True, timeout=500)
    assert r.returncode == 0, r.stderr[-500:]

    ref_class = {}
    with open(trace) as f:
        header = f.readline().rstrip("\n").split("\t")
        icol = header.index("search_result")
        idcol = header.index("read_id")
        for line in f:
            parts = line.rstrip("\n").split("\t")
            ref_class[parts[idcol]] = parts[icol]

    # reference merged pseudo-reads
    ref_merged = {}
    cur = None
    for line in open(pref + "_pseudoreads.fa"):
        if line.startswith(">"):
            cur = line[1:].split()[0]
            ref_merged[cur] = ""
        else:
            ref_merged[cur] += line.strip()

    # ours: exact threshold-2 filter from the same reads
    import jax.numpy as jnp
    seqs = [s for _, s, _ in r1] + [s for _, s, _ in r2]
    codes = np.full((len(seqs), 100), 4, np.uint8)
    for i, s in enumerate(seqs):
        codes[i, :len(s)] = alphabet.encode(s)
    ctr = SortedKmerCounter(K, threshold=2)
    _, _, canon, valid = nthash.kmer_hashes(jnp.asarray(codes), K)
    ctr.add(canon, valid)
    filt = ctr.finalize()

    pairs = [(a[1], b[1]) for a, b in zip(r1, r2)]
    stats = konnector.ConnectStats()
    res = konnector.connect_pairs_full(filt, pairs, K, stats=stats)

    # class comparison: our post-search gates (MISMATCH etc.) map back
    # to the search result, NO_KMER maps to the reference's NO_PATH row
    to_label = {"NO_KMER": "NO_PATH", "MISMATCH": "FOUND_PATH",
                "READ_MISMATCH": "FOUND_PATH"}
    agree = disagree = 0
    mismatches = []
    for (name, _, _), ours in zip(r1, res):
        prefix = name.rsplit("/", 1)[0]
        want = ref_class.get(prefix)
        got = to_label.get(ours.reason, ours.reason)
        if want == got:
            agree += 1
        else:
            disagree += 1
            mismatches.append((prefix, want, got))
    total = agree + disagree
    assert total == len(pairs)
    # demand near-perfect agreement; small residue tolerated for
    # reference-Bloom FP and cap-ordering effects
    assert disagree <= max(2, total // 100), mismatches[:20]

    # unique-path merged sequences must match byte-for-byte
    seq_match = seq_diff = 0
    for (name, _, _), ours in zip(r1, res):
        prefix = name.rsplit("/", 1)[0]
        if ours.reason == "FOUND_PATH" and ours.num_paths == 1 \
                and prefix in ref_merged:
            if ours.seq.upper() == ref_merged[prefix].upper():
                seq_match += 1
            else:
                seq_diff += 1
    assert seq_match > 0
    assert seq_diff <= max(1, (seq_match + seq_diff) // 100), \
        (seq_match, seq_diff)

    # the over-long fragments must not merge on either side
    for (name, _, _), ours in zip(r1, res):
        if name.startswith("long_"):
            prefix = name.rsplit("/", 1)[0]
            assert ref_class[prefix] != "FOUND_PATH"
            assert ours.reason != "FOUND_PATH"
