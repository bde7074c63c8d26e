"""Full-pipeline head-to-head: OUR pipeline vs the REFERENCE's complete
stage chain on the SAME FASTQs, with contiguity (abyss-fac) AND
correctness (samtobreak breakpoints vs the simulated truth genome)
columns — round-3 verdict #1 / BASELINE config #3.

Usage:
  python scripts/head_to_head.py [genome_bp] [k] [outdir]

Steps:
  1. simulate (or reuse) the fixture: genome_bp with repeats, 40x
     150 bp pairs, 0.5% error (same generator as scripts/genome_e2e.py)
  2. reference: scripts/ref_pipeline.sh (hash-DBG chain, j=2)
  3. ours: the pe pipeline (exact engine, one TPU chip)
  4. abyss-fac table + breakpoint counts for both -8 scaffold sets
Prints one HEADTOHEAD json line at the end.
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from abyss_tpu import sim
from abyss_tpu.core.histogram import Histogram
from abyss_tpu.io import fastx
from abyss_tpu.stats.samtobreak import contig_breakpoints

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def fac(path):
    seqs = [r.seq for r in fastx.read_fastx(path)]
    h = Histogram.of(len(s) for s in seqs if len(s) >= 500)
    return {"n_500": h.size(), "n50": int(h.n50()) if h.size() else 0,
            "max": int(h.maximum()) if h.size() else 0,
            "sum": int(h.sum())}


def breaks(truth, path):
    # split scaffolds at N-runs into scaftigs first (samtobreak's
    # scaffold/contig distinction — N gaps are NOT misassemblies)
    import re
    contigs = []
    for r in fastx.read_fastx(path):
        if len(r.seq) < 500:
            continue
        for j, piece in enumerate(re.split("[Nn]+", r.seq)):
            if len(piece) >= 200:
                contigs.append((f"{r.id}.{j}", piece.upper()))
    st = contig_breakpoints(truth, contigs, k=32)
    return {"breakpoints": st.breakpoints,
            "scaftigs": st.contigs,
            "aligned_frac": round(st.aligned_fraction, 4)}


def main():
    genome_bp = int(sys.argv[1]) if len(sys.argv) > 1 else 4_600_000
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 31
    outdir = sys.argv[3] if len(sys.argv) > 3 else "/tmp/headtohead"
    os.makedirs(outdir, exist_ok=True)

    r1 = os.path.join(outdir, "r1.fq")
    r2 = os.path.join(outdir, "r2.fq")
    truth_fa = os.path.join(outdir, "truth.fa")
    if not (os.path.exists(r1) and os.path.exists(truth_fa)):
        t0 = time.time()
        genome = sim.genome_with_repeats(genome_bp, seed=7,
                                         n_repeats=12, repeat_len=700)
        with open(truth_fa, "w") as f:
            f.write(f">truth\n{genome}\n")
        reads = sim.simulate_paired_reads(
            genome, coverage=40, read_len=150, fragment_mean=500,
            fragment_sd=50, error_rate=0.005, seed=11)
        reads.write_fastq(r1 + ".tmp", r2 + ".tmp")
        os.rename(r1 + ".tmp", r1)
        os.rename(r2 + ".tmp", r2)
        print(f"[sim] {len(reads.reads1)} pairs in "
              f"{time.time() - t0:.0f}s", flush=True)
    truth = next(iter(fastx.read_fastx(truth_fa))).seq

    # ---- reference chains: hash-DBG (classic) AND bloom-DBG (the
    # reference's flagship 2.0 mode and its faster stage-1 here) —
    # "matching-or-beating" must beat the reference's BEST config
    # (round-4 verdict #3/weak #5)
    def run_ref(engine):
        refdir = os.path.join(
            outdir, "ref" if engine == "hash" else "ref_bloom")
        ref8 = os.path.join(refdir, "ref-8.fa")
        stages = {}
        if not os.path.exists(ref8):
            env = dict(os.environ, ENGINE=engine)
            p = subprocess.run(
                ["sh", os.path.join(ROOT, "scripts", "ref_pipeline.sh"),
                 refdir, str(k), r1, r2, "2"],
                capture_output=True, text=True, env=env)
            print(p.stdout[-2000:], flush=True)
            if p.returncode != 0:
                print(p.stderr[-2000:], flush=True)
                sys.exit(1)
            for line in p.stdout.splitlines():
                if line.startswith("STAGE "):
                    _, label, secs = line.split()
                    stages[label] = float(secs)
            with open(os.path.join(refdir, "stages.json"), "w") as f:
                json.dump(stages, f)
        else:
            with open(os.path.join(refdir, "stages.json")) as f:
                stages = json.load(f)
        return ref8, stages

    ref8, ref_stages = run_ref("hash")
    ref8b, ref_stages_b = run_ref("bloom")

    # ---- our pipeline: cold (fresh-process compile) + steady-state
    # (2nd run in the same process; the axon tunnel pays a large
    # per-process warmup and its compile cache does not engage, so
    # both framings are reported — BENCH_NOTES measurement discipline)
    from abyss_tpu.pipeline import pe
    walls = {}
    ours8 = None
    runs = int(os.environ.get("H2H_OURS_RUNS", "2"))
    for tag in ["cold", "steady"][:runs]:
        oursdir = os.path.join(outdir, f"ours_{tag}")
        os.makedirs(oursdir, exist_ok=True)
        t0 = time.time()
        params = pe.PipelineParams(name="ecoli", k=k,
                                   in_files=[r1, r2],
                                   outdir=oursdir, verbose=2,
                                   engine="exact",
                                   batch_size=int(os.environ.get(
                                       "H2H_BATCH", 16384)))
        artifacts = pe.run(params)
        walls[tag] = round(time.time() - t0, 1)
        ours8 = artifacts["scaffolds"]
        print(f"[ours:{tag}] {walls[tag]}s", flush=True)

    def cached_breaks(label, path):
        cpath = os.path.join(outdir, f"breaks_{label}.json")
        if os.path.exists(cpath):
            with open(cpath) as f:
                return json.load(f)
        b = breaks(truth, path)
        with open(cpath, "w") as f:
            json.dump(b, f)
        return b

    out = {
        "genome_bp": genome_bp, "k": k,
        "ref_wall_s": ref_stages.get("TOTAL"),
        "ref_stages": ref_stages,
        "ref_bloom_wall_s": ref_stages_b.get("TOTAL"),
        "ref_bloom_stages": ref_stages_b,
        "ours_wall_s": walls,
        "ref_fac": fac(ref8), "ref_bloom_fac": fac(ref8b),
        "ours_fac": fac(ours8),
        "ref_breaks": cached_breaks("ref", ref8),
        "ref_bloom_breaks": cached_breaks("ref_bloom", ref8b),
        "ours_breaks": cached_breaks("ours", ours8),
    }
    print("HEADTOHEAD " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
