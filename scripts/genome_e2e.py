"""Genome-scale end-to-end acceptance run (E. coli analogue).

The reference's documented real-data example is an E. coli assembly
(README.md:259-263, `abyss-pe k=96 B=2G`).  No network egress here, so
we stand in a 4.6 Mbp simulated genome with exact repeats (the same
scale and the same stress: repeats break unitigs, scaffolding must
bridge them) and run the full pipeline reads -> scaffolds -> stats.

Usage: python scripts/genome_e2e.py [genome_bp] [k] [coverage] [outdir]
Prints a JSON summary line at the end.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from abyss_tpu import sim
from abyss_tpu.pipeline import pe
from abyss_tpu.core.histogram import Histogram
from abyss_tpu.io import fastx


def main():
    genome_bp = int(sys.argv[1]) if len(sys.argv) > 1 else 4_600_000
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 49
    coverage = float(sys.argv[3]) if len(sys.argv) > 3 else 40.0
    outdir = sys.argv[4] if len(sys.argv) > 4 else "/tmp/genome_e2e"
    os.makedirs(outdir, exist_ok=True)

    t0 = time.time()
    r1 = os.path.join(outdir, "r1.fq")
    r2 = os.path.join(outdir, "r2.fq")
    # The read cache (and the resumable stage outputs) are only valid
    # for the parameter tuple they were generated with: stamp it in
    # params.json and regenerate + clear stale stage outputs on change.
    params_sentinel = os.path.join(outdir, "params.json")
    params_now = {"genome_bp": genome_bp, "coverage": coverage}
    cached = None
    if os.path.exists(params_sentinel):
        try:
            with open(params_sentinel) as f:
                cached = json.load(f)
        except (OSError, ValueError):
            cached = None
    if (cached == params_now and os.path.exists(r1)
            and os.path.exists(r2)):
        n_pairs = sum(1 for line in open(r1) if line.startswith("@"))
        print(f"[sim] cached reads: {n_pairs} pairs", flush=True)
    else:
        for stale in os.listdir(outdir):
            if stale.startswith("ecoli-"):
                os.remove(os.path.join(outdir, stale))
        genome = sim.genome_with_repeats(genome_bp, seed=7, n_repeats=12,
                                         repeat_len=700)
        with open(os.path.join(outdir, "truth.fa"), "w") as f:
            f.write(f">truth\n{genome}\n")
        reads = sim.simulate_paired_reads(genome, coverage=coverage,
                                          read_len=150, fragment_mean=500,
                                          fragment_sd=50, error_rate=0.005,
                                          seed=11)
        # write via temp names + rename so a killed run never leaves a
        # truncated FASTQ that a rerun would silently reuse
        reads.write_fastq(r1 + ".tmp", r2 + ".tmp")
        os.rename(r1 + ".tmp", r1)
        os.rename(r2 + ".tmp", r2)
        with open(params_sentinel, "w") as f:
            json.dump(params_now, f)
        n_pairs = len(reads.reads1)
        print(f"[sim] {genome_bp}bp genome, {n_pairs} pairs "
              f"in {time.time() - t0:.1f}s", flush=True)
    # a changed k invalidates stage outputs too (reads stay valid)
    k_sentinel = os.path.join(outdir, "k.json")
    cached_k = None
    if os.path.exists(k_sentinel):
        try:
            with open(k_sentinel) as f:
                cached_k = json.load(f)
        except (OSError, ValueError):
            cached_k = None
    if cached_k != [k, (sys.argv[5] if len(sys.argv) > 5 else "exact")]:
        for stale in os.listdir(outdir):
            if stale.startswith("ecoli-"):
                os.remove(os.path.join(outdir, stale))
        with open(k_sentinel, "w") as f:
            json.dump([k, sys.argv[5] if len(sys.argv) > 5 else "exact"],
                      f)

    t1 = time.time()
    engine = sys.argv[5] if len(sys.argv) > 5 else "exact"
    p = pe.PipelineParams(name="ecoli", k=k, in_files=[r1, r2],
                          outdir=outdir, verbose=2, engine=engine)
    artifacts = pe.run(p)
    wall = time.time() - t1

    seqs = [r.seq for r in fastx.read_fastx(artifacts["scaffolds"])]
    h = Histogram.of(len(s) for s in seqs if len(s) >= 500)
    summary = {
        "genome_bp": genome_bp, "k": k, "coverage": coverage,
        "engine": engine,
        "pairs": n_pairs, "wall_s": round(wall, 1),
        "n_scaffolds_500": h.size(), "sum": int(h.sum()),
        "n50": int(h.n50()), "max": int(h.maximum()),
    }
    print("E2E_SUMMARY " + json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
