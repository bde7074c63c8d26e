"""Round-4 measurement campaign: the unmeasured BASELINE configs.

Runs sequentially (each step prints one JSON line tagged STEP):
  1. k=96 wide-mode stage 1 (ours, exact wide engine) on the 4.6 Mbp
     fixture + reference `ABYSS -k96` and `abyss-bloom-dbg -k96` walls
     (BASELINE config #2; round-3 verdict #2)
  2. Bloom-engine stage-1 wall at k=31 (ours, engine=bloom) — the
     memory-lean mode's genome-scale number (verdict #8)
  3. paired-DBG stage 1 at span k=80 / K=40 (ours wide pair engine) +
     reference `abyss-paired-dbg -k80 -K40` (BASELINE config #4;
     verdict #5)
  4. konnector throughput: ours vs the reference binary on 50K pairs
     of the fixture (pairs/s; verdict #4)

Usage: python scripts/round4_campaign.py [outdir] [steps]
  steps: comma list like "1,2,3,4" (default all)
Requires the /tmp/headtohead fixture (or simulates it).
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

BIN = os.environ.get("REFBUILD", "/tmp/refbuild")
FIX = os.environ.get("H2H_DIR", "/tmp/headtohead")


def log(step, **kw):
    print(f"STEP {json.dumps(dict(step=step, **kw))}", flush=True)


def ensure_fixture():
    r1 = os.path.join(FIX, "r1.fq")
    r2 = os.path.join(FIX, "r2.fq")
    if not os.path.exists(r1):
        from abyss_tpu import sim
        os.makedirs(FIX, exist_ok=True)
        genome = sim.genome_with_repeats(4_600_000, seed=7,
                                         n_repeats=12, repeat_len=700)
        with open(os.path.join(FIX, "truth.fa"), "w") as f:
            f.write(f">truth\n{genome}\n")
        reads = sim.simulate_paired_reads(
            genome, coverage=40, read_len=150, fragment_mean=500,
            fragment_sd=50, error_rate=0.005, seed=11)
        reads.write_fastq(r1, r2)
    return r1, r2


def ours_stage1(outdir, k, engine, kc=2, K=0):
    from abyss_tpu.pipeline import pe
    r1, r2 = ensure_fixture()
    os.makedirs(outdir, exist_ok=True)
    p = pe.PipelineParams(name="s1", k=k, K=K, in_files=[r1, r2],
                          outdir=outdir, verbose=2, engine=engine,
                          kc=kc)
    t0 = time.time()
    out = pe.stage_unitigs_1(p)
    wall = round(time.time() - t0, 1)
    n = sum(1 for line in open(out) if line.startswith(">"))
    total = sum(len(line.strip()) for line in open(out)
                if not line.startswith(">"))
    return wall, n, total


def ref_cmd(args, timeout=3600):
    t0 = time.time()
    r = subprocess.run(args, capture_output=True, timeout=timeout)
    wall = round(time.time() - t0, 1)
    return wall, r


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/round4"
    steps = (sys.argv[2].split(",") if len(sys.argv) > 2
             else ["1", "2", "3", "4"])
    os.makedirs(outdir, exist_ok=True)
    r1, r2 = ensure_fixture()

    if "1" in steps:
        wall, n, total = ours_stage1(
            os.path.join(outdir, "wide96"), 96, "exact", kc=3)
        log("ours_k96_stage1", wall_s=wall, contigs=n, sum_bp=total)
        # both sides run their automatic e/E/c defaults
        w, r = ref_cmd([os.path.join(BIN, "ABYSS"), "-k96", "--kc=3",
                        "-o", os.path.join(outdir, "ref96-1.fa"),
                        r1, r2])
        log("ref_ABYSS_k96_stage1", wall_s=w, rc=r.returncode)
        w, r = ref_cmd([os.path.join(BIN, "abyss-bloom-dbg"), "-k96",
                        "-b400M", "--kc=3", "-j2",
                        r1, r2],)
        # bloom-dbg writes unitigs to stdout
        with open(os.path.join(outdir, "refbloom96-1.fa"), "wb") as f:
            f.write(r.stdout)
        log("ref_bloomdbg_k96_stage1", wall_s=w, rc=r.returncode)

    if "2" in steps:
        wall, n, total = ours_stage1(
            os.path.join(outdir, "bloom31"), 31, "bloom")
        log("ours_bloom_k31_stage1", wall_s=wall, contigs=n,
            sum_bp=total)

    if "3" in steps:
        wall, n, total = ours_stage1(
            os.path.join(outdir, "paired80"), 80, "exact", K=40)
        log("ours_paired_k80K40_stage1", wall_s=wall, contigs=n,
            sum_bp=total)
        w, r = ref_cmd([os.path.join(BIN, "abyss-paired-dbg"), "-k80",
                        "-K40", "--kc=2",
                        "-o", os.path.join(outdir, "refpdbg-1.fa"),
                        r1, r2])
        log("ref_paired_k80K40_stage1", wall_s=w, rc=r.returncode)

    if "4" in steps:
        # 50K-pair subset in FASTA
        sub1 = os.path.join(outdir, "k1.fa")
        sub2 = os.path.join(outdir, "k2.fa")
        if not os.path.exists(sub2):
            for src, dst in ((r1, sub1), (r2, sub2)):
                with open(src) as fi, open(dst, "w") as fo:
                    for i, line in enumerate(fi):
                        if i >= 200_000:
                            break
                        if i % 4 == 0:
                            fo.write(">" + line[1:])
                        elif i % 4 == 1:
                            fo.write(line)
        w, r = ref_cmd([os.path.join(BIN, "konnector"), "-k31",
                        "-b400M", "-j2",
                        "-o", os.path.join(outdir, "refkonn"),
                        sub1, sub2])
        nref = sum(1 for line in open(
            os.path.join(outdir, "refkonn_pseudoreads.fa"))
            if line.startswith(">"))
        log("ref_konnector_50k", wall_s=w, merged=nref,
            pairs_per_s=round(50000 / max(w, 1e-9)))
        from abyss_tpu.cli import tools
        t0 = time.time()
        tools.konnector_main([
            sub1, sub2, "-k", "31", "-b", "400M", "--cascade", "2",
            "-o", os.path.join(outdir, "ourskonn")])
        w = round(time.time() - t0, 1)
        nours = sum(1 for line in open(
            os.path.join(outdir, "ourskonn_merged.fa"))
            if line.startswith(">"))
        log("ours_konnector_50k", wall_s=w, merged=nours,
            pairs_per_s=round(50000 / max(w, 1e-9)))

    print("CAMPAIGN DONE", flush=True)


if __name__ == "__main__":
    main()
