"""Round-5 measurement campaign: re-measure the four losing BASELINE
configs after the round-5 fixes (device pair engine, bloom walk
scaling, konnector device BFS).

Steps (each prints one JSON line tagged STEP):
  1. paired-DBG stage 1, span k=80 / K=40 (device pair engine;
     round 4: 1330.4 s vs reference 494.8 s)
  2. Bloom-engine stage-1 wall at k=31 (round 4: DNF >75 min)
  3. k=96 wide stage 1 with ABYSS_TPU_PHASE_LOG=1 (round 4: 1026.6 s
     vs abyss-bloom-dbg 52.0 s / ABYSS 298.2 s)
  4. konnector 50K pairs, ours vs reference binary

Usage: python scripts/round5_campaign.py [outdir] [steps]
Reuses the round-4 fixture (/tmp/headtohead; regenerated if absent).
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BIN = os.environ.get("REFBUILD", "/tmp/refbuild")
FIX = os.environ.get("H2H_DIR", "/tmp/headtohead")


def log(step, **kw):
    print(f"STEP {json.dumps(dict(step=step, **kw))}", flush=True)


def main():
    os.environ.setdefault("ABYSS_TPU_PHASE_LOG", "1")
    from round4_campaign import ensure_fixture, ours_stage1, ref_cmd
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/round5"
    steps = (sys.argv[2].split(",") if len(sys.argv) > 2
             else ["1", "2", "3", "4"])
    os.makedirs(outdir, exist_ok=True)
    r1, r2 = ensure_fixture()

    if "1" in steps:
        wall, n, total = ours_stage1(
            os.path.join(outdir, "paired80"), 80, "exact", K=40)
        log("ours_paired_k80K40_stage1_r5", wall_s=wall, contigs=n,
            sum_bp=total)

    if "2" in steps:
        wall, n, total = ours_stage1(
            os.path.join(outdir, "bloom31"), 31, "bloom")
        log("ours_bloom_k31_stage1_r5", wall_s=wall, contigs=n,
            sum_bp=total)

    if "3" in steps:
        wall, n, total = ours_stage1(
            os.path.join(outdir, "wide96"), 96, "exact", kc=3)
        log("ours_k96_stage1_r5", wall_s=wall, contigs=n, sum_bp=total)

    if "4" in steps:
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
        log("ref_konnector_50k_r5", wall_s=w, merged=nref,
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
        log("ours_konnector_50k_r5", wall_s=w, merged=nours,
            pairs_per_s=round(50000 / max(w, 1e-9)))

    print("CAMPAIGN DONE", flush=True)


if __name__ == "__main__":
    main()
