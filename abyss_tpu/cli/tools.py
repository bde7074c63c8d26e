"""Per-tool CLI entry points mirroring the reference's binaries.

Reference binaries covered here: abyss-bloom-dbg, ABYSS (hash-DBG),
AdjList, abyss-fac (stats.fac), abyss-pe (pipeline.pe), abyss-tofastq,
abyss-todot.
"""

from __future__ import annotations

import argparse
import sys


def bloom_dbg_main(argv=None):
    """abyss-bloom-dbg equivalent (BloomDBG/bloom-dbg.cc)."""
    ap = argparse.ArgumentParser(prog="abyss-tpu bloom-dbg")
    ap.add_argument("reads", nargs="+", help="FASTA/FASTQ input files")
    ap.add_argument("-k", "--kmer", type=int, required=True)
    ap.add_argument("-b", "--bloom-size", default="64M",
                    help="total Bloom memory budget (e.g. 500M, 2G)")
    ap.add_argument("--kc", type=int, default=2,
                    help="k-mer coverage threshold [2]")
    ap.add_argument("-H", "--num-hashes", type=int, default=4)
    ap.add_argument("-t", "--trim-length", type=int, default=None)
    ap.add_argument("-q", "--trim-quality", type=int, default=0)
    ap.add_argument("-o", "--out", default="-")
    ap.add_argument("-v", "--verbose", action="count", default=0)
    args = ap.parse_args(argv)

    from ..dbg import bloom_dbg
    from ..dbg.params import AssemblyParams
    params = AssemblyParams(
        k=args.kmer, num_hashes=args.num_hashes, min_cov=args.kc,
        trim=args.trim_length, bloom_bytes=parse_size(args.bloom_size),
        q=args.trim_quality, verbose=args.verbose)
    out = sys.stdout if args.out == "-" else open(args.out, "w")
    try:
        bloom_dbg.assemble(args.reads, params, out=out)
    finally:
        if out is not sys.stdout:
            out.close()


def abyss_main(argv=None):
    """ABYSS (exact hash-DBG) equivalent (ABYSS/abyss.cc)."""
    ap = argparse.ArgumentParser(prog="abyss-tpu assemble")
    ap.add_argument("reads", nargs="+")
    ap.add_argument("-k", "--kmer", type=int, required=True,
                    help="k-mer size (<= 32 for the exact engine)")
    ap.add_argument("--kc", type=int, default=2)
    ap.add_argument("-e", "--erode", type=int, default=2)
    ap.add_argument("-t", "--trim-length", type=int, default=None)
    ap.add_argument("-c", "--coverage", action="store_true",
                    help="set kc from the coverage model "
                         "(CoverageAlgorithm fixpoint)")
    ap.add_argument("-o", "--out", default="-")
    ap.add_argument("--coverage-hist", default=None)
    args = ap.parse_args(argv)

    import numpy as np
    from ..dbg import hash_dbg
    from ..io import fastx
    batches = [b.codes[:b.num_reads] for b in
               fastx.read_batches(args.reads, 4096, 512)]
    contigs, table = hash_dbg.assemble_reads(
        batches, args.kmer, kc=args.kc, erode_cov=args.erode,
        tip_len=args.trim_length, auto_coverage=args.coverage)
    if args.coverage_hist:
        with open(args.coverage_hist, "w") as f:
            f.write(hash_dbg.coverage_histogram(table).to_text())
    out = sys.stdout if args.out == "-" else open(args.out, "w")
    try:
        for i, (seq, cov) in enumerate(contigs):
            out.write(f">{i} {len(seq)} {cov}\n{seq}\n")
    finally:
        if out is not sys.stdout:
            out.close()


def adjlist_main(argv=None):
    """AdjList equivalent (AdjList/AdjList.cpp)."""
    ap = argparse.ArgumentParser(prog="abyss-tpu adjlist")
    ap.add_argument("contigs")
    ap.add_argument("-k", "--kmer", type=int, required=True)
    ap.add_argument("--adj", action="store_true", help="output .adj format")
    ap.add_argument("--gfa2", action="store_true", help="output GFA2")
    args = ap.parse_args(argv)

    from ..graph import adjlist, graphio
    from ..io import fastx
    recs = list(fastx.read_fastx(args.contigs))
    contigs = [(r.id, r.seq) for r in recs]
    covs = []
    for r in recs:
        parts = r.comment.split()
        covs.append(int(parts[1]) if len(parts) > 1 and
                    parts[1].isdigit() else 0)
    g = adjlist.build_overlap_graph(contigs, args.kmer, covs)
    if args.adj:
        graphio.write_adj(g, sys.stdout)
    elif args.gfa2:
        graphio.write_gfa2(g, sys.stdout, k=args.kmer,
                           seqs=dict(contigs))
    else:
        graphio.write_dot(g, sys.stdout, k=args.kmer)


def tofastq_main(argv=None):
    """abyss-tofastq equivalent (DataLayer/abyss-tofastq.cc)."""
    ap = argparse.ArgumentParser(prog="abyss-tpu tofastq")
    ap.add_argument("files", nargs="*", default=["-"])
    ap.add_argument("--fasta", action="store_true",
                    help="convert to FASTA instead")
    args = ap.parse_args(argv)
    from ..io import fastx
    for path in args.files or ["-"]:
        for rec in fastx.read_fastx(path):
            if args.fasta:
                sys.stdout.write(f">{rec.id}\n{rec.seq}\n")
            else:
                q = rec.qual or ("I" * len(rec.seq))
                sys.stdout.write(f"@{rec.id}\n{rec.seq}\n+\n{q}\n")


def todot_main(argv=None):
    """abyss-todot equivalent (Graph/todot.cc): graph format conversion."""
    ap = argparse.ArgumentParser(prog="abyss-tpu todot")
    ap.add_argument("graphs", nargs="+")
    ap.add_argument("-k", "--kmer", type=int, default=0)
    ap.add_argument("--adj", action="store_true")
    ap.add_argument("--gfa2", action="store_true")
    args = ap.parse_args(argv)
    from ..graph import graphio
    g = None
    k = args.kmer
    for path in args.graphs:
        g2, k2 = graphio.read_graph(path)
        k = k or k2
        if g is None:
            g = g2
        else:
            # merge: union of vertices/edges
            for cid in g2.contigs():
                name = g2.names[cid]
                if name not in g._index:
                    g.add_contig(name, g2.lengths[cid], g2.coverages[cid])
            for u in g2.vertices():
                for v, prop in g2.out_edges(u):
                    nu = graphio.parse_vertex_name(
                        g2.name(u), g._index)
                    nv = graphio.parse_vertex_name(
                        g2.name(v), g._index)
                    if not g.has_edge(nu, nv):
                        g.add_edge(nu, nv, prop)
    if args.adj:
        graphio.write_adj(g, sys.stdout)
    elif args.gfa2:
        graphio.write_gfa2(g, sys.stdout, k=k)
    else:
        graphio.write_dot(g, sys.stdout, k=k)


def gc_main(argv=None):
    """abyss-gc equivalent (Graph/gc.cc): vertex/edge counts."""
    ap = argparse.ArgumentParser(prog="abyss-tpu gc")
    ap.add_argument("graphs", nargs="+")
    args = ap.parse_args(argv)
    from ..graph import graphio
    for path in args.graphs:
        g, _ = graphio.read_graph(path)
        v = sum(1 for _ in g.vertices())
        e = g.num_edges()
        sys.stdout.write(f"{path}: V={v} E={e}\n")


def parse_size(s: str) -> int:
    s = s.strip().upper()
    mult = 1
    if s and s[-1] in "KMGT":
        mult = 1 << (10 * ("KMGT".index(s[-1]) + 1))
        s = s[:-1]
    return int(float(s) * mult)
