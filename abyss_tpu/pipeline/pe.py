"""Pipeline driver: the abyss-pe equivalent (reference: bin/abyss-pe).

Runs the stage DAG unitigs -> contigs -> scaffolds -> stats through
filesystem artifacts named like the reference's
(`name-1.fa ... name-8.fa`, `name-3.dist.dot`, `name-stats.tab`), with
Make-style resumability: a stage is skipped when its output already
exists (like abyss-pe's dependency semantics, bin/abyss-pe:553-973).

Stage map (bloom mode, cf. SURVEY.md §3.1):
  stage 1   abyss-bloom-dbg        reads -> name-1.fa (+ -1.dot AdjList)
  stage 2   abyss-filtergraph      tips/islands pruned, chains merged
  stage 3   PopBubbles             name-3.fa = unitigs
  stage 4-5 map + fixmate + DistanceEst -> name-3.hist, name-3.dist.dot
  stage 6   SimpleGraph + MergePaths + MergeContigs -> name-6.fa = contigs
  stage 7   map(mp) + DistanceEst  -> name-6.dist.dot
  stage 8   abyss-scaffold         -> name-8.fa = scaffolds
  stats     abyss-fac              -> name-stats.tab
"""

from __future__ import annotations

import os
import sys
import time
from dataclasses import dataclass, field

import numpy as np

from ..align import distance_est, fixmate, mapper, nw
from ..core import alphabet
from ..core.histogram import Histogram, contiguity_stats, format_stats_table
from ..dbg import bloom_dbg
from ..dbg.params import AssemblyParams
from ..graph import adjlist, algorithms, graphio
from ..graph.contig_graph import ContigGraph, node
from ..io import fastx
from ..io import read_batches as io_read_batches
from ..scaffold import paths as pathtools


@dataclass
class PipelineParams:
    name: str = "abyss"
    k: int = 25
    in_files: list = field(default_factory=list)
    # unitig engine: "bloom" = read-seeded extension walks over the solid
    # k-mer structure (reference bloom-dbg semantics, any k); "exact" =
    # sorted-table DBG with pointer-doubling assembly (the TPU fast
    # path, SURVEY.md ABYSS engine; k <= 32 packed, k > 32 via the wide
    # ntHash-fingerprint mode)
    engine: str = "bloom"
    bloom_bytes: int = 64 << 20
    kc: int = 2
    num_hashes: int = 4
    q: int = 3
    # graph cleaning
    tip_len: int | None = None      # default 2k
    island_len: int | None = None   # default 2k
    bubble_identity: float = 0.9    # p
    rresolve: bool = True           # run RResolver before filtergraph
    rresolve_threshold: int = 4     # t (RResolver/README.md)
    # distance estimation / paths
    align_k: int = 32               # seed length for the mapper (l analogue)
    min_pairs: int = 10             # n
    min_len: int = 200              # s (scaffolding min contig len)
    outdir: str = "."
    verbose: int = 1
    batch_size: int = 4096
    max_read_len: int = 256
    # linked reads (lr=, bin/abyss-pe:752-849): tigmint cut + arcs
    # barcode links + rescaffold -> name-10.fa
    lr_files: list = field(default_factory=list)
    # long reads (long=): longseqdist + rescaffold -> name-10.fa
    long_files: list = field(default_factory=list)
    # paired DBG span (K=, bin/abyss-pe:556-564 selects abyss-paired-dbg)
    K: int = 0
    # gap sealing after scaffolding (abyss-sealer, sealer_ks)
    sealer_ks: list = field(default_factory=list)
    # SQLite telemetry (db=)
    db_path: str | None = None
    # multi-device stage-1 filter build (np=, the ABYSS-P analogue:
    # reads data-parallel over a device mesh, psum-merged filter)
    np_devices: int = 1
    # read->contig aligner (aligner=, bin/abyss-pe:276-302): "map" is
    # the native k-mer seed mapper; bwa/bwamem/bowtie2 shell out when
    # the binary exists (align/wrappers.py), falling back to map
    aligner: str = "map"

    def path(self, suffix: str) -> str:
        return os.path.join(self.outdir, f"{self.name}-{suffix}")


def _log(p: PipelineParams, msg: str):
    if p.verbose:
        print(f"[abyss-tpu-pe] {msg}", file=sys.stderr)


def _read_contigs(path: str) -> tuple[list, list]:
    recs = list(fastx.read_fastx(path))
    contigs = [(r.id, r.seq) for r in recs]
    covs = []
    for r in recs:
        parts = r.comment.split()
        covs.append(int(parts[1]) if len(parts) >= 2 and
                    parts[1].isdigit() else 0)
    return contigs, covs


def _write_contigs(path: str, contigs: list[tuple[str, str]],
                   covs: list[int] | None = None):
    recs = []
    for i, (name, seq) in enumerate(contigs):
        cov = covs[i] if covs else 0
        recs.append((f"{name} {len(seq)} {cov}", seq))
    fastx.write_fasta(path, recs)


def _fresh(p: PipelineParams, out: str) -> bool:
    return not os.path.exists(out)


def stage_unitigs_1(p: PipelineParams) -> str:
    out = p.path("1.fa")
    if not _fresh(p, out):
        return out
    if p.K:
        _log(p, f"stage 1: paired-DBG assembly (k={p.k} K={p.K}) -> {out}")
        from ..dbg import paired_dbg
        batches = [b.codes[:b.num_reads] for b in io_read_batches(
            p.in_files, p.batch_size, p.max_read_len, q=p.q)]
        contigs = paired_dbg.assemble_pairs(batches, p.k, p.K, kc=p.kc)
        with open(out + ".tmp", "w") as f:
            for i, item in enumerate(contigs):
                seq = item[0] if isinstance(item, tuple) else item
                f.write(f">{i} {len(seq)} 0\n{seq}\n")
        os.rename(out + ".tmp", out)
        return out
    if p.engine == "exact":
        _log(p, f"stage 1: exact hash-DBG assembly -> {out}")
        from ..dbg import hash_dbg
        batches = (b.codes for b in io_read_batches(
            p.in_files, p.batch_size, p.max_read_len, q=p.q))
        import jax
        if p.np_devices > 1 and len(jax.devices()) >= p.np_devices:
            # np= (ABYSS-P): mesh-parallel load phase, host merge of
            # the pre-reduced per-device (k-mer, count) pairs
            import numpy as np
            from ..parallel import distributed as dist
            _log(p, f"stage 1: mesh k-mer count over {p.np_devices} "
                    "devices (np=)")
            mesh = dist.make_mesh(p.np_devices, 1)
            if p.k > 32:
                batches = list(batches)
            keys, counts = dist.distributed_count_kmers(
                mesh, batches, p.k)
            t = hash_dbg.KmerTable(p.k, keys, counts,
                                   np.ones(len(keys), bool))
            if p.k > 32:
                # mesh keys are ntHash fingerprints: fill the wide-mode
                # side arrays (text + non-canonical hash) from the reads
                t = hash_dbg.fill_wide_side(t, batches)
            contigs = hash_dbg.assemble_table(t, kc=p.kc)
        else:
            contigs, _ = hash_dbg.assemble_reads(list(batches), p.k,
                                                 kc=p.kc)
        with open(out + ".tmp", "w") as f:
            for i, (seq, cov) in enumerate(contigs):
                f.write(f">{i} {len(seq)} {cov}\n{seq}\n")
        os.rename(out + ".tmp", out)
        return out
    _log(p, f"stage 1: bloom-dbg assembly -> {out}")
    params = AssemblyParams(k=p.k, num_hashes=p.num_hashes, min_cov=p.kc,
                            bloom_bytes=p.bloom_bytes, q=p.q,
                            batch_size=p.batch_size,
                            max_read_len=p.max_read_len,
                            verbose=p.verbose)
    prebuilt = None
    if p.np_devices > 1:
        import jax
        from ..parallel import distributed as dist
        if len(jax.devices()) >= p.np_devices:
            _log(p, f"stage 1: mesh filter build over {p.np_devices} "
                    "devices (np=)")
            mesh = dist.make_mesh(p.np_devices, 1)
            size = 1 << (max(p.bloom_bytes, 2).bit_length() - 1)
            # pad batches to full so every device gets an equal slice
            prebuilt = dist.distributed_filter_build(
                mesh, (b.codes for b in io_read_batches(
                    p.in_files, p.batch_size, p.max_read_len, q=p.q)),
                p.k, num_hashes=p.num_hashes, threshold=p.kc,
                size=size)
            params = AssemblyParams(
                k=p.k, num_hashes=p.num_hashes, min_cov=p.kc,
                bloom_bytes=p.bloom_bytes, q=p.q,
                batch_size=p.batch_size, max_read_len=p.max_read_len,
                verbose=p.verbose, filter_mode="bloom")
        else:
            _log(p, f"np={p.np_devices} requested but only "
                    f"{len(jax.devices())} devices; single-device build")
    with open(out + ".tmp", "w") as f:
        bloom_dbg.assemble(p.in_files, params, out=f,
                           prebuilt_filter=prebuilt)
    os.rename(out + ".tmp", out)
    return out


def stage_graph_2_3(p: PipelineParams) -> tuple[str, str]:
    """AdjList + filtergraph + PopBubbles -> name-3.fa (unitigs)."""
    out_fa = p.path("3.fa")
    out_dot = p.path("3.dot")
    if not _fresh(p, out_fa):
        return out_fa, out_dot
    contigs, covs = _read_contigs(p.path("1.fa"))
    _log(p, f"stage 2-3: graph cleanup of {len(contigs)} contigs")
    g = adjlist.build_overlap_graph(contigs, p.k, covs)
    graphio.write_dot(g, p.path("1.dot"), k=p.k)
    seqs = dict(contigs)

    if p.rresolve:
        # RResolver (abyss-rresolver-short, bin/abyss-pe:581-585): cut
        # junction paths unsupported by read-length r-mers
        from ..graph import rresolver
        first = next(io_read_batches(p.in_files, 256, p.max_read_len,
                                     q=p.q), None)
        if first is not None and first.num_reads:
            r = int(np.median(first.lengths[:first.num_reads]))
            r = max(p.k + 10, min(r, first.codes.shape[1]))
            # full padded batches keep one fixed shape -> one jit trace
            # (padding rows are BAD-coded, so their k-mers are invalid)
            rmer = rresolver.build_rmer_filter(
                (b.codes for b in io_read_batches(
                    p.in_files, p.batch_size, p.max_read_len, q=p.q)),
                r=r, size=1 << 22)
            stats = rresolver.resolve_repeats(
                g, seqs, rmer, p.k, support_threshold=p.rresolve_threshold)
            _log(p, f"stage 1-rr: cut {stats.edges_cut} unsupported edges "
                    f"at {stats.junctions} junctions (r={r})")
            graphio.write_dot(g, p.path("1-rr.dot"), k=p.k)

    tip_len = p.tip_len if p.tip_len is not None else 2 * p.k
    island_len = p.island_len if p.island_len is not None else 2 * p.k
    algorithms.prune_tips(g, tip_len)
    algorithms.remove_islands(g, island_len)
    check = nw.identity_check_factory(seqs, g.names, p.bubble_identity)
    popped = algorithms.pop_bubbles(g, identity_check=check)
    _log(p, f"stage 3: popped {len(popped)} bubbles")
    g2, seqs2, chains = algorithms.merge_linear_chains(g, seqs)
    out_contigs = [(n, seqs2[n]) for n in
                   (g2.names[c] for c in g2.contigs())]
    out_covs = [g2.coverages[c] for c in g2.contigs()]
    _write_contigs(out_fa, out_contigs, out_covs)
    graphio.write_dot(g2, out_dot, k=p.k)
    return out_fa, out_dot


def _map_all(p: PipelineParams, target_fa: str):
    """Map all reads to the target contigs; returns (hist, links)."""
    if p.aligner != "map":
        from ..align import sam as sammod, wrappers
        if wrappers.available(p.aligner):
            _log(p, f"aligner={p.aligner} (external)")
            import io as _io
            buf = _io.StringIO()
            wrappers.align_sam(p.aligner, target_fa, p.in_files, buf,
                               seed_len=p.align_k)
            alns = [sammod.parse(line)
                    for line in buf.getvalue().splitlines()
                    if line and not line.startswith("@")]
            return fixmate.fixmate(alns)
        _log(p, f"aligner={p.aligner} not found; using the native mapper")
    contigs, _ = _read_contigs(target_fa)
    al = mapper.KmerAligner(contigs, k=p.align_k)
    all_alns = []
    for batch in io_read_batches(p.in_files, p.batch_size,
                                    p.max_read_len, q=p.q):
        alns = al.align_batch(batch.codes,
                              batch.lengths, batch.ids)
        all_alns.extend(alns)
    return fixmate.fixmate(all_alns)


def stage_dist_5(p: PipelineParams) -> str:
    out = p.path("3.dist.dot")
    if not _fresh(p, out):
        return out
    _log(p, "stage 4-5: mapping reads + distance estimation")
    hist, links = _map_all(p, p.path("3.fa"))
    with open(p.path("3.hist"), "w") as f:
        f.write(hist.to_text())
    est = distance_est.estimate_distances(
        links, hist, min_pairs=p.min_pairs, min_align=p.align_k)
    contigs, _ = _read_contigs(p.path("3.fa"))
    distance_est.write_dist_dot(
        est, {n: len(s) for n, s in contigs}, out, k=p.k)
    return out


def stage_contigs_6(p: PipelineParams) -> str:
    out = p.path("6.fa")
    if not _fresh(p, out):
        return out
    contigs, covs = _read_contigs(p.path("3.fa"))
    seqs = dict(contigs)
    g = adjlist.build_overlap_graph(contigs, p.k, covs)
    dist_g, _ = graphio.read_dot(p.path("3.dist.dot"))
    estimates = {}
    ss = {"+": 0, "-": 1}
    for u in dist_g.vertices():
        for v, prop in dist_g.out_edges(u):
            if not prop or "n" not in prop:
                continue
            estimates[(dist_g.names[u >> 1], u & 1,
                       dist_g.names[v >> 1], v & 1)] = \
                distance_est.DistanceEstimate(
                    prop.get("d", 0), prop.get("n", 0),
                    float(prop.get("e", 0.0)))
    _log(p, f"stage 6: path search over {len(estimates)} distance edges")
    names_index = {n: g.id_of(n) for n, _ in contigs}
    sg_paths = pathtools.simple_graph_paths(g, estimates, names_index,
                                        seqs=seqs)
    merged = pathtools.merge_consistent_paths(sg_paths)
    pathtools.write_paths(merged, g, p.path("4.path"), start_id=0)
    _log(p, f"stage 6: {len(sg_paths)} seed paths -> {len(merged)} merged")

    used = set()
    out_contigs = []
    out_covs = []
    next_id = max((int(n) for n, _ in contigs if n.isdigit()), default=-1) + 1
    for path in merged:
        seq = pathtools.materialize_path(path, g, seqs)
        cov = sum(g.coverages[v >> 1] for v in path)
        out_contigs.append((str(next_id), seq))
        out_covs.append(cov)
        next_id += 1
        used.update(v >> 1 for v in path)
    for cid in g.contigs():
        if cid not in used:
            n = g.names[cid]
            out_contigs.append((n, seqs[n]))
            out_covs.append(g.coverages[cid])
    _write_contigs(out, out_contigs, out_covs)
    return out


def stage_scaffolds_8(p: PipelineParams) -> str:
    out = p.path("8.fa")
    if not _fresh(p, out):
        return out
    _log(p, "stage 7-8: scaffolding")
    contigs, covs = _read_contigs(p.path("6.fa"))
    seqs = dict(contigs)
    hist, links = _map_all(p, p.path("6.fa"))
    est = distance_est.estimate_distances(
        links, hist, min_pairs=p.min_pairs, min_align=p.align_k)
    # distance graph over contigs
    dg = ContigGraph()
    for name, seq in contigs:
        dg.add_contig(name, len(seq))
    for (un, su, vn, sv), e in est.items():
        dg.add_edge(node(dg.id_of(un), su), node(dg.id_of(vn), sv),
                    {"d": e.distance, "n": e.num_pairs,
                     "sd": e.std_dev})
    distance_est.write_dist_dot(
        est, {n: len(s) for n, s in contigs}, p.path("6.dist.dot"), k=p.k)
    chains = pathtools.scaffold_paths(dg, p.min_pairs, p.min_len)
    used = set()
    out_contigs = []
    next_id = max((int(n) for n, _ in contigs if n.isdigit()), default=-1) + 1
    for path in chains:
        seq = pathtools.materialize_path(path, dg, seqs)
        out_contigs.append((str(next_id), seq))
        next_id += 1
        used.update(v >> 1 for v in path)
    for cid in dg.contigs():
        if cid not in used:
            n = dg.names[cid]
            out_contigs.append((n, seqs[n]))
    _write_contigs(out, out_contigs)
    _log(p, f"stage 8: {len(chains)} scaffolds + "
            f"{len(out_contigs) - len(chains)} singletons")
    return out


def stage_sealer(p: PipelineParams) -> str | None:
    """Optional gap sealing of the scaffolds (abyss-sealer,
    bin/abyss-pe:855-861 sealer_ks)."""
    if not p.sealer_ks:
        return None
    out = p.path("8-sealed.fa")
    if not _fresh(p, out):
        return out
    from ..gap import sealer
    scaffolds, _ = _read_contigs(p.path("8.fa"))
    sealed, st = sealer.seal(scaffolds, p.in_files, ks=p.sealer_ks,
                             bloom_bytes=p.bloom_bytes)
    _log(p, f"sealer: closed {st.closed} of {st.gaps} gaps")
    _write_contigs(out, sealed)
    return out


def stage_linked_10(p: PipelineParams) -> str | None:
    """lr=/long= rescaffolding -> name-10.fa (bin/abyss-pe:752-901)."""
    if not p.lr_files and not p.long_files:
        return None
    out = p.path("10.fa")
    if not _fresh(p, out):
        return out
    contigs, _ = _read_contigs(p.path("8.fa"))
    if p.lr_files:
        from ..scaffold.linked_reads import rescaffold_linked
        _log(p, "stage 10: linked-read (tigmint+arcs) rescaffolding")
        scaffolds, st = rescaffold_linked(
            contigs, p.lr_files, align_k=p.align_k,
            min_pairs=p.min_pairs, min_len=p.min_len,
            batch_size=p.batch_size, max_read_len=p.max_read_len)
        _log(p, f"stage 10: {st['molecules']} molecules, {st['cuts']} "
                f"cuts, {st['links']} links, {st['scaffolds']} scaffolds")
    else:
        _log(p, "stage 10: long-read rescaffolding")
        from ..scaffold import paths as pathtools
        hist, links = _map_all_files(p, p.path("8.fa"), p.long_files)
        est = distance_est.estimate_distances(
            links, hist, min_pairs=max(1, p.min_pairs // 2),
            min_align=p.align_k)
        dg = ContigGraph()
        seqs = dict(contigs)
        for name, seq in contigs:
            dg.add_contig(name, len(seq))
        for (un, su, vn, sv), e in est.items():
            dg.add_edge(node(dg.id_of(un), su), node(dg.id_of(vn), sv),
                        {"d": e.distance, "n": e.num_pairs,
                         "sd": e.std_dev})
        chains = pathtools.scaffold_paths(dg, max(1, p.min_pairs // 2),
                                          p.min_len)
        used = set()
        scaffolds = []
        for i, path in enumerate(chains):
            scaffolds.append((f"scaffold{i}",
                              pathtools.materialize_path(path, dg, seqs)))
            used.update(v >> 1 for v in path)
        for cid in dg.contigs():
            if cid not in used:
                n = dg.names[cid]
                scaffolds.append((n, seqs[n]))
    _write_contigs(out, scaffolds)
    return out


def _map_all_files(p: PipelineParams, target_fa: str, files):
    contigs, _ = _read_contigs(target_fa)
    al = mapper.KmerAligner(contigs, k=p.align_k)
    all_alns = []
    for batch in io_read_batches(files, p.batch_size, p.max_read_len,
                                 q=p.q):
        alns = al.align_batch(batch.codes,
                              batch.lengths, batch.ids)
        all_alns.extend(alns)
    return fixmate.fixmate(all_alns)


def stage_stats(p: PipelineParams) -> str:
    out = p.path("stats.tab")
    rows = []
    for suffix, label in [("3.fa", "unitigs"), ("6.fa", "contigs"),
                          ("8.fa", "scaffolds"), ("10.fa", "rescaffolds")]:
        path = p.path(suffix)
        if os.path.exists(path):
            lengths = [len(r.seq) for r in fastx.read_fastx(path)]
            rows.append(contiguity_stats(lengths, min_size=500, name=label))
    with open(out, "w") as f:
        f.write(format_stats_table(rows))
    # .csv and .md variants (abyss-pe stats targets, abyss-tabtomd)
    tab = open(out).read().splitlines()
    with open(p.path("stats.csv"), "w") as f:
        for line in tab:
            f.write(",".join(line.split("\t")) + "\n")
    with open(p.path("stats.md"), "w") as f:
        rows_ = [line.split("\t") for line in tab]
        if rows_:
            widths = [max(len(r[i]) if i < len(r) else 0 for r in rows_)
                      for i in range(len(rows_[0]))]

            def fmt(r):
                return "| " + " | ".join(
                    (r[i] if i < len(r) else "").ljust(widths[i])
                    for i in range(len(widths))) + " |"
            f.write(fmt(rows_[0]) + "\n")
            f.write("|" + "|".join("-" * (w + 2) for w in widths) + "|\n")
            for r in rows_[1:]:
                f.write(fmt(r) + "\n")
    return out


def run(p: PipelineParams) -> dict[str, str]:
    """Run the full pipeline; returns artifact paths."""
    t0 = time.time()
    os.makedirs(p.outdir, exist_ok=True)
    artifacts = {}
    artifacts["unitigs1"] = stage_unitigs_1(p)
    artifacts["unitigs"], _ = stage_graph_2_3(p)
    artifacts["dist"] = stage_dist_5(p)
    artifacts["contigs"] = stage_contigs_6(p)
    artifacts["scaffolds"] = stage_scaffolds_8(p)
    sealed = stage_sealer(p)
    if sealed:
        artifacts["sealed"] = sealed
    ten = stage_linked_10(p)
    if ten:
        artifacts["rescaffolds"] = ten
    artifacts["stats"] = stage_stats(p)
    if p.db_path:
        from ..utils.db import open_db
        with open_db(p.db_path, "abyss-pe") as db:
            for key, path in artifacts.items():
                db.add(key, path)
            db.add("wall_s", round(time.time() - t0, 1))
    _log(p, f"done in {time.time() - t0:.1f}s")
    return artifacts


def main(argv=None):
    """abyss-pe-style CLI: `name=out k=25 in='r1.fq r2.fq'`."""
    argv = argv if argv is not None else sys.argv[1:]
    kv = {}
    want_env = False
    for a in argv:
        if a == "env":  # `abyss-pe env` introspection (bin/abyss-pe:990)
            want_env = True
            continue
        if "=" not in a:
            raise SystemExit(f"expected key=value, got {a!r}")
        k_, v = a.split("=", 1)
        kv[k_] = v
    p = PipelineParams(
        name=kv.get("name", "abyss"),
        k=int(kv.get("k", 25)),
        in_files=kv.get("in", "").split(),
        kc=int(kv.get("kc", 2)),
        q=int(kv.get("q", 3)),
        min_pairs=int(kv.get("n", 10)),
        min_len=int(kv.get("s", 200)),
        outdir=kv.get("outdir", "."),
        # reference abyss-pe passes verbosity as flag text (v=-v / v=-vv,
        # appended to every tool's options, bin/abyss-pe:220); accept that
        # form as well as a plain integer
        verbose=(kv["v"].count("v") if kv.get("v", "").lstrip("-").strip("v")
                 == "" and "v" in kv else int(kv.get("v", 1))),
        engine=kv.get("engine", "bloom"),
        lr_files=kv.get("lr", "").split(),
        long_files=kv.get("long", "").split(),
        K=int(kv.get("K", 0)),
        sealer_ks=[int(x) for x in kv.get("sealer_ks", "").split()],
        db_path=kv.get("db"),
        np_devices=int(kv.get("np", 1)),
        aligner=kv.get("aligner", "map"),
    )
    if "B" in kv:
        size = kv["B"].upper()
        mult = 1
        if size.endswith("G"):
            mult, size = 1 << 30, size[:-1]
        elif size.endswith("M"):
            mult, size = 1 << 20, size[:-1]
        elif size.endswith("K"):
            mult, size = 1 << 10, size[:-1]
        p.bloom_bytes = int(float(size) * mult)
    if want_env:
        import dataclasses
        for f_ in dataclasses.fields(p):
            print(f"{f_.name}={getattr(p, f_.name)}")
        return
    if not p.in_files:
        raise SystemExit("no input files: pass in='reads1.fq reads2.fq'")
    run(p)
    sys.stdout.write(open(p.path("stats.tab")).read())


if __name__ == "__main__":
    main()
