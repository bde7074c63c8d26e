"""Pipeline driver: the abyss-pe equivalent (reference: bin/abyss-pe).

Runs the reference's stage DAG unitigs -> contigs -> scaffolds -> stats
through filesystem artifacts named like the reference's
(`name-1.fa ... name-8.fa`, `{lib}-3.hist`, `{lib}-3.dist`,
`{lib}-6.dist.dot`, `name-4.path1/2/3`, `name-stats.tab`), with
Make-style resumability: a stage is skipped when its output already
exists (bin/abyss-pe:553-973, .DELETE_ON_ERROR semantics via tmp+rename).

Libraries (bin/abyss-pe:140-160, 189-373): `lib=` names paired-end
libraries (each name a key listing its files), `pe=` selects which of
them drive contig building (default: all of lib), `mp=` names the
mate-pair libraries that drive scaffolding (default: pe).  Per-library
overrides `{lib}_l/_s/_n` tune alignment seed length, DistanceEst seed
length and min pair count (deopt/scaffold_deopt).

Stage map (bloom mode, cf. SURVEY.md §3.1 and bin/abyss-pe:553-749):
  1    abyss-bloom-dbg        reads -> name-1.fa
       AdjList                name-1.fa -> name-1.dot
       abyss-rresolver-short  -> name-1-rr.{fa,dot}       (Bloom mode)
  2    abyss-filtergraph + MergeContigs -> name-2.{fa,dot}
  3    PopBubbles + MergeContigs -> name-3.{fa,dot} = unitigs
  per pe lib: map | fixmate -> {lib}-3.hist; DistanceEst -> {lib}-3.dist
       merged (abyss-todot --dist) -> name-3.dist
  4    Overlap                -> name-4.{fa,dot}
       SimpleGraph            -> name-4.path1
       MergePaths (non-greedy consensus) -> name-4.path2
       PathOverlap --assemble -> name-4.path3
  5    PathConsensus          -> name-5.{path,fa,dot}
  6    MergeContigs           -> name-6.fa = contigs
       PathOverlap --overlap  -> name-6.dot
  per mp lib: map -> {lib}-6.hist; DistanceEst --median -> {lib}-6.dist.dot
  7-8  abyss-scaffold (n,s search) -> name-6.path
       PathConsensus          -> name-7.{path,fa,dot}
       MergeContigs           -> name-8.fa = scaffolds
       PathOverlap --overlap  -> name-8.dot
  10   lr=/long= rescaffolding -> name-10.fa
  stats abyss-fac             -> name-stats.{tab,csv,md}
"""

from __future__ import annotations

import os
import sys
import time
from dataclasses import dataclass, field

import numpy as np

from ..align import distance_est, fixmate, mapper, nw
from ..core.histogram import Histogram, contiguity_stats, format_stats_table
from ..dbg import bloom_dbg
from ..dbg.params import AssemblyParams
from ..graph import adjlist, algorithms, graphio
from ..graph.contig_graph import ContigGraph, node
from ..io import fastx
from ..io import read_batches as io_read_batches
from ..io.formats import read_dist_text, write_dist_text
from ..scaffold import path_algebra as pa
from ..scaffold import path_consensus, path_overlap, scaffolder
from ..scaffold import paths as pathtools


@dataclass
class Library:
    """A named read library with per-library parameters
    (bin/abyss-pe:189-373 `$i_l/$i_s/$i_n`)."""
    name: str
    files: list = field(default_factory=list)
    l: int | None = None   # min alignment / seed length
    s: int | None = None   # DistanceEst / MergePaths seed length
    n: int | None = None   # min pairs


@dataclass
class PipelineParams:
    name: str = "abyss"
    k: int = 25
    G: int = 0   # genome size for NG50 (abyss-fac -G)
    in_files: list = field(default_factory=list)
    # named libraries: lib= / pe= / mp= / se= (bin/abyss-pe:140-160).
    # When empty, a single anonymous library is built from in_files
    # (lib?=$(name), $(lib)?=$(in)).
    libs: dict = field(default_factory=dict)       # name -> Library
    pe_names: list = field(default_factory=list)   # pe ?= lib
    mp_names: list = field(default_factory=list)   # mp ?= pe
    se_files: list = field(default_factory=list)   # single-end, asm only
    # unitig engine: "bloom" = read-seeded extension walks (reference
    # bloom-dbg semantics, any k); "exact" = sorted-table DBG with
    # pointer-doubling assembly (the TPU fast path; k <= 32 packed,
    # k > 32 via the wide ntHash-fingerprint mode)
    engine: str = "bloom"
    bloom_bytes: int = 64 << 20
    kc: int = 2
    # core assembly knobs (bin/abyss-pe:189-373), exact/paired engines:
    # e (erode), E (per-strand erode), t (tip length), c (low-coverage
    # contig mean), b (bubble branch length, BASES like the reference —
    # converted to k-mers for the k-mer-level engine).  None = the
    # reference's automatic defaults (e/E/c from the coverage model,
    # t=k, b=3k)
    e: int | None = None
    E: int | None = None
    t: int | None = None
    c: float | None = None
    b: int | None = None
    num_hashes: int = 4
    q: int = 3
    # graph cleaning
    tip_len: int | None = None      # default 2k
    island_len: int | None = None   # default 2k
    bubble_identity: float = 0.9    # p
    max_branches: int = 4           # a (PathConsensus candidate cap)
    # RResolver before filtergraph; None = auto (Bloom mode only,
    # matching bin/abyss-pe:581-589 `ifdef B` — other engines ln -s)
    rresolve: bool | None = None
    rresolve_threshold: int = 4     # t (RResolver/README.md)
    # distance estimation / paths
    align_k: int = 32               # l default (seed length analogue)
    min_pairs: int = 10             # n
    min_len: int = 200              # s (seed/contig length threshold)
    # scaffolding search ranges (S=, N=, bin/abyss-pe:348-356);
    # None = single-point at (min_pairs, min_len)
    scaffold_s: tuple | None = None   # S=lo-hi
    scaffold_n: tuple | None = None   # N=lo-hi
    outdir: str = "."
    verbose: int = 1
    # reads per device batch: bigger batches amortize per-dispatch
    # latency (the tunnel round trip) and raise sort efficiency
    batch_size: int = 16384
    max_read_len: int = 256
    # colour-space input (bin/abyss-pe:673-697 `ifdef cs`): None = auto
    # from the first input record; True skips PathConsensus, merges
    # paths into name-cs.fa and converts to nucleotides via anchored
    # read consensus (pipeline/cs.py)
    cs: bool | None = None
    cs_orig_files: list = field(default_factory=list)
    # linked reads (lr=, bin/abyss-pe:752-849): tigmint cut + arcs
    lr_files: list = field(default_factory=list)
    # long reads (long=): longseqdist + rescaffold -> name-10.fa
    long_files: list = field(default_factory=list)
    # paired DBG (K=, bin/abyss-pe:556-564).  Reference semantics:
    # when K is set, k= is the SPAN of the k-mer pair and K= the size
    # of a single k-mer (doc/abyss-pe.1) — a reference user's
    # `k=80 K=40` means span 80 of two 40-mers.
    K: int = 0
    # gap sealing after scaffolding (abyss-sealer, sealer_ks)
    sealer_ks: list = field(default_factory=list)
    db_path: str | None = None
    # multi-device stage-1 build (np=, the ABYSS-P analogue); nh= adds
    # an outer DCN "host" axis (np devices per host x nh hosts)
    np_devices: int = 1
    n_hosts: int = 1
    aligner: str = "map"
    # ss=1: strand-specific assembly (bin/abyss-pe:217-218 sets --SS on
    # PopBubbles/FilterGraph/PathOverlap/abyss-scaffold); graph-stage
    # merges use assemble_stranded (ContigGraphAlgorithms.h:250)
    ss: bool = False

    def path(self, suffix: str, lib: str | None = None) -> str:
        base = lib if lib else self.name
        return os.path.join(self.outdir, f"{base}-{suffix}")

    def pe_libs(self) -> list[Library]:
        names = self.pe_names or sorted(self.libs)
        if not names:
            return [Library(self.name, list(self.in_files))]
        return [self.libs[n] for n in names]

    def mp_libs(self) -> list[Library]:
        names = self.mp_names
        if not names:
            return self.pe_libs()
        return [self.libs[n] for n in names]

    def lib_l(self, lib: Library) -> int:
        return lib.l if lib.l is not None else self.align_k

    def lib_s(self, lib: Library) -> int:
        return lib.s if lib.s is not None else self.min_len

    def lib_n(self, lib: Library) -> int:
        return lib.n if lib.n is not None else self.min_pairs

    def assembly_files(self) -> list:
        files = list(self.in_files)
        for lib in self.libs.values():
            for f in lib.files:
                if f not in files:
                    files.append(f)
        for f in self.se_files:
            if f not in files:
                files.append(f)
        return files


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
    fastx.write_fasta(path + ".tmp", recs)
    os.rename(path + ".tmp", path)


def _fresh(p: PipelineParams, out: str) -> bool:
    return not os.path.exists(out)


# -- stage 1: unitig assembly ----------------------------------------------


def stage_unitigs_1(p: PipelineParams) -> str:
    out = p.path("1.fa")
    if not _fresh(p, out):
        return out
    in_files = p.assembly_files()
    if p.K:
        # k = pair span, K = single k-mer size (reference naming);
        # the engine's (k_single, K_span) argument order is the
        # module's own
        if p.k < 2 * p.K:
            raise ValueError(
                f"paired-DBG mode: k ({p.k}) is the k-mer PAIR SPAN and "
                f"must be >= 2*K (K={p.K} is the single k-mer size); "
                f"cf. bin/abyss-pe:556-564")
        _log(p, f"stage 1: paired-DBG assembly (span k={p.k} "
                f"single K={p.K}) -> {out}")
        from ..dbg import paired_dbg
        batches = [b.codes[:b.num_reads] for b in io_read_batches(
            in_files, p.batch_size, p.max_read_len, q=p.q)]
        contigs = paired_dbg.assemble_pairs(batches, p.K, p.k,
                                            kc=p.kc)
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
            in_files, p.batch_size, p.max_read_len, q=p.q))
        import jax
        total_dev = p.np_devices * p.n_hosts
        if total_dev > 1 and len(jax.devices()) >= total_dev:
            from ..parallel import distributed as dist
            mesh = (dist.make_host_mesh(p.n_hosts, p.np_devices)
                    if p.n_hosts > 1 else dist.make_mesh(p.np_devices, 1))
            if (total_dev & (total_dev - 1)) == 0:
                # np= (ABYSS-P): the ENTIRE stage-1 phase machine on
                # the mesh — owner-sharded resident table, routed
                # adjacency/erode/trim, distributed finish.  Wide k
                # keys the shards on ntHash fingerprints with routed
                # hr/text side arrays (round-3: the k<=32 gate lifted)
                from ..parallel import sharded_table as stbl
                _log(p, f"stage 1: mesh-sharded table over "
                        f"{total_dev} devices"
                        + (f" ({p.n_hosts} hosts x {p.np_devices})"
                           if p.n_hosts > 1 else " (np=)"))
                contigs, _ = stbl.assemble_sharded(
                    mesh, list(batches), p.k, kc=p.kc,
                    erode_cov=p.e, erode_strand=p.E,
                    tip_len=p.t, auto_params=True,
                    min_mean_cov=p.c,
                    bubble_len=(p.b - p.k + 1 if p.b is not None
                                else None))
            else:
                # non-pow2 device counts: mesh-parallel load, host
                # merge of the pre-reduced per-device pairs
                _log(p, f"stage 1: mesh k-mer count over "
                        f"{total_dev} devices (np=)")
                batches = list(batches)
                keys, counts = dist.distributed_count_kmers(
                    dist.make_mesh(total_dev, 1), batches, p.k)
                t = hash_dbg.KmerTable(p.k, keys, counts,
                                       np.ones(len(keys), bool))
                # wide side arrays fill AFTER kc + compaction (only
                # solid rows pay for text/hr/checksum)
                contigs = hash_dbg.assemble_table(
                    t, kc=p.kc, erode_cov=p.e, erode_strand=p.E,
                    tip_len=p.t, auto_params=True, min_mean_cov=p.c,
                    bubble_len=(p.b - p.k + 1 if p.b is not None
                                else None),
                    wide_fill_batches=batches if p.k > 32 else None)
        else:
            contigs, _ = hash_dbg.assemble_reads(
                list(batches), p.k, kc=p.kc,
                erode_cov=p.e, erode_strand=p.E, tip_len=p.t,
                auto_params=True, min_mean_cov=p.c,
                bubble_len=(p.b - p.k + 1 if p.b is not None
                                else None))
        with open(out + ".tmp", "w") as f:
            for i, (seq, cov) in enumerate(contigs):
                f.write(f">{i} {len(seq)} {cov}\n{seq}\n")
        os.rename(out + ".tmp", out)
        return out
    if any(v is not None for v in (p.e, p.E, p.c, p.b)):
        _log(p, "warning: e/E/c/b apply to the exact/paired engines "
                "only; the bloom engine uses kc + its tip rules "
                "(BloomDBG has no erode/bubble phases)")
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
            # np >= 4: split the mesh (data x shard) so the filter is
            # SHARDED across devices and pass 2's extension probes ride
            # the mesh (psum'd shard-local lookups) — a filter larger
            # than one device's memory now works end to end
            if p.np_devices >= 4:
                n_data, n_shard = p.np_devices // 2, 2
            else:
                n_data, n_shard = p.np_devices, 1
            _log(p, f"stage 1: mesh filter build over {p.np_devices} "
                    f"devices (np=, {n_data} data x {n_shard} shard"
                    + (", shard-probed pass 2)" if n_shard > 1 else ")"))
            mesh = dist.make_mesh(n_data, n_shard)
            size = 1 << (max(p.bloom_bytes, 2).bit_length() - 1)
            prebuilt = dist.distributed_filter_build(
                mesh, (b.codes for b in io_read_batches(
                    in_files, p.batch_size, p.max_read_len, q=p.q)),
                p.k, num_hashes=p.num_hashes, threshold=p.kc,
                size=size, sharded=n_shard > 1)
            params = AssemblyParams(
                k=p.k, num_hashes=p.num_hashes, min_cov=p.kc,
                bloom_bytes=p.bloom_bytes, q=p.q,
                batch_size=p.batch_size, max_read_len=p.max_read_len,
                verbose=p.verbose, filter_mode="bloom")
        else:
            _log(p, f"np={p.np_devices} requested but only "
                    f"{len(jax.devices())} devices; single-device build")
    with open(out + ".tmp", "w") as f:
        bloom_dbg.assemble(in_files, params, out=f,
                           prebuilt_filter=prebuilt)
    os.rename(out + ".tmp", out)
    return out


# -- stages 1.dot-3: graph cleanup -> unitigs ------------------------------


def stage_graph_2_3(p: PipelineParams) -> tuple[str, str]:
    """AdjList + RResolver + filtergraph(-2) + PopBubbles(-3)."""
    out_fa = p.path("3.fa")
    out_dot = p.path("3.dot")
    if not _fresh(p, out_fa):
        return out_fa, out_dot
    in_files = p.assembly_files()
    contigs, covs = _read_contigs(p.path("1.fa"))
    _log(p, f"stage 2-3: graph cleanup of {len(contigs)} contigs")
    g = adjlist.build_overlap_graph(contigs, p.k, covs)
    graphio.write_dot(g, p.path("1.dot"), k=p.k)
    seqs = dict(contigs)

    run_rr = p.rresolve if p.rresolve is not None \
        else p.engine == "bloom"
    if run_rr:
        # RResolver (abyss-rresolver-short, bin/abyss-pe:581-585):
        # one r per read-size batch + subiterations
        # (RAlgorithmsShort.cpp resolveShort)
        from ..graph import rresolver
        first = next(io_read_batches(in_files, 4096, p.max_read_len,
                                     q=p.q), None)
        if first is not None and first.num_reads:
            lengths = first.lengths[:first.num_reads]
            stats = rresolver.resolve_repeats_multi(
                g, seqs,
                lambda: (b.codes for b in io_read_batches(
                    in_files, p.batch_size, p.max_read_len, q=p.q)),
                lengths, p.k,
                support_threshold=p.rresolve_threshold,
                verbose=max(0, p.verbose - 1))
            _log(p, f"stage 1-rr: cut {stats.edges_cut} unsupported "
                    f"edges at {stats.junctions} junctions")
            graphio.write_dot(g, p.path("1-rr.dot"), k=p.k)
            # the stage artifact the next stage consumes
            # (bin/abyss-pe:581-585 feeds %-1-rr.fa to filtergraph):
            # the live contig set INCLUDING resolved-repeat instance
            # copies rresolver created
            live = [g.names[c] for c in g.contigs()]
            _write_contigs(p.path("1-rr.fa"),
                           [(n, seqs[n]) for n in live])
            if stats.repeats_split:
                _log(p, f"stage 1-rr: split {stats.repeats_split} "
                        "repeat instances")

    # filtergraph: the reference's DEFAULT pass is shim removal only
    # (FilterGraph.cc:758-760; minTipLen/minIslandLen default 0);
    # tips/islands run only when explicitly requested (the xtip knob,
    # bin/abyss-pe:260-262)
    n_shim = len(algorithms.remove_shims(g))
    if n_shim:
        _log(p, f"stage 2: filtergraph removed {n_shim} shim contigs")
    if p.tip_len is not None:
        algorithms.prune_tips(g, p.tip_len)
    if p.island_len is not None:
        algorithms.remove_islands(g, p.island_len)
    g2, seqs2, _ = algorithms.merge_linear_chains(g, seqs, ss=p.ss)
    two_contigs = [(n, seqs2[n]) for n in
                   (g2.names[c] for c in g2.contigs())]
    two_covs = [g2.coverages[c] for c in g2.contigs()]
    _write_contigs(p.path("2.fa"), two_contigs, two_covs)
    graphio.write_dot(g2, p.path("2.dot"), k=p.k)

    # PopBubbles -> -3 (unitigs)
    check = nw.identity_check_factory(seqs2, g2.names, p.bubble_identity)
    popped = algorithms.pop_bubbles(g2, identity_check=check)
    _log(p, f"stage 3: popped {len(popped)} bubbles")
    g3, seqs3, _ = algorithms.merge_linear_chains(g2, seqs2, ss=p.ss)
    out_contigs = [(n, seqs3[n]) for n in
                   (g3.names[c] for c in g3.contigs())]
    out_covs = [g3.coverages[c] for c in g3.contigs()]
    _write_contigs(out_fa, out_contigs, out_covs)
    graphio.write_dot(g3, out_dot, k=p.k)
    return out_fa, out_dot


# -- per-library mapping + distance estimation -----------------------------


def _map_library(p: PipelineParams, target_fa: str, files: list,
                 seed_len: int):
    """Map one library's reads to target contigs; returns (hist, links)
    (the align | fixmate | sort pipe, bin/abyss-pe:620-624)."""
    if p.aligner != "map":
        from ..align import sam as sammod, wrappers
        if wrappers.available(p.aligner):
            _log(p, f"aligner={p.aligner} (external)")
            import io as _io
            buf = _io.StringIO()
            wrappers.align_sam(p.aligner, target_fa, files, buf,
                               seed_len=seed_len)
            alns = [sammod.parse(line)
                    for line in buf.getvalue().splitlines()
                    if line and not line.startswith("@")]
            return fixmate.fixmate(alns)
        _log(p, f"aligner={p.aligner} not found; using the native mapper")
    contigs, _ = _read_contigs(target_fa)
    t0 = time.time()
    al = mapper.KmerAligner(contigs, k=seed_len)
    t_index = time.time() - t0
    all_alns = []
    t0 = time.time()
    for batch in io_read_batches(files, p.batch_size,
                                 p.max_read_len, q=p.q):
        alns = al.align_batch(batch.codes, batch.lengths, batch.ids)
        all_alns.extend(alns)
    t_align = time.time() - t0
    t0 = time.time()
    out = fixmate.fixmate(all_alns)
    if p.verbose >= 2:
        _log(p, f"[wall] map: index {t_index:.1f}s align {t_align:.1f}s "
                f"fixmate {time.time() - t0:.1f}s "
                f"({len(all_alns)} reads)")
    return out


def stage_dist_5(p: PipelineParams) -> str:
    """Per-pe-library map + fixmate + DistanceEst -> {lib}-3.dist,
    merged into name-3.dist (bin/abyss-pe:620-655)."""
    out = p.path("3.dist")
    if not _fresh(p, out):
        return out
    contigs, _ = _read_contigs(p.path("3.fa"))
    merged: dict = {}
    for lib in p.pe_libs():
        _log(p, f"stage 4-5: mapping library {lib.name} "
                f"({len(lib.files)} files)")
        hist, links = _map_library(p, p.path("3.fa"), lib.files,
                                   p.lib_l(lib))
        with open(p.path("3.hist", lib.name), "w") as f:
            f.write(hist.to_text())
        if hist.size() == 0:
            # no proper pairs mapped (e.g. single-end-only input):
            # DistanceEst has no fragment PMF to fit — skip the library
            # (the reference's pipe would emit an empty .dist the same
            # way since ParseAligns finds no FR pairs)
            _log(p, f"stage 4-5: library {lib.name} produced no "
                    f"fragment histogram; skipping DistanceEst")
            continue
        t0 = time.time()
        est = distance_est.estimate_distances(
            links, hist, min_pairs=p.lib_n(lib),
            min_align=p.lib_l(lib))
        if p.verbose >= 2:
            _log(p, f"[wall] DistanceEst: {time.time() - t0:.1f}s "
                    f"({len(links)} linked pairs)")
        lib_dist = p.path("3.dist", lib.name)
        with open(lib_dist + ".tmp", "w") as f:
            write_dist_text(est, f)
        os.rename(lib_dist + ".tmp", lib_dist)
        # merge libraries, keeping the better-supported estimate
        # (abyss-todot --dist -e, bin/abyss-pe:648-650)
        for key, e in est.items():
            if key not in merged or e.num_pairs > merged[key].num_pairs:
                merged[key] = e
    with open(out + ".tmp", "w") as f:
        write_dist_text(merged, f)
    os.rename(out + ".tmp", out)
    # the .dist.dot view for tools that want the dot form
    distance_est.write_dist_dot(
        merged, {n: len(s) for n, s in contigs},
        p.path("3.dist.dot"), k=p.k)
    return out


# -- stages 4-6: Overlap -> paths -> consensus -> contigs ------------------


def stage_contigs_6(p: PipelineParams) -> str:
    out = p.path("6.fa")
    if not _fresh(p, out):
        return out
    contigs, covs = _read_contigs(p.path("3.fa"))
    seqs = dict(contigs)
    g = adjlist.build_overlap_graph(contigs, p.k, covs)
    estimates = {key: distance_est.DistanceEstimate(d, n, sd)
                 for key, (d, n, sd)
                 in read_dist_text(p.path("3.dist")).items()}

    # Overlap (bin/abyss-pe:658-659, Overlap/Overlap.cpp): add edges
    # for blunt contigs whose negative distance estimates verify
    from ..graph.overlap_tool import overlap_stage
    added, gap_contigs = overlap_stage(g, seqs, estimates, k=p.k)
    _log(p, f"stage 4: Overlap added {added} overlap edges + "
            f"{len(gap_contigs)} gap contigs")
    graphio.write_dot(g, p.path("4.dot"), k=p.k)
    # -4.fa holds the gap contigs Overlap created (Overlap.cpp:546-580)
    _write_contigs(p.path("4.fa"),
                   [(nm, sq) for nm, sq, *_ in gap_contigs])

    # SimpleGraph -> -4.path1 (per-seed constrained search)
    names_index = {n: g.id_of(n) for n, _ in contigs}
    seed_paths = pathtools.simple_graph_seed_paths(
        g, estimates, names_index, k=p.k)
    _log(p, f"stage 4: SimpleGraph found {len(seed_paths)} seed paths")
    pathtools.write_paths(
        [pth for _, pth in sorted(seed_paths.items())], g,
        p.path("4.path1"),
        [g.name(u) for u in sorted(seed_paths)])

    # MergePaths (non-greedy pivot consensus) -> -4.path2
    # combine each contig's two oriented seed paths into one
    by_cid: dict[int, list[int]] = {}
    for u in sorted(seed_paths):
        cid = u >> 1
        pth = seed_paths[u] if (u & 1) == 0 else pa.path_rc(seed_paths[u])
        if cid not in by_cid:
            by_cid[cid] = pth
        else:
            got, d = pa.align_pair(
                [max(1, ln - p.k + 1) for ln in g.lengths],
                by_cid[cid], pth, node(cid, 0))
            if d != pa.DIR_X:
                by_cid[cid] = got
    lengths_kmer = [max(1, ln - p.k + 1) for ln in g.lengths]
    # ignore seeds shorter than the seed-length threshold; their
    # contigs can still appear inside other seeds' paths
    # (MergePaths.cpp readPaths, opt::seedLen = s)
    by_cid = {c: pth for c, pth in by_cid.items()
              if g.lengths[c] >= p.min_len}
    merged = pa.merge_paths(lengths_kmer, by_cid, greedy=False,
                            verbose=p.verbose)
    pathtools.write_paths(merged, g, p.path("4.path2"), start_id=0)
    _log(p, f"stage 4: MergePaths {len(by_cid)} seed paths -> "
            f"{len(merged)} merged")

    # PathOverlap --assemble -> -4.path3
    assembled = path_overlap.assemble_overlapping_paths(merged, ss=p.ss)
    pathtools.write_paths(assembled, g, p.path("4.path3"), start_id=0)

    if p.cs:
        # colour-space branch (bin/abyss-pe:673-697 `ifdef cs`):
        # PathConsensus is skipped (-5 symlinks -4), paths merge to
        # name-cs.fa, then KAligner|Consensus produce nucleotides
        from . import cs as cs_mod
        next_id = max((int(n) for n in g.names if n.isdigit()),
                      default=-1) + 1
        used = set()
        cs_contigs, cs_covs = [], []
        for pth in assembled:
            seq = pathtools.materialize_path(pth, g, seqs, k=p.k)
            cov = sum(g.coverages[v >> 1] for v in pth
                      if not pa.is_amb(v))
            cs_contigs.append((str(next_id), seq))
            cs_covs.append(cov)
            next_id += 1
            used.update(v >> 1 for v in pth if not pa.is_amb(v))
        for cid in g.contigs():
            if cid not in used:
                n = g.names[cid]
                cs_contigs.append((n, seqs[n]))
                cs_covs.append(g.coverages[cid])
        cs_fa = p.path("cs.fa")
        _write_contigs(cs_fa, cs_contigs, cs_covs)
        graphio.write_dot(g, p.path("5.dot"), k=p.k)
        return cs_mod.finish_nt(p, cs_fa)

    # PathConsensus -> -5.{path,fa,dot} (resolve ambiguous N entries)
    res = path_consensus.resolve_paths(
        g, seqs, assembled, p.k, identity=p.bubble_identity,
        num_branches=p.max_branches)
    st = res.stats
    if st.num_amb:
        _log(p, f"stage 5: PathConsensus resolved {st.merged} of "
                f"{st.num_amb} ambiguous gaps "
                f"({st.no_paths} no-path, {st.too_many} too-many, "
                f"{st.dissimilar} dissimilar)")
    _write_contigs(p.path("5.fa"),
                   [(n, s) for n, s, _ in res.new_contigs],
                   [c for _, _, c in res.new_contigs])
    graphio.write_dot(g, p.path("5.dot"), k=p.k)
    next_id = max((int(n) for n in g.names if n.isdigit()),
                  default=-1) + 1
    pathtools.write_paths(res.paths, g, p.path("5.path"),
                          start_id=next_id)

    # MergeContigs -> -6.fa = contigs
    used = set()
    out_contigs = []
    out_covs = []
    for pth in res.paths:
        seq = pathtools.materialize_path(pth, g, seqs, k=p.k)
        cov = sum(g.coverages[v >> 1] for v in pth if not pa.is_amb(v))
        out_contigs.append((str(next_id), seq))
        out_covs.append(cov)
        next_id += 1
        used.update(v >> 1 for v in pth if not pa.is_amb(v))
    for cid in g.contigs():
        if cid not in used:
            n = g.names[cid]
            out_contigs.append((n, seqs[n]))
            out_covs.append(g.coverages[cid])
    _write_contigs(out, out_contigs, out_covs)

    # PathOverlap --overlap -> -6.dot (next-stage graph)
    g6 = path_overlap.path_graph(
        g, res.paths,
        [n for n, _ in out_contigs[:len(res.paths)]], seqs=seqs, k=p.k)
    graphio.write_dot(g6, p.path("6.dot"), k=p.k)
    return out


# -- stages 7-8: mate-pair scaffolding -------------------------------------


def stage_scaffolds_8(p: PipelineParams) -> str:
    out = p.path("8.fa")
    if not _fresh(p, out):
        return out
    contigs, covs = _read_contigs(p.path("6.fa"))
    seqs = dict(contigs)

    # per-mp-library mapping + DistanceEst --median (abyss-pe:710-734,
    # scaffold_deopt)
    merged: dict = {}
    for lib in p.mp_libs():
        _log(p, f"stage 7: mapping mp library {lib.name}")
        hist, links = _map_library(p, p.path("6.fa"), lib.files,
                                   p.lib_l(lib))
        with open(p.path("6.hist", lib.name), "w") as f:
            f.write(hist.to_text())
        est = distance_est.estimate_distances(
            links, hist, min_pairs=p.lib_n(lib),
            min_align=p.lib_l(lib), mode="median")
        distance_est.write_dist_dot(
            est, {n: len(s) for n, s in contigs},
            p.path("6.dist.dot", lib.name), k=p.k)
        for key, e in est.items():
            if key not in merged or e.num_pairs > merged[key].num_pairs:
                merged[key] = e
    distance_est.write_dist_dot(
        merged, {n: len(s) for n, s in contigs},
        p.path("6.dist.dot"), k=p.k)

    # distance graph over contigs
    dg = ContigGraph()
    for name, seq in contigs:
        dg.add_contig(name, len(seq))
    for (un, su, vn, sv), e in merged.items():
        dg.add_edge(node(dg.id_of(un), su), node(dg.id_of(vn), sv),
                    {"d": e.distance, "n": e.num_pairs,
                     "sd": e.std_dev})

    # abyss-scaffold with (n,s) search -> -6.path (scaffold.cc)
    n_range = p.scaffold_n or (p.min_pairs, p.min_pairs)
    s_range = p.scaffold_s or (p.min_len, p.min_len)
    result = scaffolder.search_scaffold_params(
        dg, n_range, s_range, k=p.k, verbose=max(0, p.verbose - 1),
        ss=p.ss)
    _log(p, f"stage 8: scaffold n={result.n} s={result.s} "
            f"N50={result.n50} ({len(result.paths)} scaffolds)")
    pathtools.write_paths(result.paths, dg, p.path("6.path"), start_id=0)

    # PathConsensus over the scaffold gaps -> -7 (abyss-pe:738-741);
    # use the CONTIG adjacency graph for gap search, the distance graph
    # has no walkable sequence edges
    g6, _ = graphio.read_dot(p.path("6.dot"))
    # translate scaffold paths into g6's vertex ids (same names)
    remap = []
    for pth in result.paths:
        q = []
        ok = True
        for e in pth:
            if pa.is_amb(e):
                q.append(e)
                continue
            nm = dg.names[e >> 1]
            if nm not in g6._index:
                ok = False
                break
            q.append(node(g6.id_of(nm), e & 1))
        if ok:
            remap.append(q)
    res = path_consensus.resolve_paths(
        g6, seqs, remap, p.k, identity=p.bubble_identity,
        num_branches=p.max_branches)
    st = res.stats
    if st.num_amb:
        _log(p, f"stage 7: PathConsensus closed {st.merged} of "
                f"{st.num_amb} scaffold gaps")
    _write_contigs(p.path("7.fa"),
                   [(n, s) for n, s, _ in res.new_contigs],
                   [c for _, _, c in res.new_contigs])
    graphio.write_dot(g6, p.path("7.dot"), k=p.k)
    next_id = max((int(n) for n in g6.names if n.isdigit()),
                  default=-1) + 1
    pathtools.write_paths(res.paths, g6, p.path("7.path"),
                          start_id=next_id)

    # MergeContigs -> -8.fa = scaffolds
    used = set()
    out_contigs = []
    for pth in res.paths:
        seq = pathtools.materialize_path(pth, g6, seqs, k=p.k)
        out_contigs.append((str(next_id), seq))
        next_id += 1
        used.update(v >> 1 for v in pth if not pa.is_amb(v))
    n_scaffolds = len(out_contigs)
    for cid in g6.contigs():
        if cid not in used:
            n = g6.names[cid]
            if n in seqs:
                out_contigs.append((n, seqs[n]))
    _write_contigs(out, out_contigs)
    # PathOverlap --overlap -> -8.dot
    g8 = path_overlap.path_graph(
        g6, res.paths, [n for n, _ in out_contigs[:n_scaffolds]],
        seqs=seqs, k=p.k)
    graphio.write_dot(g8, p.path("8.dot"), k=p.k)
    _log(p, f"stage 8: {n_scaffolds} scaffolds + "
            f"{len(out_contigs) - n_scaffolds} singletons")
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
    sealed, st = sealer.seal(scaffolds, p.assembly_files(),
                             ks=p.sealer_ks, bloom_bytes=p.bloom_bytes)
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
        hist, links = _map_library(p, p.path("8.fa"), p.long_files,
                                   p.align_k)
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
        r = scaffolder.build_scaffold_paths(
            dg, max(1, p.min_pairs // 2), p.min_len, k=p.k, ss=p.ss)
        used = set()
        scaffolds = []
        for i, pth in enumerate(r.paths):
            scaffolds.append((f"scaffold{i}", pathtools.materialize_path(
                pth, dg, seqs, k=p.k)))
            used.update(v >> 1 for v in pth if not pa.is_amb(v))
        for cid in dg.contigs():
            if cid not in used:
                n = dg.names[cid]
                scaffolds.append((n, seqs[n]))
    _write_contigs(out, scaffolds)
    return out


def stage_stats(p: PipelineParams) -> str:
    out = p.path("stats.tab")
    # friendly alias artifacts (bin/abyss-pe %-unitigs.fa etc. symlinks)
    for suffix, alias in [("3.fa", "unitigs.fa"), ("3.dot", "unitigs.dot"),
                          ("6.fa", "contigs.fa"), ("6.dot", "contigs.dot"),
                          ("8.fa", "scaffolds.fa"),
                          ("8.dot", "scaffolds.dot")]:
        src, dst = p.path(suffix), p.path(alias)
        if os.path.exists(src):
            if os.path.lexists(dst):
                os.remove(dst)
            os.symlink(os.path.basename(src), dst)
    rows = []
    for suffix, label in [("3.fa", "unitigs"), ("6.fa", "contigs"),
                          ("8.fa", "scaffolds"), ("10.fa", "rescaffolds")]:
        path = p.path(suffix)
        if os.path.exists(path):
            lengths = [len(r.seq) for r in fastx.read_fastx(path)]
            rows.append(contiguity_stats(lengths, min_size=500,
                                         exp_size=p.G, name=label))
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

    def timed(label, fn, *a):
        ts = time.time()
        r = fn(*a)
        _log(p, f"[wall] {label}: {time.time() - ts:.1f}s")
        return r

    from . import cs as cs_mod
    if p.cs is None:
        p.cs = bool(p.in_files) and cs_mod.detect(p.in_files)
    if p.cs and not p.cs_orig_files:
        _log(p, "colour-space input: letter-encoding colours "
                "(bin/abyss-pe:673-697 cs flow)")
        cs_mod.prepare(p)

    artifacts["unitigs1"] = timed("stage 1 (unitigs)", stage_unitigs_1, p)
    artifacts["unitigs"], _ = timed("stage 2-3 (graph)", stage_graph_2_3, p)
    artifacts["dist"] = timed("stage 4-5 (map+dist)", stage_dist_5, p)
    artifacts["contigs"] = timed("stage 6 (contigs)", stage_contigs_6, p)
    if p.cs:
        # the cs flow ends at nucleotide contigs (-6.fa); mate-pair
        # scaffolding over nt contigs would need nt mate maps the cs
        # libraries cannot provide directly
        artifacts["stats"] = stage_stats(p)
        _log(p, f"done in {time.time() - t0:.1f}s")
        return artifacts
    artifacts["scaffolds"] = timed("stage 7-8 (scaffolds)",
                                   stage_scaffolds_8, p)
    sealed = timed("sealer", stage_sealer, p)
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


def _parse_range(text: str) -> tuple:
    if "-" in text:
        lo, hi = text.split("-", 1)
        return (int(lo), int(hi))
    return (int(text), int(text))


def parse_params(argv) -> PipelineParams:
    """Parse abyss-pe-style key=value arguments into PipelineParams
    (bin/abyss-pe:189-373 parameter schema)."""
    p, _ = _parse_argv(argv)
    return p


def main(argv=None):
    """abyss-pe-style CLI: `name=out k=25 in='r1.fq r2.fq'` or with
    libraries: `lib='pea' pea='pea_1.fq pea_2.fq' mp='mpc'
    mpc='mpc_1.fq mpc_2.fq' pea_l=50`."""
    argv = argv if argv is not None else sys.argv[1:]
    p, want_env = _parse_argv(argv)
    if want_env:
        import dataclasses
        for f_ in dataclasses.fields(p):
            print(f"{f_.name}={getattr(p, f_.name)}")
        return
    if not p.in_files and not p.libs:
        raise SystemExit("no input files: pass in='reads1.fq reads2.fq' "
                         "or lib=/pe=/mp= libraries")
    run(p)
    sys.stdout.write(open(p.path("stats.tab")).read())


def _parse_argv(argv):
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
    # named libraries (bin/abyss-pe:140-160)
    lib_names = kv.get("lib", "").split()
    pe_names = kv.get("pe", "").split() or lib_names
    mp_names = kv.get("mp", "").split() or pe_names
    libs = {}
    for nm in dict.fromkeys(lib_names + pe_names + mp_names):
        if nm not in kv:
            raise SystemExit(f"library {nm!r} has no file list "
                             f"(pass {nm}='file1 file2')")
        libs[nm] = Library(
            name=nm, files=kv[nm].split(),
            l=int(kv[nm + "_l"]) if nm + "_l" in kv else None,
            s=int(kv[nm + "_s"]) if nm + "_s" in kv else None,
            n=int(kv[nm + "_n"]) if nm + "_n" in kv else None)
    p = PipelineParams(
        name=kv.get("name", "abyss"),
        k=int(kv.get("k", 25)),
        in_files=kv.get("in", "").split(),
        libs=libs,
        pe_names=pe_names if libs else [],
        mp_names=mp_names if libs else [],
        se_files=kv.get("se", "").split(),
        kc=int(kv.get("kc", 2)),
        q=int(kv.get("q", 3)),
        min_pairs=int(kv.get("n", 10)),
        min_len=int(kv.get("s", 200)),
        outdir=kv.get("outdir", "."),
        verbose=(kv["v"].count("v") if kv.get("v", "").lstrip("-").strip("v")
                 == "" and "v" in kv else int(kv.get("v", 1))),
        engine=kv.get("engine", "bloom"),
        lr_files=kv.get("lr", "").split(),
        long_files=kv.get("long", "").split(),
        K=int(kv.get("K", 0)),
        sealer_ks=[int(x) for x in kv.get("sealer_ks", "").split()],
        db_path=kv.get("db"),
        np_devices=int(kv.get("np", 1)),
        n_hosts=int(kv.get("nh", 1)),
        aligner=kv.get("aligner", "map"),
        G=int(float(kv.get("G", 0))),
    )
    if "ss" in kv:
        p.ss = bool(int(kv["ss"]))
    if "l" in kv:
        p.align_k = int(kv["l"])
    if "e" in kv:
        p.e = int(kv["e"])
    if "E" in kv:
        p.E = int(kv["E"])
    if "t" in kv:
        p.t = int(kv["t"])
    if "c" in kv:
        p.c = float(kv["c"])
    if "b" in kv:
        p.b = int(kv["b"])
    if "S" in kv:
        p.scaffold_s = _parse_range(kv["S"])
    if "N" in kv:
        p.scaffold_n = _parse_range(kv["N"])
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
    return p, want_env


if __name__ == "__main__":
    main()
