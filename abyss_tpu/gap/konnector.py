"""Konnector: connect read pairs through the Bloom-filter de Bruijn graph.

Reimplements the core of /root/reference/Konnector/konnector.h:235
(`connectPairs`) — a bounded bidirectional search between the two reads
of a fragment through solid k-mers, producing a pseudo-long read — and
the engine behind abyss-sealer's gap closing.

Batched-for-TPU restructuring: the frontier BFS advances *all pairs at
once*; each level's candidate extensions for every active pair are
probed against the counting filter in one fused device gather (the
reference walks one pair per thread, Konnector/konnector.cc).  Path
reconstruction happens on the host from parent links.

Multiple connecting paths are resolved like the reference: up to
`max_paths` paths are collected; equal-length paths are merged by
per-position majority consensus; disagreement beyond `max_mismatches`
fails the pair.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ..core import alphabet
from ..ops import nthash
from ..ops.bloom import CountingBloomFilter


@dataclass
class ConnectResult:
    """Per-pair outcome (cf. ConnectPairsResult, konnector.h)."""
    seq: str | None
    num_paths: int
    reason: str  # CONNECTED / NO_PATH / TOO_MANY_PATHS / MISMATCH / NO_KMER


def _solid_kmer(cbf, codes: np.ndarray, k: int, from_end: bool):
    """Index of the first/last solid k-mer window of a read, or -1.
    Padded device shapes: per-length tracing would compile one program
    per distinct read length."""
    _, _, canon, valid = nthash.kmer_hashes_padded(codes, k)
    solid = np.asarray(cbf.contains(canon, valid))
    idx = np.nonzero(solid)[0]
    if not len(idx):
        return -1
    return int(idx[-1] if from_end else idx[0])


def connect_pairs(cbf: CountingBloomFilter, pairs, k: int,
                  max_gap: int = 800, max_paths: int = 2,
                  max_frontier: int = 64, max_mismatches: int = 2,
                  ) -> list[ConnectResult]:
    """Connect [(seq1, seq2)] read pairs (seq2 in its sequencing
    orientation, i.e. the rc of the fragment's far end).

    Returns one ConnectResult per pair; `seq` is the merged pseudo-read
    (read1 + path interior + rc(read2)) when connected.
    """
    jobs = []
    results: list[ConnectResult | None] = [None] * len(pairs)
    for i, (s1, s2) in enumerate(pairs):
        r2 = alphabet.revcomp(s2)
        c1 = alphabet.encode(s1)
        c2 = alphabet.encode(r2)
        if len(c1) < k or len(c2) < k:
            results[i] = ConnectResult(None, 0, "NO_KMER")
            continue
        start_w = _solid_kmer(cbf, c1, k, from_end=True)
        goal_w = _solid_kmer(cbf, c2, k, from_end=False)
        if start_w < 0 or goal_w < 0:
            results[i] = ConnectResult(None, 0, "NO_KMER")
            continue
        start = c1[start_w:start_w + k]
        goal = c2[goal_w:goal_w + k].tobytes()
        jobs.append(dict(i=i, s1=s1, r2=r2, start=start, goal=goal,
                         start_w=start_w, goal_w=goal_w,
                         # frontier: list of (kmer bytes, parent_id)
                         nodes=[(start.tobytes(), -1)],
                         frontier=[0], paths=[], done=False))

    # batched BFS: all pairs advance one level per iteration
    depth = 0
    while depth < max_gap and any(not j["done"] for j in jobs):
        # gather candidate children of every frontier node of every job
        cand_codes = []
        cand_meta = []  # (job, parent_node_id)
        for j in jobs:
            if j["done"]:
                continue
            for nid in j["frontier"]:
                km = np.frombuffer(j["nodes"][nid][0], np.uint8)
                for c in range(4):
                    cand_codes.append(np.concatenate(
                        [km[1:], np.asarray([c], np.uint8)]))
                    cand_meta.append((j, nid))
        if not cand_codes:
            break
        arr = np.stack(cand_codes)
        N = arr.shape[0]
        pad = 1 << max(N - 1, 1).bit_length()
        padded = np.zeros((pad, arr.shape[1]), np.uint8)
        padded[:N] = arr
        _, _, canon, _ = nthash.kmer_hashes(jnp.asarray(padded), k)
        solid = np.asarray(cbf.contains(canon))[:N]

        # new frontiers
        for j in jobs:
            if not j["done"]:
                j["_next"] = []
        for idx in range(N):
            if not solid[idx]:
                continue
            j, parent = cand_meta[idx]
            key = arr[idx].tobytes()
            nid = len(j["nodes"])
            j["nodes"].append((key, parent))
            if key == j["goal"]:
                j["paths"].append(nid)
                if len(j["paths"]) > max_paths:
                    j["done"] = True
            else:
                j["_next"].append(nid)
        depth += 1
        for j in jobs:
            if j["done"]:
                continue
            nxt = j.get("_next", [])
            if len(nxt) > max_frontier or not nxt:
                j["done"] = True
                j["frontier"] = []
            else:
                j["frontier"] = nxt

    for j in jobs:
        i = j["i"]
        npaths = len(j["paths"])
        if npaths == 0:
            results[i] = ConnectResult(None, 0, "NO_PATH")
            continue
        if npaths > max_paths:
            results[i] = ConnectResult(None, npaths, "TOO_MANY_PATHS")
            continue
        # reconstruct path sequences (bases appended after the start kmer)
        seqs = []
        for leaf in j["paths"]:
            bases = []
            nid = leaf
            while nid != 0:
                key, parent = j["nodes"][nid]
                bases.append(key[-1])
                nid = parent
            seqs.append(bytes(reversed(bases)))
        if len({len(s) for s in seqs}) > 1:
            results[i] = ConnectResult(None, npaths, "MISMATCH")
            continue
        # consensus of equal-length paths
        mat = np.stack([np.frombuffer(s, np.uint8) for s in seqs])
        consensus = []
        mismatches = 0
        for col in mat.T:
            vals, cnts = np.unique(col, return_counts=True)
            if len(vals) > 1:
                mismatches += 1
            consensus.append(int(vals[np.argmax(cnts)]))
        if mismatches > max_mismatches:
            results[i] = ConnectResult(None, npaths, "MISMATCH")
            continue
        path_codes = np.asarray(consensus, np.uint8)
        # merged read: read1 up to its start k-mer, the path (which ends
        # with the goal k-mer), then the rest of rc(read2) past the goal
        s1 = j["s1"]
        r2 = j["r2"]
        head = s1[:j["start_w"] + k]
        mid = alphabet.decode(path_codes)
        tail = r2[j["goal_w"] + k:]
        # the path's last k-1... the goal k-mer's bases are the path tail;
        # mid already excludes the start k-mer and includes goal's last
        # bases one per step
        results[i] = ConnectResult(head + mid + tail, npaths, "CONNECTED")
    return results


def extend_outward(cbf, seqs: list[str], k: int,
                   trim: int | None = None, lookahead_width: int = 16,
                   chunk: int = 1024, max_len: int = 100000) -> list[str]:
    """konnector --extend: extend each connected pseudo-read outward
    through the DBG until a branch or dead end (konnector.cc's
    extendRead / bloom-dbg extendPath both directions)."""
    from ..dbg import extend as ext
    keep = [i for i, s in enumerate(seqs) if s and len(s) >= k]
    if not keep:
        return list(seqs)
    trim = trim if trim is not None else k
    M = len(keep)
    right_seeds = np.zeros((M, k), np.uint8)
    left_seeds = np.zeros((M, k), np.uint8)
    for j, i in enumerate(keep):
        codes = alphabet.encode(seqs[i])
        right_seeds[j] = codes[-k:]
        left_seeds[j] = alphabet.revcomp_codes(codes[:k])
    rbuf, rlen, _ = ext.extend_forward(
        cbf, right_seeds, k, trim, lookahead_width, chunk, max_len)
    lbuf, llen, _ = ext.extend_forward(
        cbf, left_seeds, k, trim, lookahead_width, chunk, max_len)
    out = list(seqs)
    for j, i in enumerate(keep):
        right_ext = alphabet.decode(rbuf[j, k:rlen[j]])
        left_ext = alphabet.decode(
            alphabet.revcomp_codes(lbuf[j, k:llen[j]]))
        out[i] = left_ext + seqs[i] + right_ext
    return out


def merge_or_na(res: ConnectResult) -> str | None:
    return res.seq if res.reason == "CONNECTED" else None
