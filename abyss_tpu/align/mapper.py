"""Read -> contig mapper: batched k-mer seed-and-vote on device.

The TPU-native replacement for the reference's aligners (abyss-map's
FM-index MUM search, Map/map.cc:33-75, and KAligner's k-mer seed hash,
KAligner/Aligner.h:25-50).  An FM-index backward search is a pointer
chase — hostile to a vector machine — so the index here is a *sorted
array of canonical k-mer hashes* over the target contigs: lookups are
`searchsorted` (vectorized binary search), and per-read (contig, strand,
diagonal) votes elect the alignment, replacing seed chaining.

Reads with ties between two different (contig, strand, diagonal) keys
are reported as multimapping (mapq 0), like abyss-map's unique-MUM rule.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core import alphabet
from ..ops import nthash

DUP = 4            # max duplicate index hits examined per seed
DIAG_OFF = 1 << 20  # diagonal offset so keys stay positive


@dataclass
class KmerIndex:
    k: int
    hashes: jax.Array     # uint64[N] sorted canonical hashes
    contig: jax.Array     # int32[N]
    pos: jax.Array        # int32[N]
    is_fwd: jax.Array     # bool[N] canonical == forward hash at that pos
    first_row: jax.Array  # int32[N] first row of each equal-hash run
    names: list
    lengths: list

    CHUNK = 1 << 18  # fixed device shape for index hashing

    @staticmethod
    def build(contigs: list[tuple[str, str]], k: int) -> "KmerIndex":
        """Hash all contigs in FIXED-SHAPE chunks of one concatenated
        code array (separator code 4 invalidates cross-contig windows).

        Hashing each contig separately would trace/compile one program
        per distinct contig LENGTH — thousands of XLA compiles on a
        multi-k-contig assembly (measured: the mapping stage of a
        4.6 Mb run never finished).  Chunked, it is ~20 calls of one
        compiled shape; window -> (contig, offset) mapping is host-side
        numpy over the boundary array.
        """
        C = KmerIndex.CHUNK
        keep = [(n, s) for n, s in contigs if len(s) >= k]
        if keep:
            parts = []
            starts = []  # global start of each contig's bases
            g = 0
            for n, s in keep:
                starts.append(g)
                parts.append(alphabet.encode(s))
                parts.append(np.full(1, 4, np.uint8))  # separator
                g += len(s) + 1
            big = np.concatenate(parts)
            starts = np.asarray(starts, np.int64)
            ends = starts + np.asarray([len(s) for _, s in keep],
                                       np.int64)
            hs_l, gpos_l, isf_l = [], [], []
            step = C - k + 1
            for lo in range(0, len(big), step):
                chunk = big[lo:lo + C]
                if len(chunk) < C:
                    chunk = np.concatenate(
                        [chunk, np.full(C - len(chunk), 4, np.uint8)])
                f, r, canon, valid = nthash.kmer_hashes(
                    jnp.asarray(chunk[None]), k)
                v = np.asarray(valid)[0]
                idx = np.nonzero(v)[0]
                hs_l.append(np.asarray(canon)[0][idx])
                isf_l.append((np.asarray(f)[0] == np.asarray(canon)[0])[idx])
                gpos_l.append(lo + idx)
            hs = np.concatenate(hs_l)
            gpos = np.concatenate(gpos_l)
            isf = np.concatenate(isf_l)
            cid = (np.searchsorted(starts, gpos, "right") - 1).astype(
                np.int32)
            # windows spanning a separator are already invalid, but a
            # window may start past its contig's end (inside a later
            # short gap) — guard:
            ok = gpos + k <= ends[cid]
            hs, gpos, isf, cid = hs[ok], gpos[ok], isf[ok], cid[ok]
            pos = (gpos - starts[cid]).astype(np.int32)
        else:
            hs = np.zeros(0, np.uint64)
            cid = pos = np.zeros(0, np.int32)
            isf = np.zeros(0, bool)
        order = np.argsort(hs, kind="stable")
        hs, cid, pos, isf = hs[order], cid[order], pos[order], isf[order]
        # pad to a power of two: the vote kernel retraces per index
        # LENGTH, and every pipeline stage has a different contig count
        # — unpadded, each stage pays a full remote XLA compile.
        # Sentinel 0xFF..F sorts last and never equals a real hash.
        P = max(1 << max(len(hs) - 1, 1).bit_length(), 1024)
        padn = P - len(hs)
        hs = np.concatenate(
            [hs, np.full(padn, np.uint64(0xFFFFFFFFFFFFFFFF))])
        cid = np.concatenate([cid, np.zeros(padn, np.int32)])
        pos = np.concatenate([pos, np.zeros(padn, np.int32)])
        isf = np.concatenate([isf, np.zeros(padn, bool)])
        # first row of each equal-hash run: the DUP probe window starts
        # there (duplicate k-mers = repeats; probing them all is how
        # multimapping ties are detected)
        rows = np.arange(len(hs), dtype=np.int32)
        runstart = np.concatenate([[True], hs[1:] != hs[:-1]])
        first = np.maximum.accumulate(np.where(runstart, rows, 0))
        # cid indexes the >=k subset: report names/lengths of that subset
        return KmerIndex(
            k=k, hashes=jnp.asarray(hs),
            contig=jnp.asarray(cid), pos=jnp.asarray(pos),
            is_fwd=jnp.asarray(isf), first_row=jnp.asarray(first),
            names=[n for n, s in contigs if len(s) >= k],
            lengths=[len(s) for _, s in contigs if len(s) >= k])


@dataclass
class Alignment:
    """One read->contig alignment (the reference's SAMRecord payload)."""
    qname: str
    rname: str
    rev: bool
    pos: int        # 0-based target start of the aligned (seeded) segment
    qstart: int     # read coordinate of first seeded base
    qend: int       # read coordinate past last seeded base
    read_len: int
    score: int      # number of supporting k-mer seeds
    mapq: int
    rlen: int       # target contig length
    # explicit CIGAR for gapped (indel) alignments from seed chaining;
    # None = ungapped (emit derives clips + one M run)
    cigar: str | None = None

    @property
    def target_end(self) -> int:
        return self.pos + (self.qend - self.qstart)


@partial(jax.jit, static_argnums=(2,))
def _vote_kernel(index_arrays, batch, k: int):
    """Per-read best (contig, strand, diagonal) vote.

    Returns per read: best key parts, seed count, runner-up count,
    qstart, qend.
    """
    hashes, contig, pos, is_fwd, first_row = index_arrays
    codes, = batch
    f, r, canon, valid = nthash.kmer_hashes(codes, k)
    read_fwd = f == canon
    B, W = canon.shape
    N = hashes.shape[0]

    # DUP axis LEADS: a [B, W, DUP] layout tile-pads the 4-wide minor
    # dimension to 128 lanes (32x HBM blowup — OOM at 8K-read batches);
    # [DUP, B, W] pads only W -> 128.
    # first matching index row via the sort-merge join — searchsorted's
    # log2(N) random-gather passes measured 661 ms/batch at 3.7M
    # queries over an 8.4M index vs 117 ms for the join (round 3); a
    # join miss returns -1, whose DUP probes land on rows 0..DUP-2 and
    # fail the equality test below exactly like searchsorted's
    # insertion point did
    from ..ops.sort_join import join_rows
    hit_row = join_rows(hashes, canon.reshape(-1))
    # remap to the run's FIRST row (the join returns an arbitrary row
    # of an equal-hash run; DUP probing needs the leftmost)
    base = jnp.where(hit_row >= 0,
                     first_row[jnp.clip(hit_row, 0)],
                     -1).reshape(B, W)
    cand = base[None] + jnp.arange(DUP)[:, None, None]
    cand = jnp.minimum(cand, max(N - 1, 0))
    hit = (hashes[cand] == canon[None]) & valid[None] & (N > 0)

    c_contig = contig[cand]
    c_pos = pos[cand]
    c_fwd = is_fwd[cand]
    w = jnp.arange(W, dtype=jnp.int32)[None, None, :]
    strand = (c_fwd != read_fwd[None]).astype(jnp.int64)
    diag = jnp.where(strand == 0, c_pos - w, c_pos + w)
    key = (((c_contig.astype(jnp.int64) << 1) | strand) << 22) \
        + diag + DIAG_OFF
    key = jnp.where(hit, key, jnp.int64(-1))

    # vote: sort keys per read, run-length encode, take the mode
    flat = jnp.sort(key.transpose(1, 0, 2).reshape(B, W * DUP),
                    axis=1, stable=False)
    M = W * DUP
    start = jnp.concatenate(
        [jnp.ones((B, 1), bool), flat[:, 1:] != flat[:, :-1]], axis=1)
    posm = jnp.arange(M)
    run_start = jax.lax.associative_scan(
        jnp.maximum, jnp.where(start, posm[None, :], -1), axis=1)
    # count per element's run via segment trick per row
    ends = jnp.concatenate(
        [run_start[:, 1:] != run_start[:, :-1],
         jnp.ones((B, 1), bool)], axis=1)
    idxm = jnp.broadcast_to(posm[None, :], (B, M))
    run_len = jnp.where(ends, idxm - run_start + 1, 0)
    run_len = jnp.where(flat >= 0, run_len, 0)
    best_i = jnp.argmax(run_len, axis=1)
    best_count = jnp.take_along_axis(run_len, best_i[:, None], axis=1)[:, 0]
    best_key = jnp.take_along_axis(flat, best_i[:, None], axis=1)[:, 0]
    # runner-up: best among runs with a different key (its key + span
    # feed the indel seed-chaining in align_batch)
    run_len2 = jnp.where(flat == best_key[:, None], 0, run_len)
    second_i = jnp.argmax(run_len2, axis=1)
    second_count = jnp.take_along_axis(
        run_len2, second_i[:, None], axis=1)[:, 0]
    second_key = jnp.take_along_axis(flat, second_i[:, None],
                                     axis=1)[:, 0]

    # seed spans in read coordinates for both keys ([DUP, B, W])
    wb = jnp.broadcast_to(w, key.shape)
    is_best = (key == best_key[None, :, None]) & hit
    qstart = jnp.min(jnp.where(is_best, wb, W), axis=(0, 2))
    qend = jnp.max(jnp.where(is_best, wb, -1), axis=(0, 2)) + k
    is_2nd = (key == second_key[None, :, None]) & hit
    qstart2 = jnp.min(jnp.where(is_2nd, wb, W), axis=(0, 2))
    qend2 = jnp.max(jnp.where(is_2nd, wb, -1), axis=(0, 2)) + k

    return (best_key, best_count, second_count, qstart, qend,
            second_key, qstart2, qend2)


MAX_CHAIN_INDEL = 64  # largest indel the two-diagonal chain bridges


def _chain_blocks(strand, diag1, qs1, qe1, diag2, qs2, qe2, k,
                  read_len):
    """Chain two seed blocks on parallel diagonals into one gapped
    alignment.  Returns (tstart, qstart, qend, cigar) or None when the
    blocks do not chain cleanly (overlapping or out of order)."""
    # order blocks by read coordinate
    if qs2 < qs1:
        (diag1, qs1, qe1), (diag2, qs2, qe2) = \
            (diag2, qs2, qe2), (diag1, qs1, qe1)
    if qs2 < qe1:
        # seed spans may overlap by up to a seed width at the indel
        # boundary (a chimeric window voting with either block); clip
        # the first block.  Bigger overlaps are genuinely ambiguous.
        if qe1 - qs2 > k or qs2 <= qs1:
            return None
        qe1 = qs2
    if strand == 0:
        t1, t2 = diag1 + qs1, diag2 + qs2
        tend1 = t1 + (qe1 - qs1)
        tgap = t2 - tend1
        b1, b2 = qe1 - qs1, qe2 - qs2
        lead, tail = qs1, read_len - qe2
    else:
        # reverse strand: later read coords map to earlier contig
        # coords; the contig-leftmost block is the read-rightmost
        t2 = diag2 - (qe2 - k)
        t1 = diag1 - (qe1 - k)
        tend2 = t2 + (qe2 - qs2)
        tgap = t1 - tend2
        b1, b2 = qe2 - qs2, qe1 - qs1
        lead, tail = read_len - qe2, qs1
        t1 = t2  # alignment starts at the contig-leftmost block
    qgap = qs2 - qe1
    if tgap < 0:
        return None
    cigar = []
    if lead:
        cigar.append(f"{lead}S")
    cigar.append(f"{b1}M")
    if qgap:
        cigar.append(f"{qgap}I")
    if tgap:
        cigar.append(f"{tgap}D")
    cigar.append(f"{b2}M")
    if tail:
        cigar.append(f"{tail}S")
    return t1, qs1, qe2, "".join(cigar)


class KmerAligner:
    """Batched aligner over a KmerIndex (the abyss-map / KAligner role)."""

    def __init__(self, contigs: list[tuple[str, str]], k: int = 32,
                 min_seeds: int = 2):
        self.index = KmerIndex.build(contigs, k)
        self.k = k
        self.min_seeds = min_seeds

    def align_batch(self, codes: np.ndarray, lengths: np.ndarray,
                    ids: list[str]) -> list[Alignment | None]:
        """Align a padded [B, L] read batch; one best alignment per read
        (None if unmapped/ambiguous).

        Pass the FULL fixed-shape batch (padding rows included) — only
        the first len(ids) results are returned.  Slicing to num_reads
        would retrace the kernel per distinct batch fill.
        """
        idx_arrays = (self.index.hashes, self.index.contig, self.index.pos,
                      self.index.is_fwd, self.index.first_row)
        from ..dbg.hash_dbg import _trim_pad_columns
        codes = _trim_pad_columns(np.asarray(codes), self.k)
        (best_key, count, second, qstart, qend, second_key, qstart2,
         qend2) = jax.device_get(
            _vote_kernel(idx_arrays, (jnp.asarray(codes),), self.k))
        out = []
        for i, qname in enumerate(ids):
            if count[i] < self.min_seeds or best_key[i] < 0:
                out.append(None)
                continue
            key = int(best_key[i])
            diag = (key & ((1 << 22) - 1)) - DIAG_OFF
            strand = (key >> 22) & 1
            cidx = key >> 23
            qs, qe = int(qstart[i]), int(qend[i])

            # seed chaining across a nearby parallel diagonal of the
            # SAME contig+strand: an indel in the read splits its seeds
            # over two diagonals; chain them into one gapped alignment
            # with an explicit I/D CIGAR (KAligner chains seeds;
            # round-1 kept only the best diagonal)
            chained = None
            k2 = int(second_key[i])
            if k2 >= 0 and second[i] >= self.min_seeds and \
                    (k2 >> 23) == cidx and ((k2 >> 22) & 1) == strand:
                ddiag = ((k2 & ((1 << 22) - 1)) -
                         (key & ((1 << 22) - 1)))
                if 0 < abs(ddiag) <= MAX_CHAIN_INDEL:
                    qs2, qe2 = int(qstart2[i]), int(qend2[i])
                    chained = _chain_blocks(
                        strand, diag, qs, qe, diag + ddiag, qs2, qe2,
                        self.k, int(lengths[i]))
            if chained is not None:
                tstart, qs, qe, cigar = chained
                score = int(count[i]) + int(second[i])
                mapq = min(60, 20 + 2 * score // 2)
            else:
                cigar = None
                score = int(count[i])
                if strand == 0:
                    tstart = diag + qs
                else:
                    # reverse: read k-mer at w maps to contig pos
                    # diag - w; leftmost contig coord comes from the
                    # *last* seed
                    tstart = diag - (qe - self.k)
                # multimapping rule (abyss-map unique-match analogue):
                # a runner-up location with close support zeroes mapq
                mapq = 0 if second[i] >= 0.9 * count[i] else \
                    min(60, 20 + 2 * (int(count[i]) - int(second[i])))
            out.append(Alignment(
                qname=qname, rname=self.index.names[cidx],
                rev=bool(strand), pos=int(tstart), qstart=qs, qend=qe,
                read_len=int(lengths[i]), score=score, mapq=mapq,
                rlen=self.index.lengths[cidx], cigar=cigar))
        return out
