"""Checkpoint/resume for Bloom-mode assembly.

Reimplements BloomDBG/Checkpoint.h:14-270 + bloom-dbg.cc:238-294: every
N reads, atomically (tmp + rename) persist the counting filter, the
visited filter, progress counters, and the partial contig FASTA; on
restart, detect a valid checkpoint and resume, skipping already
processed reads.
"""

from __future__ import annotations

import dataclasses
import json
import os

import numpy as np

from ..ops import bloom as bloom_ops


FILES = ("counting.npy", "visited.npy", "state.json", "contigs.fa")


def _tmp(path: str) -> str:
    return path + ".tmp"


def save(ckpt_dir: str, cbf, visited: bloom_ops.BitBloomFilter,
         reads_processed: int, counters: dict,
         partial_contigs_path: str | None = None):
    """Atomically write a checkpoint (Checkpoint::create semantics).

    Handles both solid-k-mer structures: the counting Bloom filter and
    the sorted-table filter (saved as stacked kmers/counts)."""
    from ..ops.sorted_filter import SortedKmerFilter
    os.makedirs(ckpt_dir, exist_ok=True)
    sorted_mode = isinstance(cbf, SortedKmerFilter)
    if sorted_mode:
        np.save(_tmp(os.path.join(ckpt_dir, "counting.npy")),
                np.stack([np.asarray(cbf.kmers),
                          np.asarray(cbf.counts).astype(np.uint64)]))
    else:
        np.save(_tmp(os.path.join(ckpt_dir, "counting.npy")),
                np.asarray(cbf.counters))
    np.save(_tmp(os.path.join(ckpt_dir, "visited.npy")),
            np.asarray(visited.bits))
    state = dict(reads_processed=reads_processed, counters=counters,
                 k=cbf.k, num_hashes=cbf.num_hashes,
                 threshold=cbf.threshold, sorted_mode=sorted_mode)
    with open(_tmp(os.path.join(ckpt_dir, "state.json")), "w") as f:
        json.dump(state, f)
    contigs_dst = os.path.join(ckpt_dir, "contigs.fa")
    if partial_contigs_path and os.path.exists(partial_contigs_path):
        import shutil
        shutil.copy(partial_contigs_path, _tmp(contigs_dst))
    else:
        open(_tmp(contigs_dst), "a").close()
    # atomic publish: rename all tmp files (npy adds .npy to tmp names)
    for name in ("counting.npy", "visited.npy"):
        os.replace(os.path.join(ckpt_dir, name + ".tmp.npy"),
                   os.path.join(ckpt_dir, name))
    for name in ("state.json", "contigs.fa"):
        os.replace(_tmp(os.path.join(ckpt_dir, name)),
                   os.path.join(ckpt_dir, name))


def exists(ckpt_dir: str) -> bool:
    return all(os.path.exists(os.path.join(ckpt_dir, f)) for f in FILES)


def load(ckpt_dir: str):
    """Returns (cbf, visited, reads_processed, counters)."""
    import jax.numpy as jnp
    with open(os.path.join(ckpt_dir, "state.json")) as f:
        state = json.load(f)
    counting = np.load(os.path.join(ckpt_dir, "counting.npy"))
    visited = np.load(os.path.join(ckpt_dir, "visited.npy"))
    if state.get("sorted_mode"):
        from ..ops.sorted_filter import SortedKmerFilter
        from ..ops.sort_join import pack_table
        kmers = jnp.asarray(counting[0])
        counts = jnp.asarray(counting[1].astype(np.int32))
        cbf = SortedKmerFilter(
            kmers=kmers, counts=counts,
            packed=pack_table(kmers, counts),
            k=state["k"], threshold=state["threshold"])
    else:
        cbf = bloom_ops.CountingBloomFilter(
            counters=jnp.asarray(counting), k=state["k"],
            num_hashes=state["num_hashes"], threshold=state["threshold"])
    vis = bloom_ops.BitBloomFilter(
        bits=jnp.asarray(visited), k=state["k"],
        num_hashes=state["num_hashes"])
    return cbf, vis, state["reads_processed"], state["counters"]


def remove(ckpt_dir: str):
    """Delete checkpoint files after a successful run
    (checkpoint cleanup, bloom-dbg.cc)."""
    for f in FILES:
        p = os.path.join(ckpt_dir, f)
        if os.path.exists(p):
            os.remove(p)
    if os.path.isdir(ckpt_dir):
        try:
            os.rmdir(ckpt_dir)
        except OSError:
            pass
