"""abyss_tpu — a TPU-native de novo short-read genome assembler.

A from-scratch reimplementation of the capabilities of bcgsc/abyss
(reference: /root/reference) designed TPU-first: batched, static-shape
JAX/XLA/Pallas kernels over device-resident arrays, SPMD sharding over
`jax.sharding.Mesh` instead of MPI, and host-side Python only for IO and
orchestration.

Subpackages
-----------
core      foundation types: alphabet, packed sequences, histograms, options
io        FASTA/FASTQ/graph-format readers and writers
ops       device kernels: ntHash rolling hash, (counting) Bloom filters
dbg       de Bruijn graph engines (Bloom DBG, exact hash DBG)
graph     contig-graph substrate + algorithms (adj, bubbles, paths)
align     alignment kernels (NW/SW), read→contig mapper, distance est
scaffold  scaffolding / path search
parallel  mesh + sharding utilities (the MPI CommLayer replacement)
pipeline  abyss-pe-equivalent stage driver
stats     assembly statistics (abyss-fac equivalent)
"""

import os as _os

import jax as _jax

# k-mer hashing and 2-bit packing use uint64 throughout; enable 64-bit types
# before any tracing happens. (TPU emulates 64-bit integer ops with 32-bit
# lanes; the hot kernels are later specialised to uint32 pairs in Pallas.)
_jax.config.update("jax_enable_x64", True)

# Backend override (e.g. ABYSS_TPU_PLATFORM=cpu for CPU-mesh runs of the
# CLI tools): some environments pin JAX_PLATFORMS via sitecustomize, so an
# env var read here — before first backend use — is the reliable switch.
_plat = _os.environ.get("ABYSS_TPU_PLATFORM")
if _plat:
    _jax.config.update("jax_platforms", _plat)

# Persistent compilation cache: compiles through the axon remote tunnel take
# 5-10 minutes per program, so caching across processes is essential.
_cache_dir = _os.environ.get(
    "ABYSS_TPU_CACHE", _os.path.join(_os.path.dirname(__file__), "..",
                                     ".jax_cache"))
try:
    # TPU-backend only: this jaxlib's CPU AOT serialization is broken
    # in this image (cache writes segfault; loads warn about
    # mismatched machine features / SIGILL), so CPU runs — including
    # the test suite's forced-cpu backend — must not touch the
    # persistent cache.
    _cpu = (_plat == "cpu"
            or getattr(_jax.config, "jax_platforms", None) == "cpu")
    if not _cpu:
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        # Cache even fast-compiling programs: through the axon tunnel
        # a "1 s" compile still costs several round trips, and the
        # cold-vs-steady e2e gap (BENCH_NOTES round 4: 262.6 s vs
        # 210.8 s) is the sum of dozens of such programs.
        _jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:  # older jax without these options
    pass

__version__ = "0.1.0"
