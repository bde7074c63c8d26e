"""DNA alphabet: 2-bit base codes and ASCII maps.

Base coding follows the reference convention A=0, C=1, G=2, T=3
(cf. /root/reference/Common/Sequence.cpp baseToCode); complement(code) is
3 - code.  Code 4 (`BAD`) marks non-ACGT characters (N, etc.); padded
positions also use BAD.
"""

from __future__ import annotations

import numpy as np

A, C, G, T = 0, 1, 2, 3
BAD = 4  # non-ACGT / padding sentinel
NUM_BASES = 4

BASES = np.frombuffer(b"ACGTN", dtype=np.uint8)

# ASCII → code table (case-insensitive); everything non-ACGT → BAD.
ASCII_TO_CODE = np.full(256, BAD, dtype=np.uint8)
for _i, _ch in enumerate("ACGT"):
    ASCII_TO_CODE[ord(_ch)] = _i
    ASCII_TO_CODE[ord(_ch.lower())] = _i

CODE_TO_ASCII = np.frombuffer(b"ACGTN", dtype=np.uint8)


def encode(seq: str | bytes) -> np.ndarray:
    """ASCII DNA string → uint8 code array (BAD for non-ACGT)."""
    if isinstance(seq, str):
        seq = seq.encode("ascii")
    return ASCII_TO_CODE[np.frombuffer(seq, dtype=np.uint8)]


def decode(codes: np.ndarray) -> str:
    """uint8 code array → ASCII DNA string (BAD → 'N')."""
    codes = np.asarray(codes, dtype=np.uint8)
    return CODE_TO_ASCII[np.minimum(codes, BAD)].tobytes().decode("ascii")


def complement_codes(codes: np.ndarray) -> np.ndarray:
    """Complement 2-bit codes; BAD stays BAD."""
    codes = np.asarray(codes)
    out = (3 - codes.astype(np.int16)).astype(np.uint8)
    return np.where(codes >= BAD, np.uint8(BAD), out)


def revcomp_codes(codes: np.ndarray) -> np.ndarray:
    """Reverse complement along the last axis."""
    return complement_codes(codes)[..., ::-1]


def revcomp(seq: str) -> str:
    return decode(revcomp_codes(encode(seq)))
