"""DNA utilities: reverse complement and six-frame translation.

Supports the service's /fq_lookup endpoint (reads are DNA; signatures are
protein 8-mers).  The reference repo only *routes* /fq_lookup
(ref: kser_request.cc:473-476) — the handler (``FqProcessRequest``) lives
in the external PATRIC kmer-annotation-service repo, which translates
short reads in all six frames and streams the peptides through the
protein k-mer lookup.  This module provides that translation step.

Translation uses the standard genetic code (NCBI table 11's amino-acid
assignments, the bacterial code — identical to table 1 except for start
codons, which whole-frame translation does not use).  Codons containing
any non-ACGT base translate to 'X', which the call-side window rule then
skips (ref: kmer_data.h:76-102 treats 'X' as a window breaker).
"""

from __future__ import annotations

import numpy as np

# Codon table, TCAG order on each axis (base index: T=0, C=1, A=2, G=3).
_CODE_TABLE = (
    "FFLLSSSSYY**CC*W"  # TTT TTC TTA TTG TCT ... TGG
    "LLLLPPPPHHQQRRRR"
    "IIIMTTTTNNKKSSRR"
    "VVVVAAAADDEEGGGG"
)

_BASE_INDEX = np.full(256, 255, dtype=np.uint8)
for _i, _b in enumerate("TCAG"):
    _BASE_INDEX[ord(_b)] = _i
    _BASE_INDEX[ord(_b.lower())] = _i
# U behaves as T so RNA-style reads translate too
_BASE_INDEX[ord("U")] = 0
_BASE_INDEX[ord("u")] = 0

# codon index (0..63) -> amino-acid byte; index 64 = any ambiguous codon
_CODON_TO_AA = np.frombuffer(
    (_CODE_TABLE + "X").encode("ascii"), dtype=np.uint8).copy()

_COMPLEMENT = np.arange(256, dtype=np.uint8)
for _a, _b in ("TA", "CG", "AT", "GC", "UA",
               "RY", "YR", "KM", "MK", "BV", "VB", "DH", "HD"):
    _COMPLEMENT[ord(_a)] = ord(_b)
    _COMPLEMENT[ord(_a.lower())] = ord(_b.lower())


def reverse_complement(seq: str | bytes) -> str:
    if isinstance(seq, str):
        seq = seq.encode("latin-1")
    arr = np.frombuffer(seq, dtype=np.uint8)
    return _COMPLEMENT[arr][::-1].tobytes().decode("latin-1")


def translate(seq: str | bytes, offset: int = 0) -> str:
    """Translate a DNA string from ``offset`` to the last whole codon.

    Stop codons become '*' and ambiguous codons 'X'; both break call-side
    k-mer windows downstream.
    """
    if isinstance(seq, str):
        seq = seq.encode("latin-1")
    arr = _BASE_INDEX[np.frombuffer(seq, dtype=np.uint8)][offset:]
    n = arr.shape[0] // 3
    if n == 0:
        return ""
    c = arr[:n * 3].reshape(n, 3).astype(np.int32)
    idx = c[:, 0] * 16 + c[:, 1] * 4 + c[:, 2]
    idx[(c >= 4).any(axis=1)] = 64
    return _CODON_TO_AA[idx].tobytes().decode("ascii")


# Frame labels follow the usual convention: +1/+2/+3 are offsets 0/1/2 on
# the given strand, -1/-2/-3 the same on the reverse complement.
FRAMES = (1, 2, 3, -1, -2, -3)


def six_frame_translations(seq: str | bytes) -> list[tuple[int, str]]:
    """-> [(frame, peptide)] for all six reading frames of ``seq``."""
    if isinstance(seq, bytes):
        seq = seq.decode("latin-1")
    rc = reverse_complement(seq)
    return [(f, translate(seq, f - 1)) for f in (1, 2, 3)] + [
        (-f, translate(rc, f - 1)) for f in (1, 2, 3)]
