"""FASTQ parsing for the service's /fq_lookup endpoint.

The reference repo routes POST /fq_lookup to ``FqProcessRequest``
(ref: kser_request.cc:473-476), implemented in the external PATRIC
kmer-annotation-service repo; the wire format is standard 4-line FASTQ.
Quality strings are parsed (so '@'-opening quality lines cannot be
mistaken for headers) but not otherwise used.
"""

from __future__ import annotations

import dataclasses
import io
from typing import Iterator


@dataclasses.dataclass
class FastqRecord:
    id: str
    defline: str
    seq: str
    qual: str


def iter_fastq(source) -> Iterator[FastqRecord]:
    """Parse FASTQ from a path, bytes, or text stream (4-line records).

    The quality string is read until it reaches the sequence length,
    spanning newlines if necessary, so '@' inside quality data is safe.
    Truncated trailing records are dropped.
    """
    import pathlib

    if isinstance(source, (str, pathlib.Path)):
        fh = open(source, "r", encoding="latin-1")
        close = True
    elif isinstance(source, bytes):
        fh = io.StringIO(source.decode("latin-1"))
        close = False
    else:
        fh = source
        close = False
    try:
        while True:
            header = fh.readline()
            if not header:
                return
            header = header.rstrip("\r\n")
            if not header.startswith("@"):
                continue  # tolerate blank/stray lines between records
            name, _, defline = header[1:].partition(" ")
            seq_parts: list[str] = []
            # sequence lines until the '+' separator (multi-line tolerated)
            while True:
                line = fh.readline()
                if not line:
                    return
                line = line.rstrip("\r\n")
                if line.startswith("+"):
                    break
                seq_parts.append(line)
            seq = "".join(seq_parts)
            qual_parts: list[str] = []
            need = len(seq)
            got = 0
            while got < need:
                line = fh.readline()
                if not line:
                    return
                line = line.rstrip("\r\n")
                qual_parts.append(line)
                got += len(line)
            yield FastqRecord(name, defline, seq, "".join(qual_parts))
    finally:
        if close:
            fh.close()
