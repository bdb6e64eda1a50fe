"""Cross-validation against the ACTUAL reference code.

Compiles tests/fixtures/ref_driver.cpp against the read-only reference
tree (the std-only components: fasta_parser and kmer_data's
for_each_kmer) and differentially fuzzes the framework's FASTA spec and
call-side window extraction against it.  This is independent ground
truth — every other test validates against specs written by the same
author.  Skips when the reference tree or g++ is unavailable.
"""

import os
import random
import subprocess
from pathlib import Path

import numpy as np
import pytest

from signature_kmers_tpu.core import alphabet
from signature_kmers_tpu.io import fasta

REF_SRC = Path(os.environ.get("SKT_REFERENCE_SRC", "/root/reference/src"))
DRIVER_CPP = Path(__file__).parent / "fixtures" / "ref_driver.cpp"


@pytest.fixture(scope="module")
def driver(tmp_path_factory):
    if not (REF_SRC / "fasta_parser.h").is_file():
        pytest.skip("reference tree unavailable")
    exe = tmp_path_factory.mktemp("refdrv") / "ref_driver"
    try:
        subprocess.run(
            ["g++", "-O1", "-std=c++17", "-I", str(REF_SRC),
             str(DRIVER_CPP), str(REF_SRC / "fasta_parser.cc"),
             "-o", str(exe)],
            check=True, capture_output=True, timeout=300)
    except (subprocess.CalledProcessError, FileNotFoundError,
            subprocess.TimeoutExpired) as e:
        pytest.skip(f"cannot build reference driver: {e}")
    return exe


def parse_framed(out: bytes):
    """Decode the driver's length-framed records."""
    recs = []
    i = 0
    while i < len(out):
        assert out[i:i + 4] == b"REC\n", out[i:i + 20]
        i += 4
        fields = []
        for _ in range(3):
            j = out.index(b"\n", i)
            n = int(out[i:j])
            fields.append(out[j + 1:j + 1 + n].decode("latin-1"))
            i = j + 1 + n + 1  # skip field + trailing \n
        recs.append(tuple(fields))
    return recs


def ref_fasta(driver, text: str, tmp_path):
    f = tmp_path / "in.fa"
    f.write_bytes(text.encode("latin-1"))
    out = subprocess.run([str(driver), "fasta", str(f)],
                         capture_output=True, timeout=60, check=True)
    return parse_framed(out.stdout)


# ASCII-only corpus: the reference feeds signed chars to isalpha —
# undefined behavior for high-bit bytes, so the comparison stays in the
# defined domain (the framework handles latin-1 as the spec documents)
_CHARS = ("ABCDEFGHIKLMNPQRSTVWYXacdefgz*>|. \t\n\n\n"
          ">MKL\n\r")


class TestFastaVsReference:
    def test_wellformed(self, driver, tmp_path):
        text = (">seq1 some defline\nMKLVVA\nGHAC\n\n"
                ">seq2\tTAB def\nACDE*FG\n"
                ">noseq\n"
                ">sp|x|y\nWWYY\n")
        got = [(r.id, r.defline, r.seq) for r in fasta.iter_fasta(
            text.encode("latin-1"))]
        want = ref_fasta(driver, text, tmp_path)
        assert got == want

    def test_fuzz(self, driver, tmp_path):
        rng = random.Random(77)
        for trial in range(40):
            n = rng.randrange(0, 400)
            text = "".join(rng.choice(_CHARS) for _ in range(n))
            got = [(r.id, r.defline, r.seq)
                   for r in fasta.iter_fasta(text.encode("latin-1"))]
            want = ref_fasta(driver, text, tmp_path)
            assert got == want, f"trial {trial}: {text!r}"

    def test_crlf_and_empty(self, driver, tmp_path):
        for text in ("", ">\n", ">a\r\nMK\r\nLV\r\n", ">a b\nM*K\n*MK\n",
                     "garbage\n>ok\nMKLV\n", ">x\n\n\nMK\n"):
            got = [(r.id, r.defline, r.seq)
                   for r in fasta.iter_fasta(text.encode("latin-1"))]
            want = ref_fasta(driver, text, tmp_path)
            assert got == want, repr(text)


class TestForEachKmerVsReference:
    def _ref_windows(self, driver, seq: str):
        out = subprocess.run([str(driver), "kmers"],
                             input=seq.encode("latin-1"),
                             capture_output=True, timeout=60, check=True)
        res = []
        for line in out.stdout.decode().splitlines():
            off, kmer = line.split("\t")
            res.append((int(off), kmer))
        return res

    def test_fuzz_call_validity(self, driver):
        """ops/kmer_pack's call-side validity rule == the reference's
        for_each_kmer skip logic (kmer_data.h:76-102), including the
        ambiguity-jump behavior around '*'/'X' runs."""
        from signature_kmers_tpu.golden.call import valid_call_windows

        rng = random.Random(5)
        aa = "ACDEFGHIKLMNPQRSTVWY"
        for trial in range(60):
            n = rng.randrange(0, 60)
            seq = "".join(
                rng.choice(aa if rng.random() < 0.85 else "*X")
                for _ in range(n))
            want = self._ref_windows(driver, seq)
            codes = alphabet.encode_seq(seq)
            valid = valid_call_windows(codes)
            got = [(int(p), seq[p:p + 8])
                   for p in np.nonzero(valid)[0]]
            assert got == want, f"trial {trial}: {seq!r}"

    def test_mixed_case_passes_through(self, driver):
        from signature_kmers_tpu.golden.call import valid_call_windows

        seq = "mklvVAGHacdefghiWWYY"
        want = self._ref_windows(driver, seq)
        codes = alphabet.encode_seq(seq)
        got = [(int(p), seq[p:p + 8])
               for p in np.nonzero(valid_call_windows(codes))[0]]
        assert got == want
