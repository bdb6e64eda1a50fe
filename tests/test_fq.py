"""DNA translation, FASTQ parsing, and the /fq_lookup service path."""

import random

import pytest

from signature_kmers_tpu.cli.main import main as cli_main
from signature_kmers_tpu.core import dna
from signature_kmers_tpu.io.fastq import iter_fastq


class TestDna:
    def test_translate_standard(self):
        # M K L * and a trailing partial codon is dropped
        assert dna.translate("ATGAAACTTTAGG") == "MKL*"

    def test_translate_offsets(self):
        s = "XATGAAA"
        assert dna.translate(s, 1) == "MK"
        assert dna.translate(s, 0).startswith("X")

    def test_ambiguous_codon_is_x(self):
        assert dna.translate("ATNAAA") == "XK"
        assert dna.translate("atgaaa") == "MK"  # case-insensitive
        assert dna.translate("AUGAAA") == "MK"  # RNA U == T

    def test_reverse_complement(self):
        assert dna.reverse_complement("ATGC") == "GCAT"
        assert dna.reverse_complement("atgc") == "gcat"

    def test_six_frames_cover_both_strands(self):
        s = "ATGAAACTT"
        frames = dict(dna.six_frame_translations(s))
        assert set(frames) == {1, 2, 3, -1, -2, -3}
        assert frames[1] == "MKL"
        assert frames[-1] == dna.translate(dna.reverse_complement(s))

    def test_all_61_sense_codons(self):
        # spot-check the full table against the classic code
        expect = {"TTT": "F", "CTG": "L", "ATG": "M", "GTG": "V",
                  "TCT": "S", "CCG": "P", "ACA": "T", "GCC": "A",
                  "TAT": "Y", "CAT": "H", "CAA": "Q", "AAT": "N",
                  "AAA": "K", "GAT": "D", "GAA": "E", "TGT": "C",
                  "TGG": "W", "CGT": "R", "AGT": "S", "AGA": "R",
                  "GGG": "G", "ATA": "I", "TAA": "*", "TAG": "*",
                  "TGA": "*"}
        for codon, aa in expect.items():
            assert dna.translate(codon) == aa, codon


class TestFastq:
    def test_basic_records(self):
        body = b"@r1 some def\nACGT\n+\nIIII\n@r2\nGGTT\n+r2\nII@I\n"
        recs = list(iter_fastq(body))
        assert [(r.id, r.seq, r.qual) for r in recs] == [
            ("r1", "ACGT", "IIII"), ("r2", "GGTT", "II@I")]
        assert recs[0].defline == "some def"

    def test_at_sign_quality_not_header(self):
        # quality line starting with '@' must not open a new record
        body = b"@r1\nACGT\n+\n@III\n@r2\nTTTT\n+\nIIII\n"
        recs = list(iter_fastq(body))
        assert [r.id for r in recs] == ["r1", "r2"]

    def test_truncated_record_dropped(self):
        body = b"@r1\nACGT\n+\nIIII\n@r2\nACGT\n+\nII"
        assert [r.id for r in iter_fastq(body)] == ["r1"]

    def test_multiline_seq_and_qual(self):
        body = b"@r1\nACGT\nACGT\n+\nIIII\nIIII\n"
        recs = list(iter_fastq(body))
        assert recs[0].seq == "ACGTACGT"
        assert recs[0].qual == "IIIIIIII"


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    from tests.fixtures.gen_corpus import generate_corpus

    root = tmp_path_factory.mktemp("corpus_fq")
    generate_corpus(root)
    out = tmp_path_factory.mktemp("kd_fq")
    rc = cli_main([
        "build-signatures",
        "-D", str(root / "Annotations"),
        "-F", str(root / "Seqs"),
        "--kmer-data-dir", str(out),
        "--final-kmers", "final.kmers",
        "--no-recall"])
    assert rc == 0
    return out


# one codon per amino acid (reverse translation for test reads)
_AA_TO_CODON = {}
for _i, _aa in enumerate(dna._CODE_TABLE):
    _codon = "TCAG"[_i // 16] + "TCAG"[(_i // 4) % 4] + "TCAG"[_i % 4]
    _AA_TO_CODON.setdefault(_aa, _codon)


def _reverse_translate(pep: str) -> str:
    return "".join(_AA_TO_CODON[a] for a in pep)


class TestFqLookup:
    def test_fq_lookup_calls_reads(self, data_dir):
        from signature_kmers_tpu.service.server import AnnotationService
        from tests.fixtures.gen_corpus import FUNCTIONS

        svc = AnnotationService(str(data_dir))
        # reconstruct a family member from the table's own signatures:
        # use the training corpus generator's core for function 0
        from tests.fixtures.gen_corpus import generate_corpus  # noqa: F401
        import random as _r

        rng = _r.Random(20240817)
        from tests.fixtures import gen_corpus as gc

        cores = {fn: gc._rand_prot(rng, 220) for fn in gc.FUNCTIONS}
        # full-length core: the caller's length gate (mean +/- 2*MAD of
        # training lengths, ~250aa here) rejects short fragments
        pep = cores[FUNCTIONS[0]]
        fwd = _reverse_translate(pep)
        rev = dna.reverse_complement(fwd)
        body = (f"@readF fwd\n{fwd}\n+\n{'I' * len(fwd)}\n"
                f"@readR rev\n{rev}\n+\n{'I' * len(rev)}\n"
                f"@readN noise\n{'ACGT' * 30}\n+\n{'I' * 120}\n"
                ).encode()
        out = svc.fq_lookup_text(body)
        rows = [l.split("\t") for l in out.splitlines()]
        by_id = {r[0]: r for r in rows}
        assert "readF" in by_id and "readR" in by_id
        assert by_id["readF"][2] == FUNCTIONS[0]
        assert by_id["readR"][2] == FUNCTIONS[0]
        assert by_id["readF"][1] == "+1"
        assert by_id["readR"][1].startswith("-")
        assert "readN" not in by_id
