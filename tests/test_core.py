"""Unit tests: alphabet codec, SEED grammar, FASTA parser, FunctionMap."""

import io

import numpy as np
import pytest

from signature_kmers_tpu.core import alphabet, seed
from signature_kmers_tpu.core.function_map import FunctionMap, UNDEFINED_FUNCTION
from signature_kmers_tpu.io import fasta


class TestAlphabet:
    def test_roundtrip_pack(self):
        for kmer in ["MKLVVAGH", "acdefghi", "AAAAAAAA", "WYWYWYWY", "MkLvVaGh"]:
            hi, lo = alphabet.pack_kmer_str(kmer)
            assert alphabet.unpack_kmer(hi, lo) == kmer
            assert hi < (1 << 24) and lo < (1 << 24)

    def test_case_sensitive(self):
        assert alphabet.pack_kmer_str("MKLVVAGH") != alphabet.pack_kmer_str("mklvvagh")

    def test_rolling_pack_matches_scalar(self):
        s = "MKLVVAGHACDEFGWY"
        codes = alphabet.encode_seq(s)
        hi, lo = alphabet.pack_codes_np(codes)
        assert hi.shape[0] == len(s) - 7
        for i in range(len(s) - 7):
            assert (int(hi[i]), int(lo[i])) == alphabet.pack_kmer_str(s[i:i + 8])

    def test_validity_tables(self):
        ok = alphabet.CODE_IS_AA[alphabet.encode_seq("ACDEFGHIKLMNPQRSTVWY")]
        assert ok.all()
        ok_lower = alphabet.CODE_IS_AA[alphabet.encode_seq("acdefghiklmnpqrstvwy")]
        assert ok_lower.all()
        bad = alphabet.CODE_IS_AA[alphabet.encode_seq("BJOUXZ*bx")]
        assert not bad.any()
        # call-side ambiguity: '*' and uppercase 'X' only
        amb = alphabet.CODE_IS_CALL_AMBIG[alphabet.encode_seq("*Xx")]
        assert list(amb) == [True, True, False]


class TestSeed:
    def test_split_func_comment(self):
        assert seed.split_func_comment("Protein kinase") == ("Protein kinase", "", "")
        f, s, c = seed.split_func_comment("Protein kinase # truncated protein")
        assert (f, s, c) == ("Protein kinase", "#", "truncated protein")
        f, s, c = seed.split_func_comment("Kinase ## some note")
        assert (f, s, c) == ("Kinase", "##", "some note")

    def test_is_truncated(self):
        assert seed.is_truncated_comment("truncated")
        assert seed.is_truncated_comment("fragment of x")
        assert seed.is_truncated_comment("missing start")
        assert not seed.is_truncated_comment("complete")

    def test_roles_of_function(self):
        assert seed.roles_of_function("A / B @ C; D") == ["A", "B", "C", "D"]
        assert seed.roles_of_function("Single role (EC 1.1.1.1)") == [
            "Single role (EC 1.1.1.1)"]
        assert seed.roles_of_function("Role # with comment") == ["Role"]

    def test_strip_func(self):
        assert seed.strip_func("FIG000001: real function") == "real function"
        assert seed.strip_func("fn # note") == "fn"


class TestFasta:
    def _parse(self, text):
        return list(fasta.iter_fasta(io.StringIO(text)))

    def test_basic(self):
        recs = self._parse(">id1 def line\nMKLV\nVAGH\n>id2\nACDE\n")
        assert len(recs) == 2
        assert recs[0].id == "id1"
        assert recs[0].defline == " def line"
        assert recs[0].seq == "MKLVVAGH"
        assert recs[1].id == "id2"
        assert recs[1].defline == ""
        assert recs[1].seq == "ACDE"

    def test_star_kept_in_data(self):
        recs = self._parse(">a\nMK*LV\n")
        assert recs[0].seq == "MK*LV"

    def test_star_dropped_at_continuation_line_start(self):
        # s_id_or_data accepts only letters as the first kept character
        recs = self._parse(">a\nMKLV\n*ACD\n")
        assert recs[0].seq == "MKLVACD"

    def test_star_kept_at_first_data_line_start(self):
        recs = self._parse(">a\n*MKLV\n")
        assert recs[0].seq == "*MKLV"

    def test_bad_chars_dropped(self):
        recs = self._parse(">a\nMK1LV\nAC D\n")
        assert recs[0].seq == "MKLVACD"

    def test_crlf(self):
        recs = self._parse(">a x\r\nMKLV\r\n")
        assert recs[0].id == "a"
        assert recs[0].seq == "MKLV"

    def test_batch(self):
        batch = fasta.SequenceBatch.from_records(
            self._parse(">a\nMKLV\n>b\nACDEF\n"))
        assert len(batch) == 2
        assert list(batch.lengths) == [4, 5]
        assert batch.seq_str(0) == "MKLV"
        assert batch.seq_str(1) == "ACDEF"


class TestFunctionMap:
    def test_keep_policy(self, tmp_path):
        fm = FunctionMap()
        # function A in 3 genomes, B in 1 genome, C good-function, D via role
        for g in range(3):
            p = tmp_path / f"200{g}.1"
            p.write_text(f">fig|200{g}.1.peg.1 Function A [200{g}.1]\nMKLV\n")
            fm.load_fasta_file(p, False, set())
        p = tmp_path / "3000.1"
        p.write_text(
            ">fig|3000.1.peg.1 Function B [3000.1]\nMKLV\n"
            ">fig|3000.1.peg.2 Function C [3000.1]\nMKLV\n"
            ">fig|3000.1.peg.3 RoleX / RoleY [3000.1]\nMKLV\n")
        fm.load_fasta_file(p, False, set())
        fm.add_good_functions(["Function C"])
        fm.add_good_roles(["RoleY"])
        fm.process_kept_functions(3, set())
        kept = set(fm.function_index_map)
        assert "Function A" in kept
        assert "Function B" not in kept
        assert "Function C" in kept
        assert "RoleX / RoleY" in kept
        assert "hypothetical protein" in kept
        # ids are sequential in sorted order
        names = sorted(kept)
        for i, n in enumerate(names):
            assert fm.function_index_map[n] == i

    def test_assignment_override_and_truncation(self, tmp_path):
        d = tmp_path / "defs"
        d.write_text(
            "fig|1.1.peg.1\tAssigned func\n"
            "fig|1.1.peg.2\tDead func # truncated protein\n")
        fm = FunctionMap()
        fm.load_id_assignments(d)
        assert fm.lookup_function("fig|1.1.peg.1") == "Assigned func"
        # truncated: original kept, assignment dropped
        assert fm.lookup_function("fig|1.1.peg.2") == ""
        assert fm.lookup_original_assignment("fig|1.1.peg.2")[1] == "Dead func"
        # fasta defline does not override an explicit assignment
        p = tmp_path / "1.1"
        p.write_text(">fig|1.1.peg.1 Other func [1.1]\nMKLV\n")
        fm.load_fasta_file(p, False, set())
        assert fm.lookup_function("fig|1.1.peg.1") == "Assigned func"
        assert "Assigned func" in fm.function_genome_map

    def test_genome_from_figid(self, tmp_path):
        p = tmp_path / "anything"
        p.write_text(">fig|4444.2.peg.1\nMKLV\n")
        fm = FunctionMap()
        fm.load_id_assignments_from_pairs = None  # no assignments
        fm.load_fasta_file(p, False, set())
        # no function -> no genome evidence recorded, but no crash
        assert fm.function_genome_map == {}

    def test_undefined_lookup(self):
        fm = FunctionMap()
        assert fm.lookup_index("nope") == UNDEFINED_FUNCTION
