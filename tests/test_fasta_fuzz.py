"""Differential fuzz of the line-based FASTA parser against a literal
char-level transcription of the reference DFA (fasta_parser.h:38-144)."""

import io
import random

from signature_kmers_tpu.io import fasta


def reference_dfa(text: str):
    """Literal port of FastaParser::parse_char + parse_complete."""
    S_START, S_ID, S_DEFLINE, S_DATA, S_ID_OR_DATA = range(5)
    state = S_START
    cur_id, cur_def, cur_seq = [], [], []
    out = []

    def emit():
        out.append(("".join(cur_id), "".join(cur_def), "".join(cur_seq)))

    for c in text:
        if c == "\r":
            continue
        if state == S_START:
            if c == ">":
                state = S_ID
            # else: error, char dropped, stay in s_start
        elif state == S_ID:
            if c in (" ", "\t"):
                cur_def.append(c)
                state = S_DEFLINE
            elif c == "\n":
                state = S_DATA
            else:
                cur_id.append(c)
        elif state == S_DEFLINE:
            if c == "\n":
                state = S_DATA
            else:
                cur_def.append(c)
        elif state == S_DATA:
            if c == "\n":
                state = S_ID_OR_DATA
            elif c.isalpha() or c == "*":
                cur_seq.append(c)
            # else: error, char dropped
        elif state == S_ID_OR_DATA:
            if c == ">":
                emit()
                cur_id, cur_def, cur_seq = [], [], []
                state = S_ID
            elif c == "\n":
                pass
            elif c.isalpha():
                cur_seq.append(c)
                state = S_DATA
            # else: error, char dropped (includes '*')
    # parse() final parse_complete
    if state != S_START or cur_id or cur_seq or cur_def:
        emit()
    return [r for r in out if r[0]]  # callbacks skip empty ids


ALPH = list("MKLV aX*x12\t>\n\r")


class TestFastaDifferential:
    def test_random_documents(self):
        rng = random.Random(99)
        for trial in range(300):
            n = rng.randrange(0, 120)
            doc = "".join(rng.choice(ALPH) for _ in range(n))
            # ensure some well-formed-ish cases too
            if trial % 3 == 0:
                doc = ">" + doc
            want = reference_dfa(doc)
            got = [(r.id, r.defline, r.seq)
                   for r in fasta.iter_fasta(io.StringIO(doc)) if r.id]
            assert got == want, f"trial {trial}: {doc!r}"

    def test_structured_documents(self):
        rng = random.Random(7)
        for trial in range(200):
            parts = []
            for _ in range(rng.randrange(1, 5)):
                ident = "".join(rng.choice("abcZ19|._") for _ in
                                range(rng.randrange(0, 6)))
                defl = "".join(rng.choice("ab c\t[]#/") for _ in
                               range(rng.randrange(0, 8)))
                parts.append(">" + ident + (" " + defl if defl else ""))
                for _ in range(rng.randrange(0, 4)):
                    parts.append("".join(
                        rng.choice("MKLVax*X1 ") for _ in
                        range(rng.randrange(0, 12))))
            doc = "\n".join(parts) + rng.choice(["", "\n"])
            want = reference_dfa(doc)
            got = [(r.id, r.defline, r.seq)
                   for r in fasta.iter_fasta(io.StringIO(doc)) if r.id]
            assert got == want, f"trial {trial}: {doc!r}"


class TestNativeScannerDifferential:
    def test_native_matches_dfa(self, tmp_path):
        from signature_kmers_tpu.runtime import host

        if not host.available():
            import pytest
            pytest.skip("no native runtime")
        rng = random.Random(123)
        for trial in range(200):
            parts = []
            for _ in range(rng.randrange(0, 5)):
                parts.append("".join(
                    rng.choice(ALPH) for _ in range(rng.randrange(0, 25))))
            doc = "\n".join(parts) + rng.choice(["", "\n", ">tail\nMK"])
            p = tmp_path / f"f{trial}.fa"
            p.write_text(doc, newline="")
            want = [(r.id, r.defline, r.seq)
                    for r in fasta.iter_fasta(io.StringIO(doc)) if r.id]
            nat = host.read_fasta_batch(p)
            got = [(nat.ids[k], nat.deflines[k], nat.seq_str(k))
                   for k in range(len(nat))]
            assert got == want, f"trial {trial}: {doc!r}"
