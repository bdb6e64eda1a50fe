"""Adversarial device-automaton stress: flush-heavy proteins.

Proteins whose hits alternate between many functions force more than
REC_CAP flush records per sequence; those rows must (a) be counted by
the caller's fallback instrumentation and (b) still produce EXACT
results via the host re-call path (function_caller.py _finalize_device).
"""

import numpy as np

from signature_kmers_tpu.core import alphabet
from signature_kmers_tpu.core.config import BuildConfig, DeviceConfig
from signature_kmers_tpu.models.function_caller import FunctionCaller
from signature_kmers_tpu.models.signature_builder import SignatureBuilder
from signature_kmers_tpu.io import fasta


def _mk_corpus(tmp_path, n_funcs=12, seg_len=60):
    """Training corpus of n_funcs distinct families, each with several
    members, so every family owns strong signature k-mers."""
    rng = np.random.default_rng(42)
    aa = alphabet.AA20
    cores = ["".join(aa[i] for i in rng.integers(0, 20, seg_len * 4))
             for _ in range(n_funcs)]
    seqs = tmp_path / "Seqs"
    ann = tmp_path / "Annotations"
    seqs.mkdir()
    ann.mkdir()
    fa, tabs = [], []
    pid = 0
    for f in range(n_funcs):
        for rep in range(4):
            mut = list(cores[f])
            for p in rng.integers(0, len(mut), 6):
                mut[p] = aa[rng.integers(0, 20)]
            fa.append(f">fig|77.1.peg.{pid}\n{''.join(mut)}")
            tabs.append(f"fig|77.1.peg.{pid}\tfamily {f} protein")
            pid += 1
    (seqs / "g1.fa").write_text("\n".join(fa) + "\n")
    (ann / "g1.tab").write_text("\n".join(tabs) + "\n")
    return cores


def test_overflow_rows_exact_and_counted(tmp_path):
    cores = _mk_corpus(tmp_path)
    b = SignatureBuilder(BuildConfig(min_reps_required=1))
    from signature_kmers_tpu.utils import paths

    b.load_function_data([], [], paths.populate_path_list(
        [tmp_path / "Annotations"]))
    b.load_fasta(paths.populate_path_list([tmp_path / "Seqs"]), False, set())
    b.process_kept_functions(set())
    b.extract_kmers(set())
    kept = b.process_kmers()
    table = kept.to_table()
    funcs = [b.fm.index_function_map[i]
             for i in sorted(b.fm.index_function_map)]

    # adversarial queries: concatenate 60-aa segments from ALTERNATING
    # families -> one hit run per segment, far more than REC_CAP runs
    rng = np.random.default_rng(1)
    n_q = 64
    qs = []
    for q in range(n_q):
        parts = []
        for s in range(12):
            f = int(rng.integers(0, len(cores)))
            start = int(rng.integers(0, len(cores[0]) - 60))
            parts.append(cores[f][start:start + 60])
        qs.append("".join(parts))
    qfa = tmp_path / "q.fa"
    qfa.write_text("".join(f">q{i}\n{s}\n" for i, s in enumerate(qs)))
    batch = fasta.SequenceBatch.from_file(qfa)

    dev = FunctionCaller(table, funcs, device_config=DeviceConfig(
        call_batch=64))
    got = dev.call_batch(batch)

    # instrumentation: these queries MUST overflow REC_CAP
    assert dev.rows_processed >= n_q
    assert dev.rows_host_fallback > 0
    assert dev.host_fallback_frac > 0.5  # the corpus is adversarial
    assert dev.host_fallback_frac <= 1.0

    # exactness: host-path caller is the oracle
    host = FunctionCaller(table, funcs, use_device=False)
    want = host.call_batch(batch)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g.seq_id == w.seq_id
        assert g.best == w.best, (g.seq_id, g.best, w.best)


def test_benign_corpus_fallback_near_zero(fixture_dir):
    """The normal fixture corpus must NOT trip the fallback (bounds the
    instrumented fraction on realistic input)."""
    from signature_kmers_tpu.models import pipeline

    out = fixture_dir / "_fb_kd"
    if not (out / "kmer_data.npz").exists():
        pipeline.run_build(
            definition_dirs=[fixture_dir / "Annotations"],
            fasta_dirs=[fixture_dir / "Seqs"],
            kmer_data_dir=out, recall=False)
    table, fi = pipeline.load_data_dir(out)
    caller = FunctionCaller(table, fi)
    batch = fasta.SequenceBatch.from_file(
        fixture_dir / "Queries" / "queries.fa")
    caller.call_batch(batch)
    assert caller.rows_processed >= len(batch)
    assert caller.host_fallback_frac == 0.0
