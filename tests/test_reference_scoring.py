"""Differential validation of the caller SPEC against the COMPILED
reference scoring path.

tests/test_reference_cross.py covers the std-only reference components
(fasta_parser, for_each_kmer); this module compiles the reference's FULL
inference path — ``process_aa_seq``'s HitSet automaton and
``find_best_call``'s collapse/bridge/fusion/margin scoring
(call_functions.h/.tcc, verbatim from the read-only reference tree) —
using the std-only shim headers in tests/fixtures/shims/ (boost.math
statistics / regex / accumulators / filesystem and TBB containers), and
differentially fuzzes golden/call.py against it.  This closes the last
same-author-spec validation gap: the fusion-regex path, the bridge
merges, and the margin/ambiguity scoring are now checked against real
reference code, not against a spec written by the same author.

Everything is compared EXACTLY — no tie leniency, no float tolerance:
- the spec reproduces libstdc++'s partial_sort placement bit-for-bit
  (golden/call._ref_top2_order; the reference's pair fallback reads
  vec[2], which is a heap-displacement leftover, not the third-largest
  total — a genuine finding of this differential, see FIDELITY.md);
- the shims compute the length statistics in double where real boost
  uses float for some interfaces; on the uint16-valued inputs of this
  domain both are exact, so scores/medians/MADs still compare exactly.

The reference's bridge-merge (interior count < 5) is UNREACHABLE at the
default min_hits=5 (every emitted call has count >= min_hits), so the
fuzz also runs at min_hits 2 and 3 to exercise it.
"""

import os
import subprocess
from pathlib import Path
from types import SimpleNamespace

import numpy as np
import pytest

from signature_kmers_tpu.core import alphabet
from signature_kmers_tpu.core.config import CallConfig
from signature_kmers_tpu.golden.call import GoldenFunctionCaller

REF_SRC = Path(os.environ.get("SKT_REFERENCE_SRC", "/root/reference/src"))
DRIVER_CPP = Path(__file__).parent / "fixtures" / "ref_call_driver.cpp"
SHIMS = Path(__file__).parent / "fixtures" / "shims"

K = 8
AA = "ACDEFGHIKLMNPQRSTVWY"


@pytest.fixture(scope="module")
def driver(tmp_path_factory):
    if not (REF_SRC / "call_functions.tcc").is_file():
        pytest.skip("reference tree unavailable")
    exe = tmp_path_factory.mktemp("refcall") / "ref_call_driver"
    try:
        subprocess.run(
            ["g++", "-O1", "-std=c++17", "-I", str(SHIMS), "-I", str(REF_SRC),
             str(DRIVER_CPP), str(REF_SRC / "fasta_parser.cc"),
             "-o", str(exe)],
            check=True, capture_output=True, timeout=300)
    except (subprocess.CalledProcessError, FileNotFoundError,
            subprocess.TimeoutExpired) as e:
        pytest.skip(f"cannot build reference caller driver: {e}")
    return exe


def run_driver(driver, tmp_path, table, function_index, seqs,
               ignore_hypo=False, min_hits=5, max_gap=200):
    """table: dict kmer_str -> (avg, fI, mean, median, var)."""
    kdb = tmp_path / "kdb.tsv"
    with open(kdb, "w") as f:
        for kmer, (a, fi, mean, med, var) in table.items():
            f.write(f"{kmer}\t{a}\t{fi}\t{mean}\t{med}\t{var}\n")
    fidx = tmp_path / "function.index"
    with open(fidx, "w") as f:
        for i, name in enumerate(function_index):
            f.write(f"{i}\t{name}\n")
    fasta = "".join(f">s{i}\n{s}\n" for i, s in enumerate(seqs))
    out = subprocess.run(
        [str(driver), str(kdb), str(fidx), str(int(ignore_hypo)),
         str(min_hits), str(max_gap)],
        input=fasta.encode(), capture_output=True, timeout=120, check=True)
    hits, calls, best = {}, {}, {}
    for line in out.stdout.decode().splitlines():
        parts = line.split("\t")
        sid = parts[1]
        if parts[0] == "HIT":
            hits.setdefault(sid, []).append((int(parts[2]), int(parts[3])))
        elif parts[0] == "CALL":
            calls.setdefault(sid, []).append(
                (int(parts[2]), int(parts[3]), int(parts[4]), int(parts[5]),
                 int(parts[6]), float(parts[7])))
        elif parts[0] == "BEST":
            best[sid] = (int(parts[2]), float(parts[3]), float(parts[4]),
                         parts[5] if len(parts) > 5 else "")
    return hits, calls, best


def golden_side(table, function_index, seqs, ignore_hypo=False,
                min_hits=5, max_gap=200):
    packed = {}
    for kmer, (a, fi, mean, med, var) in table.items():
        codes = alphabet.encode_seq(kmer)
        hi, lo = alphabet.pack_codes_np(codes)
        packed[(int(hi[0]), int(lo[0]))] = SimpleNamespace(
            avg_from_end=a, function_index=fi, mean=mean, median=med,
            var=var)
    cfg = CallConfig(min_hits=min_hits, max_gap=max_gap,
                     ignore_hypothetical=ignore_hypo)
    caller = GoldenFunctionCaller(packed.get, function_index, cfg)
    out = {}
    for i, s in enumerate(seqs):
        calls, bc, hits = caller.call_sequence(s)
        hypo = caller.hypo_index
        hit_rows = [(h.pos, h.function_index) for h in hits
                    if not (ignore_hypo and h.function_index == hypo)]
        call_rows = [(c.start, c.end, c.count, c.function_index,
                      c.protein_length_median, c.protein_length_med_avg_dev)
                     for c in calls]
        out[f"s{i}"] = (hit_rows, call_rows,
                        (bc.function_index if bc.function_index != 0xFFFF
                         else 0xFFFF, bc.score, bc.score_offset, bc.function))
    return out


def compare(driver, tmp_path, table, function_index, seqs, *,
            ignore_hypo=False, min_hits=5, max_gap=200):
    d_hits, d_calls, d_best = run_driver(
        driver, tmp_path, table, function_index, seqs,
        ignore_hypo=ignore_hypo, min_hits=min_hits, max_gap=max_gap)
    gold = golden_side(table, function_index, seqs, ignore_hypo=ignore_hypo,
                       min_hits=min_hits, max_gap=max_gap)
    for i, s in enumerate(seqs):
        sid = f"s{i}"
        g_hits, g_calls, g_best = gold[sid]
        assert d_hits.get(sid, []) == g_hits, (sid, s)
        assert d_calls.get(sid, []) == g_calls, (sid, s)
        assert d_best[sid] == g_best, (sid, s, d_best[sid], g_best)


# ---------------------------------------------------------------------------


def gen_scenario(rng, n_seqs, min_hits):
    singles = [f"prot{c}" for c in "ABCDEF"]
    multis = ["protA / protB", "protC / protD", "protA / protE / protF"]
    function_index = ["hypothetical protein"] + singles + multis
    table = {}
    seqs = []
    for _ in range(n_seqs):
        n = int(rng.integers(40, 500))
        chars = list(rng.choice(list(AA), n))
        # sprinkle ambiguity/edge characters
        for p in np.nonzero(rng.random(n) < 0.015)[0]:
            chars[p] = rng.choice(["*", "X", "x"])
        seq = "".join(chars)
        n_seg = int(rng.integers(1, 6))
        bounds = np.sort(rng.integers(0, max(1, n - K), n_seg * 2))
        for j in range(n_seg):
            s, e = int(bounds[2 * j]), int(bounds[2 * j + 1])
            fi = int(rng.integers(0, len(function_index)))
            # protein-length stats: usually near the true length (passes
            # the +-2*MAD filter), sometimes far (exercises the skip)
            base = n if rng.random() < 0.7 else int(rng.integers(30, 900))
            for p in range(s, min(e, n - K + 1)):
                if rng.random() < 0.75:
                    kmer = seq[p:p + K]
                    if "*" in kmer or "X" in kmer:
                        continue
                    mean = max(1, base + int(rng.integers(-40, 41)))
                    table.setdefault(kmer, (
                        int(rng.integers(0, 300)), fi, mean,
                        max(1, base + int(rng.integers(-40, 41))),
                        int(rng.integers(0, 5000))))
        seqs.append(seq)
    return table, function_index, seqs


@pytest.mark.parametrize("seed,min_hits,ignore_hypo", [
    (1, 5, False), (2, 5, True), (3, 3, False),
    (4, 2, False), (5, 2, True), (6, 3, True),
])
def test_fuzz_vs_reference(driver, tmp_path, seed, min_hits, ignore_hypo):
    rng = np.random.default_rng(seed)
    table, function_index, seqs = gen_scenario(rng, 40, min_hits)
    max_gap = 200 if seed % 2 else 60  # short gap exercises gap flushes
    compare(driver, tmp_path, table, function_index, seqs,
            ignore_hypo=ignore_hypo, min_hits=min_hits, max_gap=max_gap)


@pytest.mark.parametrize("seed,period", [(7, 1), (8, 2), (9, 3)])
def test_switch_heavy_vs_reference(driver, tmp_path, seed, period):
    """Adversarial function alternation: every `period` registered
    windows flip between two functions, stressing the keep-last-two
    switch rule and flush interleaving (call_functions.tcc:88-99,
    320-327)."""
    rng = np.random.default_rng(seed)
    function_index = ["hypothetical protein", "fA", "fB", "fC"]
    table = {}
    seqs = []
    for _ in range(25):
        n = int(rng.integers(60, 300))
        seq = "".join(rng.choice(list(AA), n))
        fis = [1 + (p // period) % 2 for p in range(n - K + 1)]
        if rng.random() < 0.3:  # third function sprinkled in
            for p in np.nonzero(rng.random(n - K + 1) < 0.1)[0]:
                fis[p] = 3
        for p in range(n - K + 1):
            if rng.random() < 0.85:
                table.setdefault(seq[p:p + K],
                                 (10, fis[p], n, n, 0))
        seqs.append(seq)
    compare(driver, tmp_path, table, function_index, seqs,
            min_hits=3, max_gap=40)


def test_fusion_called_exactly(driver, tmp_path):
    """Deterministic A-W-B fusion: median(A)+median(B) == median(W) fires
    the fusion path (regex + f32 part-mean check, tcc:456-565)."""
    function_index = ["hypothetical protein", "pA", "pB", "pA / pB"]
    n = 300
    rng = np.random.default_rng(11)
    seq = "".join(rng.choice(list(AA), n))
    table = {}

    def register(lo, hi, fi, means):
        for j, p in enumerate(range(lo, hi)):
            # alternate around the target so the +-2*MAD filter passes
            # (MAD is large) while the median stays pinned
            table[seq[p:p + K]] = (10, fi, means[j % len(means)],
                                   means[j % len(means)], 0)

    register(10, 40, 1, [150, 450])    # part A: median 300
    register(100, 140, 3, [300, 900])  # fusion W: median 600
    register(200, 240, 2, [150, 450])  # part B: median 300
    _, _, best = run_driver(driver, tmp_path, table, function_index, [seq])
    fi, score, off, fn = best["s0"]
    assert fn == "pA / pB" and fi == 3, best
    gold = golden_side(table, function_index, [seq])
    assert gold["s0"][2] == (fi, score, off, fn)


def test_bridge_merge_matches(driver, tmp_path):
    """Deterministic F1-x-F1 bridge at min_hits=3 (interior < 5,
    combined >= 10; unreachable at the default min_hits=5)."""
    function_index = ["hypothetical protein", "f1", "f2"]
    n = 200
    rng = np.random.default_rng(13)
    seq = "".join(rng.choice(list(AA), n))
    table = {}
    for p in range(10, 17):     # F1 run, 7 hits
        table[seq[p:p + K]] = (10, 1, n, n, 0)
    for p in range(40, 44):     # F2 interior, 4 hits (< 5)
        table[seq[p:p + K]] = (10, 2, n, n, 0)
    for p in range(80, 87):     # F1 again, 7 hits (7+7 >= 10)
        table[seq[p:p + K]] = (10, 1, n, n, 0)
    _, d_calls, d_best = run_driver(driver, tmp_path, table, function_index,
                                    [seq], min_hits=3)
    gold = golden_side(table, function_index, [seq], min_hits=3)
    assert d_calls["s0"] == gold["s0"][1]
    assert len(d_calls["s0"]) == 3  # F1, F2, F1 all emitted
    assert d_best["s0"] == gold["s0"][2]
    assert d_best["s0"][0] == 1  # bridged F1 wins
