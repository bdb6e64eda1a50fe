"""Differential validation of the SEED grammar and matrix-distance specs
against COMPILED reference code.

Extends the shim-compile approach of tests/test_reference_scoring.py to
two more boost/TBB-dependent reference components:

- seed_utils.h (verbatim, boost::regex -> std::regex shim): strip_func,
  strip_func_comment, split_func_comment, is_truncated_comment,
  roles_of_function vs core/seed.py on fuzzed function strings.
- matrix_distance.h::MatrixDistance::compute (verbatim, TBB containers
  shimmed to std, run serially): the +-2*sigma hit length filter
  (var==0 -> sigma=0.1*seqlen), per-k-mer id sets and pair counting vs
  golden/distance.py.  Pair rows are compared as a set with ids
  normalized (intern order differs: the reference interns ids at first
  HIT, the spec at first sequence — documented in golden/distance.py).
"""

import os
import subprocess
from pathlib import Path
from types import SimpleNamespace

import numpy as np
import pytest

from signature_kmers_tpu.core import alphabet, seed
from signature_kmers_tpu.core.config import DistanceConfig
from signature_kmers_tpu.golden.call import GoldenFunctionCaller
from signature_kmers_tpu.golden.distance import compute_distance
from signature_kmers_tpu.io import fasta as fasta_io

REF_SRC = Path(os.environ.get("SKT_REFERENCE_SRC", "/root/reference/src"))
FIXTURES = Path(__file__).parent / "fixtures"
SHIMS = FIXTURES / "shims"

K = 8
AA = "ACDEFGHIKLMNPQRSTVWY"


def _build(tmp_path_factory, name, extra_srcs=()):
    if not (REF_SRC / "seed_utils.h").is_file():
        pytest.skip("reference tree unavailable")
    exe = tmp_path_factory.mktemp("refdrv") / name
    try:
        subprocess.run(
            ["g++", "-O1", "-std=c++17", "-I", str(SHIMS), "-I", str(REF_SRC),
             str(FIXTURES / f"{name}.cpp"), *extra_srcs, "-o", str(exe)],
            check=True, capture_output=True, timeout=300)
    except (subprocess.CalledProcessError, FileNotFoundError,
            subprocess.TimeoutExpired) as e:
        pytest.skip(f"cannot build {name}: {e}")
    return exe


@pytest.fixture(scope="module")
def seed_driver(tmp_path_factory):
    return _build(tmp_path_factory, "ref_seed_driver")


@pytest.fixture(scope="module")
def matrix_driver(tmp_path_factory):
    return _build(tmp_path_factory, "ref_matrix_driver",
                  extra_srcs=[str(REF_SRC / "fasta_parser.cc")])


# -- SEED grammar -----------------------------------------------------------


def _read_framed(stream_lines):
    it = iter(stream_lines)

    def field():
        n = int(next(it))
        s = next(it)
        assert len(s) == n, (n, s)
        return s

    recs = []
    try:
        while True:
            first = next(it)
            if first == "":  # trailing element of the final split
                break
            echo = next(it)
            assert len(echo) == int(first), (first, echo)
            rec = {
                "echo": echo,
                "strip_func": field(),
                "strip_func_comment": field(),
                "func": field(),
                "sep": field(),
                "comment": field(),
                "trunc": field(),
            }
            rec["roles"] = [field() for _ in range(int(field()))]
            recs.append(rec)
    except StopIteration:
        pass
    return recs


ROLE_WORDS = ["DNA gyrase subunit B (EC 5.99.1.3)", "protA", "protB",
              "hypothetical protein", "Chaperone", "x", "", " lead",
              "trail ", "EC 1.2.3.4", "with  spaces", "with\ttab"]
SEPS = [" / ", " @ ", "; ", ";  ", "  /  ", " @  "]
COMMENTS = ["", " # frag", " ## missing C-terminus", " # truncated",
            " # note", " #frag", "# tight", "  ##  spaced  ",
            " # trunc", " # fragment of protein"]
PREFIXES = ["", "FIG012345: ", "FIG999999x: ", "FIG12345: ",  # 5 digits: no match
            "frag ", "missing", "trunc start "]


def gen_function_strings(rng, n):
    out = []
    for _ in range(n):
        nroles = int(rng.integers(1, 4))
        roles = [ROLE_WORDS[int(rng.integers(0, len(ROLE_WORDS)))]
                 for _ in range(nroles)]
        seps = [SEPS[int(rng.integers(0, len(SEPS)))]
                for _ in range(nroles - 1)]
        s = roles[0]
        for r, sp in zip(roles[1:], seps):
            s += sp + r
        s = (PREFIXES[int(rng.integers(0, len(PREFIXES)))] + s
             + COMMENTS[int(rng.integers(0, len(COMMENTS)))])
        out.append(s)
    out += ["", "#", " # ", "a#b", "frag", "missing thing # frag",
            "A / B", "A/B", "A ; B", "; leading", "trailing / ",
            "FIG000000: x # trunc"]
    return out


def test_seed_grammar_vs_reference(seed_driver):
    rng = np.random.default_rng(21)
    lines = [s for s in gen_function_strings(rng, 400) if "\n" not in s]
    out = subprocess.run([str(seed_driver)],
                         input="\n".join(lines).encode() + b"\n",
                         capture_output=True, timeout=120, check=True)
    recs = _read_framed(out.stdout.decode().split("\n"))
    assert len(recs) == len(lines)
    for line, rec in zip(lines, recs):
        assert rec["echo"] == line
        assert rec["strip_func"] == seed.strip_func(line), line
        assert rec["strip_func_comment"] == seed.strip_func_comment(line), line
        f, sep, c = seed.split_func_comment(line)
        assert (rec["func"], rec["sep"], rec["comment"]) == (f, sep, c), line
        assert rec["trunc"] == ("1" if seed.is_truncated_comment(line)
                                else "0"), line
        assert rec["roles"] == seed.roles_of_function(line), line


# -- matrix distance --------------------------------------------------------


def gen_distance_scenario(rng, n_seqs):
    function_index = ["hypothetical protein"] + [f"fn{i}" for i in range(8)]
    table = {}
    seqs = []
    for _ in range(n_seqs):
        n = int(rng.integers(40, 400))
        chars = list(rng.choice(list(AA), n))
        for p in np.nonzero(rng.random(n) < 0.01)[0]:
            chars[p] = rng.choice(["*", "X"])
        seq = "".join(chars)
        n_seg = int(rng.integers(1, 4))
        bounds = np.sort(rng.integers(0, max(1, n - K), n_seg * 2))
        for j in range(n_seg):
            s, e = int(bounds[2 * j]), int(bounds[2 * j + 1])
            fi = int(rng.integers(0, len(function_index)))
            # mean near seqlen (passes +-2*sigma) or far (rejected);
            # var==0 rows exercise the sigma=0.1*len fallback
            base = n if rng.random() < 0.6 else int(rng.integers(30, 900))
            for p in range(s, min(e, n - K + 1)):
                if rng.random() < 0.6:
                    kmer = seq[p:p + K]
                    if "*" in kmer or "X" in kmer:
                        continue
                    var = 0 if rng.random() < 0.3 else int(rng.integers(1, 5000))
                    table.setdefault(kmer, (
                        int(rng.integers(0, 300)), fi,
                        max(1, base + int(rng.integers(-30, 31))),
                        max(1, base), var))
        seqs.append(seq)
    # shared segments: copy a slice of one sequence into another so pair
    # counts are non-trivial
    for _ in range(n_seqs // 2):
        a, b = rng.integers(0, n_seqs, 2)
        if a == b:
            continue
        sa, sb = seqs[int(a)], seqs[int(b)]
        L = min(len(sa), len(sb), int(rng.integers(20, 60)))
        cut = int(rng.integers(0, min(len(sa), len(sb)) - L + 1))
        seqs[int(b)] = sb[:cut] + sa[cut:cut + L] + sb[cut + L:]
    return table, function_index, seqs


@pytest.mark.parametrize("seed_", [31, 32, 33])
def test_matrix_distance_vs_reference(matrix_driver, tmp_path, seed_):
    rng = np.random.default_rng(seed_)
    table, function_index, seqs = gen_distance_scenario(rng, 24)

    kdb = tmp_path / "kdb.tsv"
    with open(kdb, "w") as f:
        for kmer, (a, fi, mean, med, var) in table.items():
            f.write(f"{kmer}\t{a}\t{fi}\t{mean}\t{med}\t{var}\n")
    fidx = tmp_path / "function.index"
    with open(fidx, "w") as f:
        for i, name in enumerate(function_index):
            f.write(f"{i}\t{name}\n")
    fa = tmp_path / "q.fa"
    with open(fa, "w") as f:
        for i, s in enumerate(seqs):
            f.write(f">s{i}\n{s}\n")
    out = tmp_path / "dist.tsv"
    subprocess.run([str(matrix_driver), str(kdb), str(fidx), str(fa),
                    str(out)], capture_output=True, timeout=120, check=True)
    d_rows = {}
    for line in out.read_text().splitlines():
        s1, s2, count, score = line.split("\t")
        key = tuple(sorted((s1, s2)))
        assert key not in d_rows
        d_rows[key] = (int(count), float(score))

    packed = {}
    for kmer, (a, fi, mean, med, var) in table.items():
        codes = alphabet.encode_seq(kmer)
        hi, lo = alphabet.pack_codes_np(codes)
        packed[(int(hi[0]), int(lo[0]))] = SimpleNamespace(
            avg_from_end=a, function_index=fi, mean=mean, median=med,
            var=var)
    caller = GoldenFunctionCaller(packed.get, function_index)
    res = compute_distance(caller, [fasta_io.read_fasta_batch(fa)],
                           DistanceConfig())
    g_rows = {}
    for s1, s2, count, score in res.rows(with_score=True):
        g_rows[tuple(sorted((s1, s2)))] = (count, score)

    assert set(d_rows) == set(g_rows)
    assert any(c > 1 for c, _ in g_rows.values()) or g_rows == {}
    for key, (dc, ds) in d_rows.items():
        gc_, gs = g_rows[key]
        assert dc == gc_, key
        # driver score is ostream float (6 significant digits)
        assert abs(ds - gs) <= 5e-6 * max(1.0, abs(gs)), (key, ds, gs)
