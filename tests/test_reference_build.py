"""Differential validation of the BUILD spec against COMPILED reference
code.

Compiles the reference's FunctionMap + SignatureBuilder verbatim
(function_map.h, signature_build.h/.tcc; std-only shims, single thread)
and fuzzes golden/build.py against it end-to-end: id-assignment loading
(truncation-comment drops), genome inference (fig| ids, [genome]
deflines, filename fallback), function->genome evidence, the keep policy
(min_reps / good functions / good roles / ignored), sequential function
id assignment, k-mer extraction (20-AA whitelist both cases, seq-id
consumption rules), the top-2 / 80%-rule selection, avg_from_end
(exact upper median of offsets), and the statistics counters.

Compared exactly: kept-kmer set, per-kmer function_index and
avg_from_end, seqs_with_func, distinct_functions, distinct_signatures,
seqs_with_a_signature, and function.index id/name/count columns.
NOT compared: per-kmer mean/median/var and function.index
mean/median/var/stddev — those flow through the shim accumulator (not
real boost; boost's P2 median is approximate and its sample-typed sums
are a separate fidelity question documented in FIDELITY.md).

Known intentional divergence asserted here: the reference binary drops
the keep-function flag (SignatureBuilder::load_fasta hardcodes false,
signature_build.tcc:31 — --fasta-keep-functions is inert); this
framework honors the documented intent.
"""

import os
import subprocess
from pathlib import Path

import numpy as np
import pytest

from signature_kmers_tpu.core import alphabet
from signature_kmers_tpu.core.config import BuildConfig
from signature_kmers_tpu.golden.build import GoldenSignatureBuilder

REF_SRC = Path(os.environ.get("SKT_REFERENCE_SRC", "/root/reference/src"))
FIXTURES = Path(__file__).parent / "fixtures"
SHIMS = FIXTURES / "shims"

K = 8
AA = "ACDEFGHIKLMNPQRSTVWY"

FUNCTIONS = [
    "Chaperone protein DnaK",
    "DNA gyrase subunit B (EC 5.99.1.3)",
    "Translation elongation factor Tu",
    "Ribosomal protein S12p",
    "protA / protB",
    "Rare function one",
    "Rare function two # with hash inside kept",
    "hypothetical protein",
    "Multi role; second role",
]


@pytest.fixture(scope="module")
def build_driver(tmp_path_factory):
    if not (REF_SRC / "signature_build.tcc").is_file():
        pytest.skip("reference tree unavailable")
    exe = tmp_path_factory.mktemp("refbuild") / "ref_build_driver"
    try:
        subprocess.run(
            ["g++", "-O1", "-std=c++17", "-I", str(SHIMS), "-I", str(REF_SRC),
             str(FIXTURES / "ref_build_driver.cpp"),
             str(REF_SRC / "fasta_parser.cc"), "-o", str(exe)],
            check=True, capture_output=True, timeout=300)
    except (subprocess.CalledProcessError, FileNotFoundError,
            subprocess.TimeoutExpired) as e:
        pytest.skip(f"cannot build ref_build_driver: {e}")
    return exe


def gen_corpus(rng, root: Path):
    """Random mini-corpus exercising the load/keep/extract edge cases."""
    (root / "Seqs").mkdir(parents=True)
    (root / "Anno").mkdir()
    motifs = ["".join(rng.choice(list(AA), 20)) for _ in range(12)]
    genomes = [f"100{i}.7" for i in range(5)]
    deleted, assigned = [], []
    n_fasta = 0
    for gi, genome in enumerate(genomes):
        fasta_lines = []
        anno_lines = []
        for si in range(8):
            sid = (f"fig|{genome}.peg.{si}" if rng.random() < 0.6
                   else f"g{gi}s{si}")
            n = int(rng.integers(5, 200))
            chars = list(rng.choice(list(AA), n))
            for p in np.nonzero(rng.random(n) < 0.02)[0]:
                chars[p] = rng.choice(["*", "X", "x", "l"])
            # splice shared motifs so k-mers recur across functions
            for _ in range(int(rng.integers(0, 4))):
                m = motifs[int(rng.integers(0, len(motifs)))]
                if n > len(m):
                    at = int(rng.integers(0, n - len(m)))
                    chars[at:at + len(m)] = list(m)
            seq = "".join(chars)
            func = FUNCTIONS[int(rng.integers(0, len(FUNCTIONS)))]
            r = rng.random()
            if r < 0.45:
                # assignment file; sometimes truncation comment (dropped)
                comment = ("" if rng.random() < 0.7
                           else ("\t# frag end" if rng.random() < 0.5
                                 else " # note"))
                anno_lines.append(f"{sid}\t{func}{comment}")
                fasta_lines.append(f">{sid}\n{seq}")
                assigned.append(sid)
            elif r < 0.8:
                # defline function, sometimes with [genome] suffix
                if rng.random() < 0.6:
                    fasta_lines.append(f">{sid} {func}  [{genome}]\n{seq}")
                else:
                    fasta_lines.append(f">{sid} {func}\n{seq}")
            else:
                fasta_lines.append(f">{sid}\n{seq}")  # no function at all
            if rng.random() < 0.05:
                deleted.append(sid)
        (root / "Seqs" / genome).write_text("\n".join(fasta_lines) + "\n")
        if anno_lines:
            (root / "Anno" / genome).write_text("\n".join(anno_lines) + "\n")
    (root / "deleted").write_text("".join(f"{d}\n" for d in deleted))
    (root / "ignored").write_text("Rare function two # with hash inside kept\n")
    return root


def run_both(build_driver, tmp_path, rng, min_reps, good_fns=(),
             good_roles=()):
    root = gen_corpus(rng, tmp_path / "corpus")
    fastas = sorted((root / "Seqs").iterdir())
    annos = sorted((root / "Anno").iterdir())
    out = tmp_path / "refout"
    out.mkdir()
    cfg_lines = [f"min_reps {min_reps}"]
    cfg_lines += [f"assign {p}" for p in annos]
    cfg_lines += [f"fasta {p}" for p in fastas]
    cfg_lines += [f"deleted {root / 'deleted'}", f"ignored {root / 'ignored'}"]
    cfg_lines += [f"good_fn {g}" for g in good_fns]
    cfg_lines += [f"good_role {g}" for g in good_roles]
    res = subprocess.run([str(build_driver), str(out)],
                         input="\n".join(cfg_lines).encode() + b"\n",
                         capture_output=True, timeout=180, check=True)
    d_kmers, d_seqf, d_dfunc, d_stats = {}, {}, {}, None
    for line in res.stdout.decode().splitlines():
        p = line.split("\t")
        if p[0] == "KMER":
            d_kmers[p[1]] = (int(p[2]), int(p[3]))
        elif p[0] == "SEQF":
            d_seqf[int(p[1])] = int(p[2])
        elif p[0] == "DFUNC":
            d_dfunc[int(p[1])] = int(p[2])
        elif p[0] == "STATS":
            d_stats = (int(p[1]), int(p[2]))
    d_findex = {}
    for line in (out / "function.index").read_text().splitlines():
        c = line.split("\t")
        d_findex[int(c[0])] = (c[1], int(c[2]))

    g = GoldenSignatureBuilder(BuildConfig(min_reps_required=min_reps))
    g.load_function_data(list(good_fns), list(good_roles), annos)
    deleted = set((root / "deleted").read_text().splitlines())
    ignored = set((root / "ignored").read_text().splitlines())
    g.load_fasta(fastas, False, deleted)
    g.process_kept_functions(ignored)
    g.extract_kmers(deleted)
    g.process_kmers()
    return (d_kmers, d_seqf, d_dfunc, d_stats, d_findex), g


@pytest.mark.parametrize("seed,min_reps,goods", [
    (41, 3, ((), ())),
    (42, 2, (("Rare function one",), ())),
    (43, 4, ((), ("Multi role", "protA"))),
    (44, 1, ((), ())),
])
def test_build_vs_reference(build_driver, tmp_path, seed, min_reps, goods):
    rng = np.random.default_rng(seed)
    (d_kmers, d_seqf, d_dfunc, d_stats, d_findex), g = run_both(
        build_driver, tmp_path, rng, min_reps, *goods)

    # function.index: ids, names, count column
    g_findex = {idx: (func, n)
                for idx, func, n, *_ in g.fm.function_index_rows()}
    assert d_findex == g_findex

    # kept k-mer set + function + avg_from_end
    g_kmers = {}
    for key, kk in g.kept_kmers.items():
        g_kmers[key] = (kk.function_index, kk.avg_from_end)
    d_packed = {}
    for kmer_str, v in d_kmers.items():
        codes = alphabet.encode_seq(kmer_str)
        hi, lo = alphabet.pack_codes_np(codes)
        d_packed[(int(hi[0]), int(lo[0]))] = v
    assert len(d_packed) == len(d_kmers)  # codec injective over corpus
    assert d_packed == g_kmers

    # statistics counters
    assert d_seqf == dict(g.stats.seqs_with_func)
    assert d_dfunc == dict(g.stats.distinct_functions)
    assert d_stats == (g.stats.distinct_signatures,
                       len(g.stats.seqs_with_a_signature))
    assert d_stats[0] > 50  # fuzz actually built signatures


def test_keep_flag_inert_in_reference(build_driver, tmp_path):
    """The reference binary drops --fasta-keep-functions
    (signature_build.tcc:31 passes false); this framework honors it.
    Assert the divergence in both directions on a corpus where a rare
    function survives ONLY via the keep flag."""
    root = tmp_path / "c"
    (root / "Seqs").mkdir(parents=True)
    rng = np.random.default_rng(7)
    seq = "".join(rng.choice(list(AA), 120))
    (root / "Seqs" / "1000.7").write_text(
        f">fig|1000.7.peg.1 Rare function one\n{seq}\n")
    out = tmp_path / "refout"
    out.mkdir()
    cfg = f"min_reps 3\nfasta_keep {root / 'Seqs' / '1000.7'}\n"
    res = subprocess.run([str(build_driver), str(out)],
                         input=cfg.encode(), capture_output=True,
                         timeout=120, check=True)
    kept_ref = [l.split("\t")[1] for l in
                (out / "function.index").read_text().splitlines()]
    assert "Rare function one" not in kept_ref  # inert flag: not kept

    g = GoldenSignatureBuilder(BuildConfig(min_reps_required=3))
    g.load_function_data([], [], [])
    g.load_fasta([root / "Seqs" / "1000.7"], True, set())
    g.process_kept_functions(set())
    assert g.fm.lookup_index("Rare function one") != 0xFFFF  # honored
