"""BASELINE config #3 at scale: matrix-distance-folder over ~100 genomes.

The reference scales all-vs-all distance by sharding a directory of
genome FASTAs across jobs and merging text outputs
(ref: kmers-matrix-distance-folder.cc:108-132).  This benchmark drives
this framework's folder CLI over N_FILES synthetic genome files against
a ~SIG_KEYS-signature table and reports files/s + pairs found, then
checks natural-breaks score-cutoff PARITY between

  - the sequential path: Jenks-Fisher on the concatenated score column
    of every per-file output (what merging per-job files by hand gives),
  - the collective path: sharded_score_cutoff (per-shard histograms
    psum-merged over a dp mesh) on a child process's virtual CPU mesh.

Usage: python benchmarks/folder_bench.py [--files N] [--seqs S]
       python benchmarks/folder_bench.py --child-cutoff <scores.npy>
"""

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time
from pathlib import Path

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SIG_KEYS = 600_000
GENOME_LEN = 280


def gen_workload(root: Path, n_files: int, seqs_per_file: int):
    """Synthetic genomes drawing from a shared proteome so files share
    signature k-mers (real folder runs compare related genomes)."""
    import numpy as np

    from signature_kmers_tpu.core import alphabet
    from signature_kmers_tpu.io import formats
    from signature_kmers_tpu.table.kmer_table import KmerTable
    from signature_kmers_tpu.table.wide_table import WideKmerTable

    rng = np.random.default_rng(17)
    aa = alphabet.encode_seq(alphabet.AA20)
    corpus = aa[rng.integers(0, 20, SIG_KEYS + 7)].astype(np.uint8)
    hi, lo = alphabet.pack_codes_np(corpus)
    pk = (hi.astype(np.uint64) << 24) | lo
    _, idx = np.unique(pk, return_index=True)
    idx.sort()
    hi, lo = hi[idx], lo[idx]
    nk = hi.shape[0]
    v0, v1, v2 = KmerTable.pack_values(
        rng.integers(0, GENOME_LEN, nk), (np.arange(nk) % 5000),
        np.full(nk, GENOME_LEN, np.uint32),
        np.full(nk, GENOME_LEN, np.uint32),
        np.full(nk, 10000, np.uint32))  # wide length window: keep hits
    table = WideKmerTable.build(hi, lo, v0.astype(np.uint32),
                                v1.astype(np.uint32), v2.astype(np.uint32))
    data = root / "kd"
    data.mkdir(parents=True)
    table.save(data / "kmer_data", compact=False)
    names = [f"fn{i}" for i in range(5000)] + ["hypothetical protein"]
    formats.write_function_index(
        data / "function.index",
        [(i, fn, 1, 0.0, 0.0, 0.0, 0.0) for i, fn in enumerate(names)])

    gdir = root / "genomes"
    gdir.mkdir()
    decode = alphabet.decode_codes
    # genomes sample their proteins from a shared gene pool (related
    # genomes share most proteins), each with private mutations — so
    # within-file pairs exist and the distance matrices are non-trivial
    n_genes = max(seqs_per_file * 3, 64)
    gene_starts = rng.integers(0, SIG_KEYS - GENOME_LEN, n_genes)
    for g in range(n_files):
        picks = rng.choice(n_genes, seqs_per_file, replace=True)
        with open(gdir / f"g{g:03d}.fa", "w") as f:
            for s, gene in enumerate(picks):
                codes = corpus[gene_starts[gene]:
                               gene_starts[gene] + GENOME_LEN].copy()
                pos = rng.integers(0, GENOME_LEN, 4)
                codes[pos] = aa[rng.integers(0, 20, 4)]
                f.write(f">g{g}.p{s}\n{decode(codes)}\n")
    return data, gdir


def child_cutoff(scores_path: str):
    import numpy as np

    import jax

    jax.config.update("jax_platforms", "cpu")
    from signature_kmers_tpu.parallel.mesh import make_mesh
    from signature_kmers_tpu.stats.natural_breaks import (
        classify_jenks_fisher, sharded_score_cutoff)

    scores = np.load(scores_path)
    mesh = make_mesh(tp=1)
    cut_mesh = sharded_score_cutoff(mesh, scores, k=2)
    cut_seq = classify_jenks_fisher(scores.tolist(), 2)[-1]
    print(json.dumps({"mesh_cutoff": cut_mesh, "seq_cutoff": cut_seq,
                      "n_scores": int(scores.shape[0]),
                      "devices": len(jax.devices())}))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--files", type=int, default=100)
    ap.add_argument("--seqs", type=int, default=48)
    ap.add_argument("--child-cutoff")
    args = ap.parse_args()
    if args.child_cutoff:
        child_cutoff(args.child_cutoff)
        return

    import numpy as np

    from signature_kmers_tpu.cli.main import main as cli_main
    from signature_kmers_tpu.utils.jaxcache import enable_cache

    enable_cache()
    tmp = Path(tempfile.mkdtemp(prefix="skt_folder_bench_"))
    print(f"workload under {tmp}", file=sys.stderr)
    data, gdir = gen_workload(tmp, args.files, args.seqs)
    out_dir = tmp / "out"

    # warm one file (compile) outside the timed region
    warm_dir = tmp / "warm"
    rc = cli_main(["matrix-distance-folder", str(data), str(gdir),
                   str(warm_dir)])
    assert rc == 0
    first = sorted(warm_dir.iterdir())[0].name
    import shutil

    shutil.rmtree(warm_dir)

    t0 = time.perf_counter()
    rc = cli_main(["matrix-distance-folder", str(data), str(gdir),
                   str(out_dir)])
    dt = time.perf_counter() - t0
    assert rc == 0
    outs = sorted(out_dir.iterdir())
    scores = []
    n_pairs = 0
    for f in outs:
        for line in f.read_text().splitlines():
            cols = line.split("\t")
            n_pairs += 1
            scores.append(float(cols[3]))
    print(f"folder: {len(outs)} files in {dt:.1f}s -> "
          f"{len(outs)/dt:.2f} files/s  ({args.seqs} seqs/file, "
          f"{n_pairs} total pairs)", file=sys.stderr)

    # restartability: a second run with outputs present must be ~free
    t0 = time.perf_counter()
    cli_main(["matrix-distance-folder", str(data), str(gdir),
              str(out_dir)])
    print(f"restart skip pass: {time.perf_counter()-t0:.2f}s",
          file=sys.stderr)

    # score-cutoff parity: sequential Jenks on merged scores vs the
    # psum-merged sharded cutoff on a virtual 8-device CPU mesh
    scores_np = np.asarray(scores, np.float32)
    sp = tmp / "scores.npy"
    np.save(sp, scores_np)
    env = dict(os.environ)
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=8").strip()
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--child-cutoff",
         str(sp)], env=env, capture_output=True, text=True, timeout=900)
    line = [l for l in out.stdout.splitlines() if l.startswith("{")]
    assert line, out.stderr[-2000:]
    cut = json.loads(line[-1])
    rel = abs(cut["mesh_cutoff"] - cut["seq_cutoff"]) / max(
        abs(cut["seq_cutoff"]), 1e-9)
    print(f"cutoff parity: sequential {cut['seq_cutoff']:.6g} vs "
          f"mesh-psum {cut['mesh_cutoff']:.6g} "
          f"({cut['devices']} devices, rel diff {rel:.3%})",
          file=sys.stderr)
    print(json.dumps({
        "metric": "matrix_distance_folder_files_per_s",
        "value": round(len(outs) / dt, 3), "unit": "files/s",
        "files": len(outs), "seqs_per_file": args.seqs,
        "pairs": n_pairs, "seq_cutoff": cut["seq_cutoff"],
        "mesh_cutoff": cut["mesh_cutoff"],
        "cutoff_rel_diff": round(rel, 6),
    }))
    shutil.rmtree(tmp)


if __name__ == "__main__":
    main()
