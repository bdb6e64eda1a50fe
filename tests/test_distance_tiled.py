"""Tiled matrix-distance pair counting vs the dense path.

Past DistanceConfig.dense_pair_limit the (S, S) accumulator would OOM
(40 GB at S=100K); the tiled path streams (tile x tile) output blocks as
sparse pairs.  These tests force tiny tiles so the tiling logic runs on
small inputs, and check exactness against the dense path.
"""

import dataclasses

import numpy as np
import pytest

from signature_kmers_tpu.core.config import DistanceConfig


def _md(tile_size, dense_limit):
    """A MatrixDistance with a stub table (only _pairs is exercised)."""
    from signature_kmers_tpu.models.matrix_distance import MatrixDistance

    md = MatrixDistance.__new__(MatrixDistance)
    md.config = dataclasses.replace(DistanceConfig(), tile_size=tile_size,
                                    dense_pair_limit=dense_limit)
    md.use_device = True
    return md


def _dense_pairs(md, kmer_id, seqs, n_seqs):
    C = md._pair_counts(kmer_id, seqs, n_seqs)
    i1, i2 = np.nonzero(np.triu(C, k=1))
    return sorted((int(a), int(b), int(C[a, b])) for a, b in zip(i1, i2))


@pytest.mark.parametrize("n_seqs,n_kmers,n_entries,tile", [
    (100, 500, 3000, 32),      # many tiles, odd edge tile
    (64, 50, 800, 64),         # exactly one tile
    (33, 9000, 5000, 16),      # many kmer blocks (kblock boundary) — no:
                               # kblock is 4096, so 9000 kmers = 3 blocks
])
def test_tiled_matches_dense(n_seqs, n_kmers, n_entries, tile):
    rng = np.random.default_rng(n_seqs + tile)
    kmer_id = rng.integers(0, n_kmers, n_entries)
    seqs = rng.integers(0, n_seqs, n_entries)
    # set semantics: distinct (kmer, seq)
    u = np.unique(kmer_id * np.int64(n_seqs) + seqs)
    kmer_id = (u // n_seqs).astype(np.int64)
    seqs = (u % n_seqs).astype(np.int64)

    md = _md(tile, dense_limit=1)
    got = md._pairs(kmer_id, seqs, n_seqs)
    want = _dense_pairs(md, kmer_id, seqs, n_seqs)
    assert got == want


def test_tiled_matches_dense_on_mesh():
    from signature_kmers_tpu.parallel import mesh as mesh_mod

    rng = np.random.default_rng(7)
    n_seqs, n_kmers = 90, 6000
    kmer_id = rng.integers(0, n_kmers, 4000)
    seqs = rng.integers(0, n_seqs, 4000)
    u = np.unique(kmer_id * np.int64(n_seqs) + seqs)
    kmer_id = (u // n_seqs).astype(np.int64)
    seqs = (u % n_seqs).astype(np.int64)

    md = _md(tile_size=32, dense_limit=1)
    mesh = mesh_mod.make_mesh(8)
    got = md._pairs(kmer_id, seqs, n_seqs, mesh=mesh)
    want = _dense_pairs(md, kmer_id, seqs, n_seqs)
    assert got == want


def test_compute_switches_to_tiled(monkeypatch, fixture_dir):
    """End-to-end compute() with a tiny dense_pair_limit must route
    through the tiled path and match the dense result."""
    from signature_kmers_tpu.models import pipeline
    from signature_kmers_tpu.models.matrix_distance import MatrixDistance
    from signature_kmers_tpu.io import fasta

    out = fixture_dir / "_dist_kd"
    if not (out / "kmer_data.npz").exists():
        pipeline.run_build(
            definition_dirs=[fixture_dir / "Annotations"],
            fasta_dirs=[fixture_dir / "Seqs"],
            kmer_data_dir=out, recall=False)
    table, fi = pipeline.load_data_dir(out)
    batch = fasta.SequenceBatch.from_file(
        fixture_dir / "Queries" / "queries.fa")

    md_dense = MatrixDistance(table, fi)
    dense = md_dense.compute([batch])

    cfg = dataclasses.replace(DistanceConfig(), dense_pair_limit=2,
                              tile_size=4)
    md_tiled = MatrixDistance(table, fi, cfg)
    called = {}
    orig = MatrixDistance._pairs_tiled

    def spy(self, *a, **k):
        called["yes"] = True
        return orig(self, *a, **k)

    monkeypatch.setattr(MatrixDistance, "_pairs_tiled", spy)
    tiled = md_tiled.compute([batch])
    assert called.get("yes"), "tiled path was not taken"
    assert tiled.pairs == dense.pairs
    assert tiled.ids == dense.ids


def test_50k_sequences_within_memory():
    """S=50K all-vs-all: the dense accumulator would need 10 GB f32 on
    device + 20 GB int64 host; the tiled path must complete bounded by
    one 8192^2 tile.  Exact vs a per-kmer-set host oracle."""
    rng = np.random.default_rng(50)
    n_seqs = 50_000
    n_kmers = 4096
    # each kmer shared by 2-8 sequences (keeps the oracle cheap)
    ks, ss = [], []
    for k in range(n_kmers):
        members = rng.choice(n_seqs, int(rng.integers(2, 9)), replace=False)
        ks.append(np.full(members.size, k))
        ss.append(members)
    kmer_id = np.concatenate(ks)
    seqs = np.concatenate(ss)

    md = _md(tile_size=8192, dense_limit=16384)
    got = md._pairs(kmer_id, seqs, n_seqs)

    oracle = {}
    for members in ss:
        m = np.sort(members)
        for x in range(m.size):
            for y in range(x + 1, m.size):
                key = (int(m[x]), int(m[y]))
                oracle[key] = oracle.get(key, 0) + 1
    want = sorted((a, b, c) for (a, b), c in oracle.items())
    assert got == want
