"""--host-only build: same artifacts as the device build, byte for byte.

The CLI advertises --host-only (cli/main.py); this exercises the numpy
selection twin (_extract_windows_np + _select_np) end to end against the
device pipeline on the shared fixture corpus.
"""

import filecmp

import numpy as np
import pytest

from signature_kmers_tpu.cli.main import main as cli_main


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    from tests.fixtures.gen_corpus import generate_corpus

    root = tmp_path_factory.mktemp("corpus_hostonly")
    generate_corpus(root)
    return root


def _build(corpus, out, *extra):
    rc = cli_main([
        "build-signatures",
        "-D", str(corpus / "Annotations"),
        "-F", str(corpus / "Seqs"),
        "--kmer-data-dir", str(out),
        "--final-kmers", "final.kmers",
        *extra,
    ])
    assert rc == 0


def test_host_only_matches_device(corpus, tmp_path):
    dev = tmp_path / "dev"
    host = tmp_path / "host"
    _build(corpus, dev)
    _build(corpus, host, "--host-only")

    # text artifacts byte-identical
    for name in ("function.index", "final.kmers", "distinct_functions"):
        assert filecmp.cmp(dev / name, host / name, shallow=False), name

    # recall reports identical (host-only recall runs the host caller)
    dev_reports = sorted(p.name for p in (dev / "recall.report.d").iterdir())
    host_reports = sorted(p.name for p in (host / "recall.report.d").iterdir())
    assert dev_reports == host_reports
    for name in dev_reports:
        assert filecmp.cmp(dev / "recall.report.d" / name,
                           host / "recall.report.d" / name,
                           shallow=False), name

    # the stored table carries identical kept entries
    dz = np.load(dev / "kmer_data.npz")
    hz = np.load(host / "kmer_data.npz")
    assert sorted(dz.files) == sorted(hz.files)
    for f in dz.files:
        np.testing.assert_array_equal(dz[f], hz[f], err_msg=f)


def test_select_np_matches_device_select():
    """Direct differential check of _select_np vs the device pass on a
    random window set (same entry point the fuzz tests drive)."""
    from signature_kmers_tpu.core.config import BuildConfig
    from signature_kmers_tpu.models.signature_builder import SignatureBuilder

    rng = np.random.default_rng(7)
    n = 5000
    # small key space so groups have many entries
    hi = rng.integers(0, 50, n).astype(np.uint32)
    lo = rng.integers(0, 8, n).astype(np.uint32)
    func = rng.integers(0, 6, n).astype(np.int32)
    off = rng.integers(0, 400, n).astype(np.int32)
    plen = rng.integers(50, 900, n).astype(np.int32)
    sid = rng.integers(0, 300, n).astype(np.int32)

    dev_b = SignatureBuilder(BuildConfig(), use_device=True)
    host_b = SignatureBuilder(BuildConfig(), use_device=False)
    d = dev_b._select(hi, lo, func, off, plen, sid)
    h = host_b._select(hi, lo, func, off, plen, sid)

    np.testing.assert_array_equal(d.hi, h.hi)
    np.testing.assert_array_equal(d.lo, h.lo)
    np.testing.assert_array_equal(d.function_index, h.function_index)
    np.testing.assert_array_equal(d.avg_from_end, h.avg_from_end)
    np.testing.assert_array_equal(d.mean, h.mean)
    np.testing.assert_array_equal(d.median, h.median)
    np.testing.assert_array_equal(d.var, h.var)
    assert dev_b.stats.distinct_signatures == host_b.stats.distinct_signatures
    assert dev_b.stats.distinct_functions == host_b.stats.distinct_functions
    assert (dev_b.stats.seqs_with_a_signature
            == host_b.stats.seqs_with_a_signature)
