"""Opt-in boost-compatible statistics mode (BuildConfig.p2_stats).

The reference computes StoredKmerData mean/median/var through
boost::accumulators (signature_build.tcc:262-279): P-square median
estimator, iterative variance, and a mean whose running sum wraps in the
unsigned-short sample type.  _p2_boost_stats_np replicates those
semantics under a defined insertion order; these tests check it against
a direct scalar transcription of the published P-square algorithm
(Jain & Chhikara 1985) + boost's update formulas, and that the mode only
changes the three statistic columns.
"""

import numpy as np
import pytest

from signature_kmers_tpu.models.signature_builder import (
    _p2_boost_stats_np, _select_np)


def _scalar_p2_median(samples):
    """Direct scalar transcription of the published P-square estimator at
    p=0.5, with the same small-count convention (middle height slot)."""
    q = [0.0] * 5
    n = [0.0] * 5
    desired = [0.0] * 5
    dn = [0.0, 0.25, 0.5, 0.75, 1.0]
    for t, x in enumerate(samples):
        x = float(x)
        if t < 5:
            q[t] = x
            if t == 4:
                q.sort()
                n = [1.0, 2.0, 3.0, 4.0, 5.0]
                desired = [1.0, 2.0, 3.0, 4.0, 5.0]
            continue
        if x < q[0]:
            q[0] = x
            k = 0
        elif x >= q[4]:
            q[4] = x
            k = 3
        else:
            k = 0
            for i in range(4):
                if q[i] <= x:
                    k = i
        for i in range(k + 1, 5):
            n[i] += 1
        for i in range(5):
            desired[i] += dn[i]
        for i in (1, 2, 3):
            d = desired[i] - n[i]
            if (d >= 1 and n[i + 1] - n[i] > 1) \
                    or (d <= -1 and n[i - 1] - n[i] < -1):
                s = 1.0 if d > 0 else -1.0
                qp = q[i] + s / (n[i + 1] - n[i - 1]) * (
                    (n[i] - n[i - 1] + s) * (q[i + 1] - q[i])
                    / (n[i + 1] - n[i])
                    + (n[i + 1] - n[i] - s) * (q[i] - q[i - 1])
                    / (n[i] - n[i - 1]))
                if q[i - 1] < qp < q[i + 1]:
                    q[i] = qp
                else:
                    j = i + int(s)
                    q[i] = q[i] + s * (q[j] - q[i]) / (n[j] - n[i])
                n[i] += s
    return q[2]


def _scalar_boost_stats(samples):
    """Wrapped-sum mean + iterative variance + P-square median, scalar."""
    mean_imm = 0.0
    var = 0.0
    total = 0
    for t, x in enumerate(samples):
        c = t + 1
        mean_imm = (mean_imm * t + float(x)) / c
        if c > 1:
            tmp = float(x) - mean_imm
            var = var * (c - 1) / c + tmp * tmp / (c - 1)
        total += int(x)
    mean = (total % 65536) / len(samples)
    med = _scalar_p2_median(samples)
    if len(samples) < 2:
        var = 0.0
    return (int(mean) & 0xFFFF, int(med) & 0xFFFF, int(var) & 0xFFFF)


class TestP2Vectorized:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_matches_scalar_oracle(self, seed):
        rng = np.random.default_rng(seed)
        sizes = [1, 2, 3, 4, 5, 6, 7, 11, 30, 100, 257]
        groups = [np.sort(rng.integers(20, 1200, s)).astype(np.int64)
                  for s in sizes]
        p_s = np.concatenate(groups)
        cnt = np.asarray(sizes, np.int64)
        sbe = np.concatenate([[0], np.cumsum(cnt)[:-1]])
        m16, md16, v16 = _p2_boost_stats_np(p_s, sbe, cnt)
        for gi, g in enumerate(groups):
            em, emd, ev = _scalar_boost_stats(list(g))
            assert m16[gi] == em, (gi, "mean")
            assert md16[gi] == emd, (gi, "median")
            assert v16[gi] == ev, (gi, "var")

    def test_p2_median_converges(self):
        """On a large sample the P-square estimate must land near the
        exact median (sanity: the estimator tracks the quantile)."""
        rng = np.random.default_rng(9)
        g = np.sort(rng.integers(100, 900, 4000)).astype(np.int64)
        _, md16, _ = _p2_boost_stats_np(
            g, np.asarray([0]), np.asarray([g.shape[0]]))
        exact = float(np.median(g))
        assert abs(int(md16[0]) - exact) <= max(5, 0.02 * exact)

    def test_wrapped_mean(self):
        """The reference's accumulator keeps its sum in unsigned short —
        big groups wrap mod 65536 (signature_build.tcc:262: sample type
        of the accumulator_set)."""
        g = np.full(100, 1000, np.int64)  # sum 100000 -> wraps to 34464
        m16, _, _ = _p2_boost_stats_np(
            g, np.asarray([0]), np.asarray([100]))
        assert int(m16[0]) == (100 * 1000 % 65536) // 100
        assert int(m16[0]) != 1000


class TestP2Selection:
    def test_only_stat_columns_change(self):
        """p2_stats must not affect the kept k-mer set, function_index or
        avg_from_end (the reference's avg_from_end is an exact sorted
        median, signature_build.tcc:280-281)."""
        rng = np.random.default_rng(4)
        n = 6000
        hi = rng.integers(0, 250, n).astype(np.uint32)
        lo = (hi * 31 % 997).astype(np.uint32)
        func = np.where(hi % 3 == 0, (hi % 5).astype(np.int32),
                        rng.integers(0, 5, n).astype(np.int32))
        off = rng.integers(0, 400, n).astype(np.int32)
        plen = rng.integers(50, 900, n).astype(np.int32)
        sid = rng.integers(0, 300, n).astype(np.int32)
        exact, _ = _select_np(hi, lo, func, off, plen, sid, 0.8)
        p2, _ = _select_np(hi, lo, func, off, plen, sid, 0.8, p2_stats=True)
        np.testing.assert_array_equal(exact.hi, p2.hi)
        np.testing.assert_array_equal(exact.lo, p2.lo)
        np.testing.assert_array_equal(exact.function_index,
                                      p2.function_index)
        np.testing.assert_array_equal(exact.avg_from_end, p2.avg_from_end)
        assert len(p2) > 50
        # large groups exist, so the approximate median must differ
        # somewhere while staying plausibly close
        assert (exact.median != p2.median).any() or \
            (exact.var != p2.var).any()

    def test_builder_p2_mode_cli_flag(self, tmp_path):
        """--p2-stats end-to-end: build runs on the host path and final
        kmer set matches the default build's."""
        from tests.fixtures.gen_corpus import generate_corpus

        from signature_kmers_tpu.cli.main import main as cli_main
        from signature_kmers_tpu.io import formats

        root = tmp_path / "corpus"
        root.mkdir()
        generate_corpus(root)
        d1 = tmp_path / "exact"
        d2 = tmp_path / "p2"
        for d, extra in ((d1, []), (d2, ["--p2-stats"])):
            rc = cli_main([
                "build-signatures",
                "-D", str(root / "Annotations"),
                "-F", str(root / "Seqs"),
                "--kmer-data-dir", str(d),
                "--final-kmers", "final.kmers",
                "--no-recall", *extra])
            assert rc == 0
        a = formats.read_final_kmers(d1 / "final.kmers")
        b = formats.read_final_kmers(d2 / "final.kmers")
        np.testing.assert_array_equal(a[0], b[0])  # hi
        np.testing.assert_array_equal(a[1], b[1])  # lo
        np.testing.assert_array_equal(a[2], b[2])  # avg_from_end
        np.testing.assert_array_equal(a[3], b[3])  # function_index
