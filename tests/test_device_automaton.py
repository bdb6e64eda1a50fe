"""Device lax.scan automaton vs the golden Python spec."""

import numpy as np
import pytest

from signature_kmers_tpu.core.config import CallConfig
from signature_kmers_tpu.golden.call import KmerHit, process_hits
from signature_kmers_tpu.ops import automaton

CFG = CallConfig()


def run_both(streams, seq_lens, L=512, cfg=CFG):
    """streams: list of [(pos, func, mean)] per sequence."""
    B = len(streams)
    found = np.zeros((B, L), dtype=bool)
    func = np.zeros((B, L), dtype=np.int32)
    mean = np.zeros((B, L), dtype=np.int32)
    for i, hits in enumerate(streams):
        for p, f, m in hits:
            found[i, p] = True
            func[i, p] = f
            mean[i, p] = m
    out = automaton.device_automaton(
        found, func, mean, np.asarray(seq_lens, np.int32),
        cfg.min_hits, cfg.max_gap, cfg.k,
        mad_floor=cfg.mad_floor, len_window=cfg.len_mad_window)
    out = {k: np.asarray(v) for k, v in out.items()}

    for i, hits in enumerate(streams):
        ghits = [KmerHit(p, 0, f, m, 0, 0) for p, f, m in hits]
        want = process_hits(ghits, float(seq_lens[i]), cfg, hypo_index=-2)
        got_mask = out["call_valid"][i]
        got = [
            (int(out["start"][i, r]), int(out["end"][i, r]),
             int(out["count"][i, r]), int(out["fI"][i, r]),
             int(out["median"][i, r]))
            for r in range(automaton.REC_CAP) if got_mask[r]
        ]
        if out["n_recs"][i] > automaton.REC_CAP:
            continue  # overflow rows go to the host path by design
        assert len(got) == len(want), f"seq {i}: {got} vs {want}"
        for g, w in zip(got, want):
            assert g == (w.start, w.end, w.count, w.function_index,
                         w.protein_length_median), f"seq {i}"
        # MAD values
        mads = [float(out["mad"][i, r])
                for r in range(automaton.REC_CAP) if got_mask[r]]
        for gm, w in zip(mads, want):
            assert gm == pytest.approx(w.protein_length_med_avg_dev,
                                       rel=1e-5)


class TestDeviceAutomaton:
    def test_simple_run(self):
        run_both([[(p, 3, 300) for p in range(0, 50, 10)]], [300])

    def test_varied_means(self):
        run_both([[(p, 3, 280 + p) for p in range(0, 100, 10)]], [300])

    def test_gap_cases(self):
        s1 = [(p, 3, 300) for p in range(0, 50, 10)]
        s1 += [(p, 3, 300) for p in range(300, 360, 10)]
        s2 = [(0, 3, 300), (10, 3, 300)]
        s2 += [(400 + p, 4, 300) for p in range(0, 50, 10)]
        run_both([s1, s2], [300, 300])

    def test_switch_cases(self):
        s1 = [(p, 1, 300) for p in range(0, 50, 10)]
        s1 += [(50 + p, 2, 300) for p in range(10, 60, 10)]
        s2 = [(0, 1, 300), (5, 2, 300), (9, 2, 300)]
        s2 += [(20 + p, 2, 300) for p in range(0, 30, 10)]
        run_both([s1, s2], [300, 300])

    def test_length_window(self):
        hits = [(p, 3, 300) for p in range(0, 50, 10)]
        run_both([hits, hits, hits], [300, 500, 240])

    def test_dense(self):
        run_both([[(p, 2, 300) for p in range(0, 293)]], [300])

    def test_random_streams(self):
        rng = np.random.default_rng(5)
        streams, lens = [], []
        for _ in range(128):
            n = int(rng.integers(0, 80))
            pos = np.sort(rng.choice(500, size=n, replace=False)) if n else []
            streams.append([(int(p), int(rng.integers(0, 4)),
                             int(rng.integers(250, 330))) for p in pos])
            lens.append(int(rng.integers(100, 500)))
        run_both(streams, lens)

    def test_random_sparse_funcs(self):
        rng = np.random.default_rng(6)
        streams, lens = [], []
        for _ in range(128):
            n = int(rng.integers(0, 40))
            pos = np.sort(rng.choice(500, size=n, replace=False)) if n else []
            streams.append([(int(p), int(rng.integers(0, 12)),
                             int(rng.integers(200, 400))) for p in pos])
            lens.append(int(rng.integers(100, 500)))
        run_both(streams, lens)


class TestPackedRecords:
    """pack_records/unpack_records: the 3-word D2H record transfer must be
    an exact round trip, with out-of-range rows flagged for host fallback."""

    def _automaton_out(self, streams, seq_lens, L=512, cfg=CFG):
        B = len(streams)
        found = np.zeros((B, L), dtype=bool)
        func = np.zeros((B, L), dtype=np.int32)
        mean = np.zeros((B, L), dtype=np.int32)
        for i, hits in enumerate(streams):
            for p, f, m in hits:
                found[i, p] = True
                func[i, p] = f
                mean[i, p] = m
        lens = np.asarray(seq_lens, np.int32)
        out = automaton.device_automaton(
            found, func, mean, lens, cfg.min_hits, cfg.max_gap, cfg.k,
            mad_floor=cfg.mad_floor, len_window=cfg.len_mad_window)
        return out, lens

    def test_roundtrip(self):
        rng = np.random.default_rng(11)
        streams, lens = [], []
        for _ in range(64):
            n = int(rng.integers(0, 60))
            pos = np.sort(rng.choice(500, size=n, replace=False)) if n else []
            streams.append([(int(p), int(rng.integers(0, 6)),
                             int(rng.integers(200, 400))) for p in pos])
            lens.append(int(rng.integers(100, 500)))
        out, lens = self._automaton_out(streams, lens)
        import jax
        packed = np.asarray(jax.jit(automaton.pack_records)(out, lens))
        assert packed.shape[1] == automaton.PACKED_WORDS
        got = automaton.unpack_records(packed)
        ref = {k: np.asarray(v) for k, v in out.items()}
        np.testing.assert_array_equal(got["n_recs"], ref["n_recs"])
        v = ref["call_valid"]
        np.testing.assert_array_equal(got["call_valid"], v)
        for k in ("start", "end", "count", "fI", "median", "mad"):
            np.testing.assert_array_equal(got[k][v], ref[k][v], err_msg=k)

    def test_long_sequence_flags_overflow(self):
        # a sequence longer than 65535 residues cannot use 16-bit packed
        # positions; the row must be routed to the exact host fallback
        out, lens = self._automaton_out(
            [[(p, 3, 300) for p in range(0, 50, 10)]], [70000])
        packed = np.asarray(automaton.pack_records(out, lens))
        got = automaton.unpack_records(packed)
        assert got["n_recs"][0] > automaton.REC_CAP

    def test_fractional_mad_floor_flags_overflow(self):
        # a custom mad_floor that is not a multiple of 0.25 cannot be
        # packed exactly; rows with emitted calls must be flagged
        cfg = CallConfig(mad_floor=30.3)
        out, lens = self._automaton_out(
            [[(p, 3, 300) for p in range(0, 50, 10)]], [300], cfg=cfg)
        assert bool(np.asarray(out["call_valid"]).any())
        packed = np.asarray(automaton.pack_records(out, lens))
        got = automaton.unpack_records(packed)
        assert got["n_recs"][0] > automaton.REC_CAP
