"""ops/segscan.py: segmented log-doubling scans vs a numpy oracle."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from signature_kmers_tpu.ops import segscan  # noqa: E402


def _oracle(op, start, x, reverse):
    n = len(x)
    out = np.empty_like(x)
    # segment extents
    seg_of = np.cumsum(start) - 1
    for i in range(n):
        if reverse:
            js = [j for j in range(i, n) if seg_of[j] == seg_of[i]]
        else:
            js = [j for j in range(0, i + 1) if seg_of[j] == seg_of[i]]
        acc = x[js[0]]
        for j in js[1:]:
            acc = op(acc, x[j])
        out[i] = acc
    return out


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("reverse", [False, True])
def test_seg_scan_matches_oracle(seed, reverse):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(1, 400))
    start = rng.random(n) < 0.25
    start[0] = True
    x = rng.integers(-1000, 1000, n).astype(np.int32)
    y = rng.integers(-1000, 1000, n).astype(np.int32)

    got_sum, got_min = segscan.seg_scan(
        (jnp.add, jnp.minimum), jnp.asarray(start),
        jnp.asarray(x), jnp.asarray(y), reverse=reverse)
    np.testing.assert_array_equal(
        np.asarray(got_sum), _oracle(lambda a, b: a + b, start, x, reverse))
    np.testing.assert_array_equal(
        np.asarray(got_min), _oracle(min, start, y, reverse))


def test_seg_bcast_full_segment():
    rng = np.random.default_rng(3)
    n = 257
    start = rng.random(n) < 0.1
    start[0] = True
    x = rng.integers(0, 10_000, n).astype(np.int32)
    got = np.asarray(segscan.seg_bcast(jnp.maximum, jnp.asarray(start),
                                       jnp.asarray(x)))
    seg_of = np.cumsum(start) - 1
    want = np.array([x[seg_of == seg_of[i]].max() for i in range(n)])
    np.testing.assert_array_equal(got, want)


def test_seg_scan_int32_wraparound_sums():
    # segment sums must be exact even when the running values wrap
    start = np.zeros(8, bool)
    start[0] = start[4] = True
    x = np.full(8, 2**30, np.int32)
    (got,) = segscan.seg_scan((jnp.add,), jnp.asarray(start),
                              jnp.asarray(x))
    # within-segment prefix sums wrap like int32 two's complement
    want = np.cumsum(np.asarray([2**30] * 4, np.int64)) \
        .astype(np.int64).view(np.int64)
    want = (want & 0xFFFFFFFF).astype(np.uint32).astype(np.int64)
    got4 = np.asarray(got[:4]).astype(np.int64) & 0xFFFFFFFF
    np.testing.assert_array_equal(got4, want & 0xFFFFFFFF)


def test_run_starts():
    hi = jnp.asarray(np.array([1, 1, 1, 2, 2, 3], np.uint32))
    lo = jnp.asarray(np.array([5, 5, 6, 6, 6, 6], np.uint32))
    got = np.asarray(segscan.run_starts((hi, lo)))
    np.testing.assert_array_equal(got, [True, False, True, True, False, True])
