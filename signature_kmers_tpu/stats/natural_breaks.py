"""Jenks-Fisher natural-breaks classification.

The reference vendors a Fisher natural-breaks implementation
(ref: calc_natural_breaks.h) which is dead code — included only by
kmers-matrix-distance.cc with no call sites.  BASELINE.json names it as
part of the method, so this framework implements it as the evidently
intended tool: choosing score cutoffs on distance/score distributions.

Exact O(k * m^2) dynamic program over value-count pairs (inputs here are
small: distance-score histograms).  Minimizes within-class sum of squared
deviations.
"""

from __future__ import annotations

import numpy as np


def value_count_pairs(values) -> tuple[np.ndarray, np.ndarray]:
    """Collapse raw values into sorted (value, count) pairs
    (ref: calc_natural_breaks.h:195-315)."""
    v = np.sort(np.asarray(values, dtype=np.float64))
    uniq, counts = np.unique(v, return_counts=True)
    return uniq, counts.astype(np.int64)


def classify_jenks_fisher(values, k: int) -> list[float]:
    """Return the k lower break bounds (first is the minimum value),
    mirroring ClassifyJenksFisherFromValueCountPairs semantics
    (ref: calc_natural_breaks.h:317-349)."""
    v, w = value_count_pairs(values)
    m = v.shape[0]
    if m == 0:
        return []
    k = min(k, m)
    if k <= 1:
        return [float(v[0])]

    # prefix sums for O(1) SSM of any interval
    cw = np.concatenate([[0.0], np.cumsum(w)])
    cwv = np.concatenate([[0.0], np.cumsum(w * v)])
    cwv2 = np.concatenate([[0.0], np.cumsum(w * v * v)])

    def ssm(i, j):
        """weighted sum of squared deviations of values[i..j] inclusive."""
        W = cw[j + 1] - cw[i]
        S = cwv[j + 1] - cwv[i]
        S2 = cwv2[j + 1] - cwv2[i]
        return S2 - S * S / W

    INF = float("inf")
    # dp[c][j] = min cost of splitting values[0..j] into c+1 classes
    dp = np.full((k, m), INF)
    back = np.zeros((k, m), dtype=np.int64)
    for j in range(m):
        dp[0][j] = ssm(0, j)
    for c in range(1, k):
        for j in range(c, m):
            best = INF
            arg = c
            for s in range(c, j + 1):
                cost = dp[c - 1][s - 1] + ssm(s, j)
                if cost < best:
                    best = cost
                    arg = s
            dp[c][j] = best
            back[c][j] = arg

    # recover break start indices
    breaks = [0] * k
    j = m - 1
    for c in range(k - 1, 0, -1):
        s = int(back[c][j])
        breaks[c] = s
        j = s - 1
    breaks[0] = 0
    return [float(v[b]) for b in breaks]


def score_cutoff(scores, k: int = 2) -> float:
    """Two-class natural break on a score distribution -> cutoff value."""
    b = classify_jenks_fisher(scores, k)
    return b[-1] if b else 0.0
