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


def sharded_score_cutoff(mesh, local_scores, k: int = 2,
                         n_bins: int = 4096) -> float:
    """Natural-breaks cutoff over dp-sharded score arrays.

    Each shard histograms its scores; histograms merge with a psum over
    the mesh (one small collective instead of gathering raw scores), and
    the breaks run on the merged (bin-center, count) pairs.  This is the
    collective replacement for merging per-job score files by hand."""
    import jax
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    local_scores = np.asarray(local_scores, dtype=np.float32)
    ndp = mesh.shape["dp"]
    pad = (-local_scores.shape[0]) % ndp
    if pad:
        local_scores = np.concatenate(
            [local_scores, np.full(pad, np.nan, np.float32)])
    gmin = float(np.nanmin(local_scores)) if local_scores.size else 0.0
    gmax = float(np.nanmax(local_scores)) if local_scores.size else 1.0
    if gmax <= gmin:
        return gmin
    edges = np.linspace(gmin, gmax, n_bins + 1).astype(np.float32)

    def shard_fn(x):
        ok = ~jnp.isnan(x)
        idx = jnp.clip(((x - gmin) / (gmax - gmin) * n_bins).astype(jnp.int32),
                       0, n_bins - 1)
        hist = jnp.zeros((n_bins,), jnp.int32).at[idx].add(
            ok.astype(jnp.int32), mode="drop")
        # scores are sharded over dp only (replicated over tp)
        return jax.lax.psum(hist, "dp")

    fn = shard_map(shard_fn, mesh=mesh, in_specs=P("dp"),
                   out_specs=P())
    hist = np.asarray(fn(jnp.asarray(local_scores)))
    centers = (edges[:-1] + edges[1:]) / 2
    nz = hist > 0
    if not nz.any():
        return gmin
    # weighted Jenks over (center, count) pairs
    v = centers[nz]
    w = hist[nz].astype(np.int64)
    # run the exact DP on value-count pairs directly
    cw = np.concatenate([[0.0], np.cumsum(w)])
    cwv = np.concatenate([[0.0], np.cumsum(w * v)])
    cwv2 = np.concatenate([[0.0], np.cumsum(w * v * v)])

    def ssm(i, j):
        W = cw[j + 1] - cw[i]
        S = cwv[j + 1] - cwv[i]
        S2 = cwv2[j + 1] - cwv2[i]
        return S2 - S * S / W

    m = v.shape[0]
    k = min(k, m)
    if k <= 1:
        return float(v[0])
    INF = float("inf")
    dp = np.full((k, m), INF)
    back = np.zeros((k, m), dtype=np.int64)
    for j in range(m):
        dp[0][j] = ssm(0, j)
    for c in range(1, k):
        for j in range(c, m):
            best, arg = INF, c
            for s in range(c, j + 1):
                cost = dp[c - 1][s - 1] + ssm(s, j)
                if cost < best:
                    best, arg = cost, s
            dp[c][j] = best
            back[c][j] = arg
    j = m - 1
    breaks = [0] * k
    for c in range(k - 1, 0, -1):
        s = int(back[c][j])
        breaks[c] = s
        j = s - 1
    return float(v[breaks[-1]])
