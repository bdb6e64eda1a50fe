"""Golden (oracle) matrix distance — shared-signature-k-mer pair counts.

Executable spec of MatrixDistance (ref: matrix_distance.h:45-170,
kmers-matrix-distance.cc:94-212).  Row order: the reference iterates
unordered maps (nondeterministic); sorted (idx1, idx2) is our canonical
spec, with idx = sequence order of first appearance.
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np

from ..core import alphabet
from ..core.config import DistanceConfig
from .call import GoldenFunctionCaller, valid_call_windows


@dataclasses.dataclass
class DistanceResult:
    ids: list[str]                      # idx -> sequence id
    prot_sizes: dict[str, int]
    pairs: list[tuple[int, int, int]]   # (idx1, idx2, count), idx1 < idx2

    def rows(self, with_score: bool):
        for i1, i2, count in self.pairs:
            s1, s2 = self.ids[i1], self.ids[i2]
            if with_score:
                score = count / (self.prot_sizes[s1] + self.prot_sizes[s2])
                yield s1, s2, count, score
            else:
                yield s1, s2, count


def length_filter_ok(seqlen: float, mean: int, var: int,
                     config: DistanceConfig) -> bool:
    """Hit length filter (ref: matrix_distance.h:63-78): reject when seqlen
    is outside mean +/- 2*stddev, with stddev = 0.1*seqlen when var == 0."""
    if var == 0:
        stddev = seqlen * config.zero_var_len_frac
    else:
        stddev = math.sqrt(float(var))
    lo = mean - stddev * config.len_sigma_window
    hi = mean + stddev * config.len_sigma_window
    return lo <= seqlen <= hi


def compute_distance(caller: GoldenFunctionCaller, batches,
                     config: DistanceConfig = DistanceConfig()) -> DistanceResult:
    """batches: iterable of SequenceBatch (one per input file).

    ignore_hypothetical is forced on (ref: matrix_distance.h:88,
    kmers-matrix-distance.cc:164).
    """
    kmer_hit_map: dict[tuple[int, int], set[int]] = {}
    ids: list[str] = []
    id_to_idx: dict[str, int] = {}
    prot_sizes: dict[str, int] = {}
    hypo = caller.hypo_index

    for batch in batches:
        for i in range(len(batch)):
            sid = batch.ids[i]
            if sid in id_to_idx:
                idx = id_to_idx[sid]
            else:
                idx = len(ids)
                id_to_idx[sid] = idx
                ids.append(sid)
            codes = batch.codes[batch.offsets[i]:batch.offsets[i + 1]]
            seqlen = float(codes.shape[0])
            prot_sizes[sid] = codes.shape[0]
            hi, lo = alphabet.pack_codes_np(codes)
            ok = valid_call_windows(codes, config.k)
            for pos in np.nonzero(ok)[0]:
                key = (int(hi[pos]), int(lo[pos]))
                kd = caller.fetch(key)
                if kd is None:
                    continue
                if kd.function_index == hypo:
                    continue  # ignore_hypothetical forced on
                if not length_filter_ok(seqlen, kd.mean, kd.var, config):
                    continue
                kmer_hit_map.setdefault(key, set()).add(idx)

    pair_counts: dict[tuple[int, int], int] = {}
    for key, idset in kmer_hit_map.items():
        members = sorted(idset)
        for a in range(len(members)):
            for b in range(a + 1, len(members)):
                p = (members[a], members[b])
                pair_counts[p] = pair_counts.get(p, 0) + 1

    pairs = [(i1, i2, c) for (i1, i2), c in sorted(pair_counts.items())]
    return DistanceResult(ids=ids, prot_sizes=prot_sizes, pairs=pairs)
