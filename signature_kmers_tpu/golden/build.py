"""Golden (oracle) signature build — pure Python/numpy, dict-based.

This is the executable behavioral spec of the build, mirroring the
reference decision-for-decision (ref: signature_build.tcc) with the
documented statistical substitutions (exact median instead of boost's P²
estimator; see FIDELITY.md).  The production path is the device pipeline in
signature_kmers_tpu.models.signature_builder, which is tested against this.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path

import numpy as np

from ..core import alphabet
from ..core.config import BuildConfig
from ..core.function_map import FunctionMap, UNDEFINED_FUNCTION
from ..io import fasta as fasta_io


@dataclasses.dataclass
class KeptKmer:
    """A signature k-mer with its stored statistics
    (ref: kmer_data.h:114-128 StoredKmerData)."""

    avg_from_end: int
    function_index: int
    mean: int
    median: int
    var: int


@dataclasses.dataclass
class BuildStats:
    distinct_signatures: int = 0
    distinct_functions: dict[int, int] = dataclasses.field(default_factory=dict)
    seqs_with_func: dict[int, int] = dataclasses.field(default_factory=dict)
    seqs_with_a_signature: set[int] = dataclasses.field(default_factory=set)


class GoldenSignatureBuilder:
    """Dict-based signature builder.

    kmer key = (hi, lo) packed words; attribute tuples are
    (func_index, offset_from_end, seq_id, protein_length)
    (ref: kmer_data.h:105-112 KmerAttributes; OTU is always undefined in the
    build path).
    """

    def __init__(self, config: BuildConfig = BuildConfig(),
                 kept_log_path=None):
        self.config = config
        self.fm = FunctionMap(kept_log_path)
        self.kmer_attributes: dict[tuple[int, int], list[tuple[int, int, int, int]]] = {}
        self.kept_kmers: dict[tuple[int, int], KeptKmer] = {}
        self.stats = BuildStats()
        self.all_fasta_files: list[Path] = []

    # -- phase 1: metadata -------------------------------------------------

    def load_function_data(self, good_functions, good_roles, definition_files):
        self.fm.add_good_roles(good_roles)
        self.fm.add_good_functions(good_functions)
        for f in definition_files:
            self.fm.load_id_assignments(f)

    def load_fasta(self, fasta_files, keep_functions: bool, deleted_fids: set[str]):
        for f in fasta_files:
            self.fm.load_fasta_file(f, keep_functions, deleted_fids)
            self.all_fasta_files.append(Path(f))

    def process_kept_functions(self, ignored_functions: set[str]):
        self.fm.process_kept_functions(self.config.min_reps_required,
                                       ignored_functions)

    # -- phase 2: k-mer extraction ----------------------------------------

    def extract_kmers(self, deleted_fids: set[str]):
        for file_number, path in enumerate(self.all_fasta_files):
            next_seq_id = file_number * self.config.max_seqs_per_file
            for rec in fasta_io.iter_fasta(path):
                if not rec.id or rec.id in deleted_fids:
                    continue
                next_seq_id = self._load_sequence(next_seq_id, rec.id, rec.seq)

    def _load_sequence(self, next_seq_id: int, seq_id: str, seq: str) -> int:
        """ref: signature_build.tcc:120-181."""
        func = self.fm.lookup_function(seq_id)
        if not func:
            return next_seq_id
        sid = next_seq_id
        next_seq_id += 1
        fidx = self.fm.lookup_index(func)
        if fidx == UNDEFINED_FUNCTION:
            return next_seq_id
        self.stats.seqs_with_func[fidx] = self.stats.seqs_with_func.get(fidx, 0) + 1

        codes = alphabet.encode_seq(seq)
        n = len(codes)
        k = self.config.k
        if n >= k:
            valid = alphabet.CODE_IS_AA[codes]
            # window valid iff all k residues are in the 20-AA set
            # (ref: signature_build.h:102-103, signature_build.tcc:168-175)
            win_ok = np.ones(n - k + 1, dtype=bool)
            for j in range(k):
                win_ok &= valid[j:n - k + 1 + j]
            hi, lo = alphabet.pack_codes_np(codes)
            plen = n
            for pos in np.nonzero(win_ok)[0]:
                # offset = distance from k-mer start to protein end,
                # truncated to uint16 (ref: signature_build.tcc:164)
                off = (plen - int(pos)) & 0xFFFF
                key = (int(hi[pos]), int(lo[pos]))
                self.kmer_attributes.setdefault(key, []).append(
                    (fidx, off, sid, plen))
        return next_seq_id

    # -- phase 3: selection ------------------------------------------------

    def process_kmers(self):
        for key in self.kmer_attributes:
            self._process_kmer_set(key, self.kmer_attributes[key])

    def _process_kmer_set(self, key, attrs):
        """The 80%% rule + per-k-mer statistics (ref: signature_build.tcc:219-293)."""
        func_count: dict[int, int] = {}
        for fidx, _off, _sid, _plen in attrs:
            func_count[fidx] = func_count.get(fidx, 0) + 1

        # top function: highest count, lowest index among ties (the
        # reference iterates an ordered map and replaces only on a strictly
        # greater count, signature_build.tcc:228-248)
        best_func = UNDEFINED_FUNCTION
        best_count = -1
        for fidx in sorted(func_count):
            if best_func == UNDEFINED_FUNCTION or func_count[fidx] > best_count:
                best_func = fidx
                best_count = func_count[fidx]

        total = len(attrs)
        # float32 compare exactly as the reference does (signature_build.tcc:250-257)
        if np.float32(best_count) < np.float32(total) * np.float32(0.8):
            return

        lengths = []
        offsets = []
        for fidx, off, sid, plen in attrs:
            if fidx == best_func:
                lengths.append(plen)
            offsets.append(off)
            self.stats.seqs_with_a_signature.add(sid)

        # exact statistics over best-function protein lengths (spec; the
        # reference uses boost::accumulators with a P² median,
        # signature_build.tcc:262-279)
        n = len(lengths)
        s = sum(lengths)
        mean_exact = s / n
        mean_u16 = (s // n) & 0xFFFF           # trunc toward zero, positive
        lv = sorted(lengths)
        if n % 2:
            median = float(lv[n // 2])
        else:
            median = (lv[n // 2 - 1] + lv[n // 2]) / 2.0
        median_u16 = int(median) & 0xFFFF
        var = sum((x - mean_exact) ** 2 for x in lengths) / n
        var_u16 = int(var) & 0xFFFF            # uint16 wrap on overflow

        # avg_from_end = upper median of ALL offsets (signature_build.tcc:281-282)
        offs = sorted(offsets)
        avg_from_end = offs[len(offs) // 2]

        self.stats.distinct_signatures += 1
        self.stats.distinct_functions[best_func] = \
            self.stats.distinct_functions.get(best_func, 0) + 1
        self.kept_kmers[key] = KeptKmer(avg_from_end, best_func,
                                        mean_u16, median_u16, var_u16)

    # -- convenient views --------------------------------------------------

    def kept_arrays(self):
        """Sorted arrays (hi, lo, avg_from_end, function_index, mean, median, var)."""
        keys = sorted(self.kept_kmers)
        n = len(keys)
        hi = np.zeros(n, dtype=np.uint32)
        lo = np.zeros(n, dtype=np.uint32)
        fields = np.zeros((n, 5), dtype=np.uint16)
        for i, key in enumerate(keys):
            kk = self.kept_kmers[key]
            hi[i], lo[i] = key
            fields[i] = (kk.avg_from_end, kk.function_index,
                         kk.mean, kk.median, kk.var)
        return hi, lo, fields[:, 0], fields[:, 1], fields[:, 2], fields[:, 3], fields[:, 4]
