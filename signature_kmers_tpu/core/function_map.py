"""Function metadata management: assignments, genome evidence, keep policy.

Host-side (string-heavy, tiny) equivalent of the reference FunctionMap
(ref: function_map.h:44-465).  Behavior is replicated decision-for-decision;
statistics use exact arithmetic instead of boost::accumulators' P² median
estimator (see FIDELITY.md).
"""

from __future__ import annotations

import math
import re
from pathlib import Path
from typing import Iterable

from . import seed
from ..io import fasta as fasta_io

UNDEFINED_FUNCTION = 0xFFFF  # ref: kmer_data.h:23

_GENOME_RE = re.compile(r"\s+(.*)\s+\[([^]]+)\]\Z", re.DOTALL)       # ref: function_map.h:122
_FIGID_RE = re.compile(r"fig\|(\d+\.\d+)")                            # ref: function_map.h:123
_GENOME_ID_RE = re.compile(r"\d+\.\d+\Z")                             # ref: function_map.h:124


def exact_median(values) -> float:
    """Exact median; even count averages the two middle elements."""
    v = sorted(values)
    n = len(v)
    if n == 0:
        return 0.0
    if n % 2:
        return float(v[n // 2])
    return (float(v[n // 2 - 1]) + float(v[n // 2])) / 2.0


class FunctionMap:
    """id->function assignments plus function->genome evidence."""

    def __init__(self, kept_log_path: str | Path | None = None):
        self.function_genome_map: dict[str, set[str]] = {}
        self.id_function_map: dict[str, str] = {}
        self.function_index_map: dict[str, int] = {}
        self.index_function_map: dict[int, str] = {}
        self.good_roles: set[str] = set()
        self.good_functions: set[str] = set()
        self.original_assignment: dict[str, str] = {}
        self.original_assignment_stripped: dict[str, str] = {}
        # per-function protein lengths for function.index stats
        self.function_lengths: dict[str, list[int]] = {}
        self._kept_log = open(kept_log_path, "w") if kept_log_path else None

    # -- loading -----------------------------------------------------------

    def add_good_roles(self, roles: Iterable[str]) -> None:
        self.good_roles.update(roles)

    def add_good_functions(self, funcs: Iterable[str]) -> None:
        self.good_functions.update(funcs)

    def load_id_assignments(self, path: str | Path) -> None:
        """Tab-delimited id\tfunction files (ref: function_map.h:62-104).

        Truncation comments ('# trunc...' etc. with a single '#') record the
        original assignment but leave the id unassigned.
        """
        with open(path, "r", encoding="latin-1") as fh:
            for lineno, line in enumerate(fh, 1):
                line = line.rstrip("\n")
                if "\t" not in line:
                    continue
                first, rest = line.split("\t", 1)
                func = rest.split("\t", 1)[0]
                stripped, delim, comment = seed.split_func_comment(func)
                self.original_assignment_stripped[first] = stripped
                self.original_assignment[first] = func
                if delim == "#" and seed.is_truncated_comment(comment):
                    continue
                self.id_function_map[first] = stripped

    def load_fasta_file(self, path: str | Path, keep_function_flag: bool,
                        deleted_fids: set[str]) -> None:
        """Scan a per-genome FASTA for assignments + genome evidence
        (ref: function_map.h:120-238)."""
        genome = ""
        batch = fasta_io.read_fasta_batch(path)
        lengths = batch.lengths
        for i in range(len(batch)):
            rec = fasta_io.FastaRecord(batch.ids[i], batch.deflines[i], "")
            seq_len = int(lengths[i])
            if not rec.id or rec.id in deleted_fids:
                continue
            func = ""
            if rec.defline:
                m2 = re.search(r"[^ \t]", rec.defline)
                func = rec.defline[m2.start():] if m2 else ""
            genome_loc = ""
            m = _GENOME_RE.match(rec.defline)
            if m:
                stripped, delim, comment = seed.split_func_comment(m.group(1))
                if delim == "#" and seed.is_truncated_comment(comment):
                    continue  # skip truncated proteins entirely
                func = stripped
                genome_loc = m.group(2)
            if not genome:
                if not rec.defline:
                    fm = _FIGID_RE.search(rec.id)
                    if fm:
                        genome = fm.group(1)
                elif genome_loc:
                    genome = genome_loc
            if not genome:
                genome = Path(path).name  # default to filename
                # (reference warns when it does not look like an id,
                # function_map.h:189-192)

            # explicit assignment files override fasta deflines
            cur_func = self.id_function_map.get(rec.id, "")
            if not cur_func:
                if func:
                    self.id_function_map[rec.id] = func
            else:
                func = cur_func

            if func:
                self.function_genome_map.setdefault(func, set()).add(genome)
                if keep_function_flag:
                    self.good_functions.add(func)
                self.function_lengths.setdefault(func, []).append(seq_len)

    # -- keep policy -------------------------------------------------------

    def process_kept_functions(self, min_reps_required: int,
                               ignored_functions: set[str]) -> None:
        """Decide kept functions and assign sequential indices
        (ref: function_map.h:257-332)."""
        kept: set[str] = set()
        log = self._kept_log
        for function in sorted(self.function_genome_map):
            genomes = self.function_genome_map[function]
            n_genomes = len(genomes)
            if log:
                log.write(f"{function}: {n_genomes} genomes\n")
            ok = False
            if n_genomes >= min_reps_required:
                if log:
                    log.write(f"Keeping {function}: enough genomes\n")
                ok = True
            elif function in self.good_functions:
                if log:
                    log.write(f"Keeping {function}: in good functions list\n")
                ok = True
            else:
                if log:
                    log.write(f"Role check {function}:\n")
                for role in seed.roles_of_function(function):
                    if role in self.good_roles:
                        if log:
                            log.write(f"  Keeping {function}: {role} in good roles list\n")
                        ok = True
                        break
                    elif log:
                        log.write(f"  {function}: {role} not in list\n")
                if not ok and log:
                    log.write(f"Reject {function}\n")
            if ok:
                kept.add(function)

        kept.add("hypothetical protein")  # always present, function_map.h:310
        for fn in ignored_functions:
            kept.discard(fn)

        # Sequential ids in sorted order (std::set iteration order).
        for i, f in enumerate(sorted(kept)):
            self.function_index_map[f] = i
            self.index_function_map[i] = f

    # -- lookups -----------------------------------------------------------

    def lookup_function(self, id_or_index) -> str:
        if isinstance(id_or_index, int):
            return self.index_function_map.get(id_or_index, "")
        return self.id_function_map.get(id_or_index, "")

    def lookup_index(self, func: str) -> int:
        return self.function_index_map.get(func, UNDEFINED_FUNCTION)

    def lookup_original_assignment(self, seq_id: str) -> tuple[str, str]:
        return (self.original_assignment.get(seq_id, ""),
                self.original_assignment_stripped.get(seq_id, ""))

    def dump(self, path="fm.dump") -> None:
        """Debug dump of the genome-evidence and assignment maps
        (ref: function_map.h:334-349)."""
        with open(path, "w", encoding="latin-1") as of:
            of.write("function_genome_map\n")
            for func in sorted(self.function_genome_map):
                of.write(func + ":")
                for g in sorted(self.function_genome_map[func]):
                    of.write(" " + g)
                of.write("\n")
            of.write("id_function_map\n")
            for fid in sorted(self.id_function_map):
                of.write(f"{fid} '{self.id_function_map[fid]}'\n")

    # -- outputs -----------------------------------------------------------

    def function_index_rows(self):
        """Rows for function.index with exact count/mean/median/var/stddev
        (ref: function_map.h:389-411; exact stats are our spec)."""
        rows = []
        for idx in sorted(self.index_function_map):
            func = self.index_function_map[idx]
            lengths = self.function_lengths.get(func, [])
            n = len(lengths)
            if n:
                mean = sum(lengths) / n
                median = exact_median(lengths)
                var = sum((x - mean) ** 2 for x in lengths) / n
                dev = math.sqrt(var)
            else:
                mean = median = var = dev = 0.0
            rows.append((idx, func, n, mean, median, var, dev))
        return rows

    def close(self) -> None:
        if self._kept_log:
            self._kept_log.close()
            self._kept_log = None
