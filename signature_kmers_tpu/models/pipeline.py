"""End-to-end build orchestration: metadata -> build -> artifacts -> recall.

Mirrors the kmers-build-signatures main flow (ref:
kmers-build-signatures.cc:126-372): writes function.index, stub otu.index /
genomes, distinct_functions, final.kmers, the signature table (the
NuDB/CMPH replacement at <data-dir>/kmer_data.{npz,json}), and the recall
self-check reports under recall.report.d/.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path

import numpy as np

from ..core.config import Config
from ..io import formats
from ..models.function_caller import FunctionCaller
from ..models.signature_builder import KeptKmerArrays, SignatureBuilder
from ..table import KmerTableProtocol
from ..table.bucket_table import BucketKmerTable
from ..table.kmer_table import KmerTable
from ..utils import paths


class _BgTask:
    """Overlapped artifact write on a background thread.

    join() re-raises the thread's exception — a silent ENOSPC in an
    overlapped final.kmers/table write must fail the build, not let the
    CLI exit 0 with a missing or truncated artifact."""

    def __init__(self, fn, name: str):
        import threading

        self._exc: BaseException | None = None

        def run():
            try:
                fn()
            except BaseException as e:  # noqa: BLE001 — re-raised at join
                self._exc = e

        self._t = threading.Thread(target=run, name=name, daemon=True)
        self._t.start()

    def join(self, reraise: bool = True) -> None:
        self._t.join()
        if reraise and self._exc is not None:
            raise self._exc


@dataclasses.dataclass
class BuildResult:
    builder: SignatureBuilder
    kept: KeptKmerArrays
    table: "KmerTableProtocol"  # the configured layout (table/__init__.py)
    function_index: list[str]
    kmer_data_dir: Path | None


def run_build(
    definition_dirs=(),
    fasta_dirs=(),
    fasta_keep_dirs=(),
    good_functions=(),
    good_roles=(),
    deleted_fids_file=None,
    ignored_functions_file=None,
    kmer_data_dir=None,
    final_kmers=None,
    write_table: bool = True,
    recall: bool = True,
    kept_log=None,
    config: Config = Config(),
    use_device: bool = True,
    checkpoint: bool = False,
    mesh=None,
    nudb_file=None,
    perfect_hash=None,
    perfect_hash_data=None,
    otu_file=None,
) -> BuildResult:
    import contextlib
    import os
    import sys
    import time

    if os.environ.get("SKT_BUILD_TIMING"):
        @contextlib.contextmanager
        def _phase(name):
            t0 = time.perf_counter()
            yield
            print(f"[build-timing] {name}: "
                  f"{time.perf_counter() - t0:.1f}s",
                  file=sys.stderr, flush=True)
    else:
        @contextlib.contextmanager
        def _phase(name):
            yield

    builder = SignatureBuilder(config.build, kept_log, use_device=use_device)

    definition_files = paths.populate_path_list(definition_dirs)
    fasta_files = paths.populate_path_list(fasta_dirs)
    fasta_keep_files = paths.populate_path_list(fasta_keep_dirs)

    with _phase("load_function_data"):
        builder.load_function_data(list(good_functions), list(good_roles),
                                   definition_files)
    deleted = paths.load_set_from_file(deleted_fids_file)
    ignored = paths.load_set_from_file(ignored_functions_file)

    if kmer_data_dir:
        kmer_data_dir = Path(kmer_data_dir)
        paths.ensure_directory(kmer_data_dir)

    with _phase("load_fasta"):
        builder.load_fasta(fasta_files, False, deleted)
        builder.load_fasta(fasta_keep_files, True, deleted)
    with _phase("process_kept_functions"):
        builder.process_kept_functions(ignored)

    function_index = [builder.fm.index_function_map[i]
                      for i in sorted(builder.fm.index_function_map)]

    if kmer_data_dir:
        formats.write_function_index(kmer_data_dir / "function.index",
                                     builder.fm.function_index_rows())
        # stub artifacts for pipeline compatibility
        # (ref: kmers-build-signatures.cc:184-191).  otu.index becomes a
        # real catalog when OTU metadata is supplied (setup-build
        # --otu-reps writes the `otus` artifact; --otu-file feeds it in).
        otus = formats.read_otu_sets(otu_file) if otu_file else []
        if otus:
            formats.write_otu_index(kmer_data_dir / "otu.index", otus)
        else:
            (kmer_data_dir / "otu.index").write_text("")
        (kmer_data_dir / "genomes").write_text("empty genomes\n")

    ckpt_dir = (kmer_data_dir / "build.ckpt.d"
                if (checkpoint and kmer_data_dir) else None)
    with _phase("extract_kmers"):
        builder.extract_kmers(deleted, checkpoint_dir=ckpt_dir)
    with _phase("process_kmers(select+fetch)"):
        kept = builder.process_kmers(mesh=mesh)

    if kmer_data_dir:
        # distinct_functions table (ref: kmers-build-signatures.cc:230-236)
        rows = [f"{fi}\t{builder.fm.lookup_function(int(fi))}\t{cnt}"
                for fi, cnt in sorted(builder.stats.distinct_functions.items())]
        formats.write_lines(kmer_data_dir / "distinct_functions", rows)

    # overlap the final.kmers text dump with the table placement — the
    # reference does the same with a std::thread (kmers-build-signatures
    # .cc:198-222 runs the dump while the main thread continues); the
    # native writer and the native placement both release the GIL
    fk_thread = None
    if final_kmers and kmer_data_dir:
        fk = Path(final_kmers)
        if not fk.is_absolute():
            fk = kmer_data_dir / fk

        def _write_fk():
            with _phase("final.kmers write (overlapped)"):
                formats.write_final_kmers(
                    fk, kept.hi, kept.lo, kept.avg_from_end,
                    kept.function_index)

        fk_thread = _BgTask(_write_fk, "final-kmers-write")

    save_thread = None
    try:
        with _phase("table build (placement)"):
            table = kept.to_table(config.table)
        if write_table and kmer_data_dir:
            from ..table.wide_table import WideKmerTable

            entries = None
            if isinstance(table, WideKmerTable):
                # the compact store is exactly the entry arrays we still
                # hold — skip occupied()'s inverse-permute + 45M lexsort
                v0, v1, v2 = KmerTable.pack_values(
                    kept.avg_from_end, kept.function_index, kept.mean,
                    kept.median, kept.var)
                entries = (kept.hi, kept.lo, v0.astype(np.uint32),
                           v1.astype(np.uint32), v2.astype(np.uint32))

            def _save():
                with _phase("table save (overlapped)"):
                    if entries is not None:
                        table.save(kmer_data_dir / "kmer_data",
                                   entries=entries)
                    else:
                        table.save(kmer_data_dir / "kmer_data")

            if recall:
                # disk write overlaps the recall pass (device/link-bound)
                save_thread = _BgTask(_save, "table-save")
            else:
                _save()
        if fk_thread is not None:
            fk_thread.join()  # re-raises a failed final.kmers write

        def _resolve(p):
            p = Path(p)
            if not p.is_absolute() and kmer_data_dir:
                p = kmer_data_dir / p
            return p

        if nudb_file:
            # real NuDB .dat/.key pair, fetchable by the reference
            # binaries (ref: kmers-build-signatures.cc:351-355,
            # nudb_kmer_db.h:55-63)
            from ..interop import cmph as cmph_io, nudb as nudb_io

            keys = cmph_io.keys_from_packed(kept.hi, kept.lo)
            vals = np.zeros(len(kept), dtype=cmph_io.STORED_KMER_DTYPE)
            vals["avg_from_end"] = kept.avg_from_end
            vals["function_index"] = kept.function_index
            vals["mean"] = kept.mean
            vals["median"] = kept.median
            vals["var"] = kept.var
            nudb_io.write_nudb(_resolve(nudb_file), keys,
                               vals.view(np.uint8).reshape(len(kept), -1))
        if perfect_hash:
            # real CMPH BDZ .mph + flat StoredKmerData array
            # (ref: kmers-build-signatures.cc:253-264, perfect_hash.h:11-69)
            from ..interop import cmph as cmph_io

            mph_path = _resolve(perfect_hash)
            dat_path = (_resolve(perfect_hash_data) if perfect_hash_data
                        else Path(str(mph_path) + ".data"))
            cmph_io.write_cmph_files(
                mph_path, dat_path, kept.hi, kept.lo, kept.avg_from_end,
                kept.function_index, kept.mean, kept.median, kept.var)

        if recall and kmer_data_dir:
            with _phase("recall"):
                _run_recall(builder, table, function_index, kmer_data_dir,
                            config)
        if save_thread is not None:
            save_thread.join()  # re-raises a failed table save
    finally:
        # error path: wait for the overlapped writers (a daemon thread
        # killed at interpreter exit leaves a truncated artifact) without
        # masking the in-flight exception
        if fk_thread is not None:
            fk_thread.join(reraise=False)
        if save_thread is not None:
            save_thread.join(reraise=False)

    return BuildResult(builder, kept, table, function_index,
                       kmer_data_dir)


def _run_recall(builder: SignatureBuilder, table: KmerTableProtocol,
                function_index: list[str], kmer_data_dir: Path,
                config: Config) -> None:
    """Re-call every training protein against the fresh table; write
    per-file mismatch reports (ref: kmers-build-signatures.cc:240-349)."""
    report_dir = kmer_data_dir / "recall.report.d"
    paths.ensure_directory(report_dir)
    import dataclasses

    # production-size device chunks: recall re-calls the whole training
    # set, and each dispatch pays the link RTT — 256-seq chunks cost
    # ~1200 round trips at 300K seqs (measured 66.7 s of the 300K
    # build); 4096-seq chunks cut that 16x.  Results are chunk-size
    # invariant (tested).
    dc = dataclasses.replace(config.device,
                             call_batch=max(config.device.call_batch, 4096))
    caller = FunctionCaller(table, function_index, config.call,
                            dc, use_device=builder.use_device)
    for f in builder.all_fasta_files:
        lines = []
        for res in caller.call_file(f):
            orig, orig_stripped = builder.fm.lookup_original_assignment(
                res.seq_id)
            func = res.best.function
            if orig_stripped != func:
                lines.append(
                    f"{res.seq_id}\t{orig}\t{orig_stripped}\t{func}\t"
                    f"{res.best.function_index}\t{formats.cxx_num(res.best.score)}")
        formats.write_lines(report_dir / Path(f).name, sorted(lines))


def load_data_dir(data_dir, config: Config = Config(),
                  use_device: bool = True, cmph_aliasing: bool = False):
    """Open a built data dir -> (table, function_index).

    Accepts, in priority order:
      1. this framework's store (kmer_data.{npz,json});
      2. a reference CMPH store (kmer_data.mph + kmer_data.dat, the pair
         kmers-call-functions opens, kmers-call-functions.cc:93-98) —
         with final.kmers present the keys are known and the store
         imports into an exact-membership native table; without it (or
         with cmph_aliasing=True) it probes through CmphKmerTable with
         the reference's verified-membership-free aliasing semantics
         (cmph_kmer.h:138-147);
      3. a reference NuDB store (kmer_data.dat magic "nudb.dat",
         nudb_kmer_db.h:32-63) — full key+value import from the dat log;
      4. a final.kmers text dump (partial values).
    """
    from ..table import table_from_stats
    from ..table.wide_table import WideKmerTable

    data_dir = Path(data_dir)
    base = data_dir / "kmer_data"
    fk = data_dir / "final.kmers"
    table = None
    if WideKmerTable.exists(base):
        table = WideKmerTable.load(base)
    elif BucketKmerTable.exists(base):
        table = BucketKmerTable.load(base)
    elif KmerTable.exists(base):
        # legacy linear-table artifact: convert on load
        lin = KmerTable.load(base)
        table = BucketKmerTable.build(*lin.occupied(), config.table)
    else:
        from ..table.cmph_table import CmphKmerTable

        if CmphKmerTable.exists(base):
            ctab = CmphKmerTable.load(base)
            if fk.is_file() and not cmph_aliasing:
                from ..interop import cmph as cmph_io

                hi, lo, _avg, _fn = formats.read_final_kmers(fk)
                keys = cmph_io.keys_from_packed(hi, lo)
                idx = cmph_io.bdz_search(ctab.mph, keys)
                v = ctab.values[np.minimum(idx, ctab.mph.m - 1)]
                table = table_from_stats(
                    hi, lo, v["avg_from_end"], v["function_index"],
                    v["mean"], v["median"], v["var"], config.table)
            else:
                table = ctab
        elif _is_nudb_dat(base):
            from ..interop import cmph as cmph_io, nudb as nudb_io

            keys, vals = nudb_io.read_nudb_dat(str(base) + ".dat")
            rec = np.ascontiguousarray(vals).view(
                cmph_io.STORED_KMER_DTYPE).reshape(-1)
            hi, lo = cmph_io.packed_from_keys(keys)
            table = table_from_stats(
                hi, lo, rec["avg_from_end"], rec["function_index"],
                rec["mean"], rec["median"], rec["var"], config.table)
        elif fk.is_file():
            hi, lo, avg, fn = formats.read_final_kmers(fk)
            z = np.zeros(hi.shape[0], dtype=np.uint16)
            table = table_from_stats(hi, lo, avg, fn, z, z, z, config.table)
        else:
            raise FileNotFoundError(f"No kmer table at {base}")
    function_index = formats.read_function_index(data_dir / "function.index")
    return table, function_index


def _is_nudb_dat(base) -> bool:
    p = Path(str(base) + ".dat")
    if not p.is_file():
        return False
    with open(p, "rb") as f:
        return f.read(8) == b"nudb.dat"
