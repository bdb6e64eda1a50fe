"""Command-line drivers mirroring the reference binaries.

  skt build-signatures    ~ kmers-build-signatures (ref: kmers-build-signatures.cc:47-62)
  skt call-functions      ~ kmers-call-functions   (ref: kmers-call-functions.cc:52-60)
  skt annotate-seqs       ~ kmers-annotate-seqs    (ref: kmers-annotate-seqs.cc:49-57)
  skt matrix-distance     ~ kmers-matrix-distance  (ref: kmers-matrix-distance.cc:60-68)
  skt matrix-distance-folder / -merge               (ref: *-folder.cc, *-merge.cc)
  skt serve               ~ kmers-server (service layer)

Output formats are byte-compatible with the reference (see io/formats.py).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

from ..core.config import Config
from ..io import fasta as fasta_io, formats
from ..models import pipeline
from ..models.function_caller import FunctionCaller
from ..models.matrix_distance import MatrixDistance
from ..core.function_map import UNDEFINED_FUNCTION


def _add_build(sub):
    p = sub.add_parser("build-signatures", help="build signature k-mer set")
    p.add_argument("-D", "--definition-dir", action="append", default=[])
    p.add_argument("-F", "--fasta-dir", action="append", default=[])
    p.add_argument("-K", "--fasta-keep-functions-dir", action="append", default=[])
    p.add_argument("--good-functions", action="append", default=[])
    p.add_argument("--good-roles", action="append", default=[])
    p.add_argument("--deleted-features-file")
    p.add_argument("--ignored-functions-file")
    p.add_argument("--kmer-data-dir")
    p.add_argument("--final-kmers")
    p.add_argument("--min-reps-required", type=int, default=3)
    p.add_argument("--n-threads", type=int, default=1)  # accepted for parity
    p.add_argument("--nudb-file",
                   help="also write a real NuDB .dat/.key store at this "
                        "base path (ref: kmers-build-signatures.cc:351-355)")
    p.add_argument("--perfect-hash",
                   help="also write a real CMPH BDZ .mph file here "
                        "(ref: kmers-build-signatures.cc:253-264)")
    p.add_argument("--perfect-hash-data",
                   help="flat StoredKmerData array for --perfect-hash "
                        "(default: <perfect-hash>.data)")
    p.add_argument("--otu-file",
                   help="OTU membership file (otu-id\\tgenome lines, e.g. "
                        "the `otus` artifact of setup-build --otu-reps); "
                        "populates otu.index instead of the reference's "
                        "empty stub (kmers-build-signatures.cc:186-188)")
    p.add_argument("--kept-log")
    p.add_argument("--no-recall", action="store_true")
    p.add_argument("--checkpoint", action="store_true",
                   help="persist per-file extraction shards for resumable builds")
    p.add_argument("--mesh", action="store_true",
                   help="shard the selection pass over all local devices")
    p.add_argument("--host-only", action="store_true",
                   help="skip device pipelines (debug)")
    p.add_argument("--p2-stats", action="store_true",
                   help="reference-compatible StoredKmerData statistics: "
                        "P-square median + boost iterative variance + "
                        "ushort-wrapped mean (signature_build.tcc:262-279) "
                        "instead of exact stats; host-side (FIDELITY.md)")
    p.add_argument("--table-layout", default="wide",
                   choices=["wide", "wide-compact", "cuckoo"],
                   help="signature-table HBM layout (see table/wide_table.py)")
    p.set_defaults(func=cmd_build)


def cmd_build(args):
    from ..utils import paths
    import dataclasses

    cfg = Config()
    cfg = dataclasses.replace(
        cfg, build=dataclasses.replace(
            cfg.build, min_reps_required=args.min_reps_required,
            p2_stats=getattr(args, "p2_stats", False)),
        table=dataclasses.replace(cfg.table, layout=args.table_layout))
    good_functions = paths.load_strings(args.good_functions)
    good_roles = paths.load_strings(args.good_roles)
    res = pipeline.run_build(
        definition_dirs=args.definition_dir,
        fasta_dirs=args.fasta_dir,
        fasta_keep_dirs=args.fasta_keep_functions_dir,
        good_functions=good_functions,
        good_roles=good_roles,
        deleted_fids_file=args.deleted_features_file,
        ignored_functions_file=args.ignored_functions_file,
        kmer_data_dir=args.kmer_data_dir,
        final_kmers=args.final_kmers,
        nudb_file=args.nudb_file,
        perfect_hash=args.perfect_hash,
        perfect_hash_data=args.perfect_hash_data,
        otu_file=args.otu_file,
        recall=not args.no_recall,
        kept_log=args.kept_log,
        checkpoint=args.checkpoint,
        config=cfg,
        use_device=not args.host_only,
        mesh=(__import__("signature_kmers_tpu.parallel.mesh",
                         fromlist=["make_mesh"]).make_mesh()
              if args.mesh else None),
    )
    print(f"kept {len(res.function_index)} functions")
    print(f"Kept {len(res.kept)} kmers")
    print(f"distinct_signatures={res.builder.stats.distinct_signatures}")
    print("num_seqs_with_a_signature="
          f"{len(res.builder.stats.seqs_with_a_signature)}")
    return 0


def _add_call(sub):
    p = sub.add_parser("call-functions", help="call functions for query FASTAs")
    p.add_argument("-d", "--data-dir", required=True)
    p.add_argument("-i", "--input-files", nargs="+", required=True)
    p.add_argument("-o", "--output-file")
    p.add_argument("-j", "--n-threads", type=int, default=1)
    p.add_argument("--ignore-hypo", action="store_true")
    p.add_argument("--debug-hits", action="store_true")
    p.add_argument("--debug-scoring", action="store_true",
                   help="per-sequence scoring-stage dumps to stderr "
                        "(initial/collapsed/merged calls, fusion "
                        "expression, totals, margin offset) — the "
                        "reference's compile-time DEBUG_SCORING "
                        "(call_functions.tcc:2-4,359-613) as a runtime "
                        "flag")
    p.add_argument("--mesh", action="store_true",
                   help="shard work over all local devices (dp x tp mesh)")
    p.add_argument("--tp", type=int, default=None,
                   help="table-parallel shards within the mesh")
    p.add_argument("--cmph-aliasing", action="store_true",
                   help="when the data dir holds a reference CMPH store, "
                        "probe it with the reference's aliasing semantics "
                        "(no membership check, cmph_kmer.h:138-147) "
                        "instead of importing to an exact table")
    p.set_defaults(func=cmd_call)


def cmd_call(args):
    import dataclasses

    from ..parallel import distributed

    multi = distributed.initialize()
    cfg = Config()
    table, function_index = pipeline.load_data_dir(
        args.data_dir, cfg,
        cmph_aliasing=getattr(args, "cmph_aliasing", False))
    call_cfg = dataclasses.replace(cfg.call,
                                   ignore_hypothetical=args.ignore_hypo)
    if getattr(args, "mesh", False):
        from ..parallel.mesh import make_mesh
        from ..parallel.parallel_caller import ParallelFunctionCaller

        # multi-host: each process keeps a LOCAL mesh over its own
        # devices (make_mesh(local=True) — NOT a slice of the global
        # list, which is rank 0's devices on every process) and takes a
        # disjoint file slice below: the reference's "disjoint files per
        # job" model with in-process collectives per host.  A
        # process-spanning global mesh is the tp-over-pod path
        # (tests/test_multiprocess.py exercises it); for file-parallel
        # calling, local meshes avoid lockstep chunks.
        caller = ParallelFunctionCaller(
            table, function_index, call_cfg, cfg.device,
            mesh=make_mesh(local=multi, tp=args.tp))
    else:
        caller = FunctionCaller(table, function_index, call_cfg, cfg.device)

    # multi-host I/O sharding (ref: each job takes disjoint inputs,
    # kmers-matrix-distance-folder.cc:108-116): every process parses and
    # calls only its own slice, writes a private shard, and process 0
    # concatenates after the barrier — input parsing scales with hosts.
    my_files = distributed.shard_inputs(args.input_files)
    shard_path = None
    if multi and not args.output_file:
        # stdout under multi-host would interleave per-process slices
        # with no merge — refuse rather than emit garbled output
        raise SystemExit(
            "call-functions: -o/--output-file is required when running "
            "multi-host (jax.process_count() > 1); per-process stdout "
            "slices cannot be merged")
    if multi and args.output_file:
        import jax

        shard_path = f"{args.output_file}.shard{jax.process_index():05d}"
        out = open(shard_path, "w")
    elif args.output_file:
        out = open(args.output_file, "w")
    else:
        out = sys.stdout
    try:
        debug_scoring = getattr(args, "debug_scoring", False)
        if debug_scoring:
            from ..golden.call import find_best_call as golden_best_call
        for path in my_files:
            batch = fasta_io.read_fasta_batch(path)
            results = caller.call_batch(batch, keep_hits=args.debug_hits) \
                if args.debug_hits else caller.call_batch(batch)
            for i, res in enumerate(results):
                if debug_scoring:
                    # re-drive the scoring stages with the dump stream
                    # (the production best call ran natively; the golden
                    # spec is decision-identical — tests/test_fuzz.py)
                    print(f"=== scoring {res.seq_id} ===", file=sys.stderr)
                    golden_best_call(list(res.calls),
                                     caller.function_at_index,
                                     caller.config, debug=sys.stderr,
                                     debug_id=res.seq_id)
                if args.debug_hits and res.hits:
                    from ..core import alphabet
                    import math

                    seq = batch.codes[batch.offsets[i]:batch.offsets[i + 1]]
                    # hit line format incl. trailing tab, to stdout
                    # (ref: kmers-call-functions.cc:114-116)
                    for h in res.hits:
                        fn = (function_index[h.function_index]
                              if h.function_index < len(function_index) else "")
                        kmer = alphabet.decode_codes(seq[h.pos:h.pos + 8])
                        print(f"{kmer}\t{h.pos}\t{fn}\t{h.median}\t{h.mean}\t"
                              f"{h.var}\t{formats.cxx_num(math.sqrt(h.var))}\t")
                out.write(formats.format_call_row(
                    res.seq_id, res.best.function,
                    res.best.function_index, res.best.score))
    finally:
        if out is not sys.stdout:
            out.close()
    if shard_path is not None:
        # shards concatenate by process id (shard p held files p::nproc;
        # round-robin interleaving restores input order only per-shard)
        distributed.barrier("call-shards-written")
        distributed.merge_shards(args.output_file)
        distributed.barrier("call-shards-merged")
    return 0


def _add_annotate(sub):
    p = sub.add_parser("annotate-seqs",
                       help="pf-annotate-seqs replacement")
    p.add_argument("kmer_data_dir")
    p.add_argument("genus_data_dir")  # accepted for CLI parity (unused, as in ref)
    p.add_argument("sequences_dir")
    p.add_argument("calls_file")
    p.add_argument("uncalled_ids_file")
    p.add_argument("-j", "--parallel", type=int, default=1)
    p.add_argument("--ignore-hypo", action="store_true")
    p.add_argument("--mesh", action="store_true",
                   help="shard work over all local devices (dp x tp mesh)")
    p.add_argument("--tp", type=int, default=None,
                   help="table-parallel shards within the mesh")
    p.set_defaults(func=cmd_annotate)


def cmd_annotate(args):
    import dataclasses

    from ..parallel import distributed
    from ..utils import paths

    multi = distributed.initialize()
    cfg = Config()
    table, function_index = pipeline.load_data_dir(args.kmer_data_dir, cfg)
    call_cfg = dataclasses.replace(cfg.call,
                                   ignore_hypothetical=args.ignore_hypo)
    if getattr(args, "mesh", False):
        from ..parallel.mesh import make_mesh
        from ..parallel.parallel_caller import ParallelFunctionCaller

        caller = ParallelFunctionCaller(
            table, function_index, call_cfg, cfg.device,
            mesh=make_mesh(local=multi, tp=args.tp))
    else:
        caller = FunctionCaller(table, function_index, call_cfg, cfg.device)
    # multi-host: disjoint file slices per process + private output
    # shards, process 0 merges after the barrier (same model as
    # cmd_call; the sequence files are the sharding unit)
    calls_path = args.calls_file
    if multi:
        import jax

        calls_path = f"{args.calls_file}.shard{jax.process_index():05d}"
    uncalled = []
    with open(calls_path, "w") as out:
        for path in distributed.shard_inputs(
                paths.populate_path_list([args.sequences_dir])):
            for res in caller.call_file(path):
                if res.best.function_index == UNDEFINED_FUNCTION:
                    uncalled.append(res.seq_id)
                else:
                    out.write(formats.format_call_row(
                        res.seq_id, res.best.function,
                        res.best.function_index, res.best.score))
    if multi:
        import jax

        formats.write_lines(f"{args.uncalled_ids_file}"
                            f".shard{jax.process_index():05d}", uncalled)
        distributed.barrier("annotate-shards-written")
        distributed.merge_shards(args.calls_file)
        distributed.merge_shards(args.uncalled_ids_file)
        distributed.barrier("annotate-shards-merged")
    else:
        formats.write_lines(args.uncalled_ids_file, uncalled)
    return 0


def _add_matrix(sub):
    p = sub.add_parser("matrix-distance", help="all-vs-all distance for one FASTA")
    p.add_argument("-d", "--data-dir", required=True)
    p.add_argument("-i", "--input-file", required=True)
    p.add_argument("-o", "--output-file")
    p.add_argument("--min-hits", type=int, default=3)  # parsed, unused (as in ref)
    p.add_argument("-j", "--n-threads", type=int, default=1)
    p.add_argument("--verbose", action="store_true")
    p.add_argument("--natural-breaks", type=int, metavar="K",
                   help="classify pair scores into K Jenks-Fisher classes: "
                        "adds score+class columns, prints break values to "
                        "stderr (the reference vendored the algorithm for "
                        "this but never wired it: calc_natural_breaks.h, "
                        "kmers-matrix-distance.cc:6,27)")
    p.add_argument("--mesh", action="store_true",
                   help="psum-combine pair-count blocks over all local "
                        "devices")
    p.set_defaults(func=cmd_matrix)


def cmd_matrix(args):
    cfg = Config()
    table, function_index = pipeline.load_data_dir(args.data_dir, cfg)
    md = MatrixDistance(table, function_index, cfg.distance, cfg.device)
    batch = fasta_io.read_fasta_batch(args.input_file)
    if getattr(args, "mesh", False):
        from ..parallel.mesh import make_mesh

        res = md.compute([batch], mesh=make_mesh())
    else:
        res = md.compute([batch])
    out = open(args.output_file, "w") if args.output_file else sys.stdout
    try:
        if args.natural_breaks:
            from ..stats.natural_breaks import classify_jenks_fisher

            rows = list(res.rows(with_score=True))
            breaks = classify_jenks_fisher(
                [score for _s1, _s2, _c, score in rows],
                args.natural_breaks) if rows else []
            print("natural breaks: "
                  + " ".join(formats.cxx_num(b) for b in breaks),
                  file=sys.stderr)
            import bisect

            for s1, s2, count, score in rows:
                cls = max(bisect.bisect_right(breaks, score) - 1, 0)
                out.write(f"{s1}\t{s2}\t{count}\t"
                          f"{formats.cxx_num(score)}\t{cls}\n")
        else:
            for s1, s2, count in res.rows(with_score=False):
                out.write(f"{s1}\t{s2}\t{count}\n")
    finally:
        if out is not sys.stdout:
            out.close()
    return 0


def _add_matrix_folder(sub):
    p = sub.add_parser("matrix-distance-folder",
                       help="distance per FASTA in a folder (restartable)")
    p.add_argument("data_dir")
    p.add_argument("input_dir")
    p.add_argument("output_dir")
    p.add_argument("-j", "--n-threads", type=int, default=1)
    p.add_argument("--verbose", action="store_true")
    p.add_argument("--mesh", action="store_true",
                   help="psum-combine pair-count blocks over all local "
                        "devices per file")
    p.set_defaults(func=cmd_matrix_folder)


def cmd_matrix_folder(args):
    from ..parallel import distributed

    multi = distributed.initialize()
    cfg = Config()
    table, function_index = pipeline.load_data_dir(args.data_dir, cfg)
    md = MatrixDistance(table, function_index, cfg.distance, cfg.device)
    in_dir = Path(args.input_dir)
    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    mesh = None
    if getattr(args, "mesh", False):
        from ..parallel.mesh import make_mesh

        # multi-host: per-process LOCAL mesh — each process computes
        # different files, so a process-spanning mesh (whose collectives
        # need identical SPMD programs on every rank) would deadlock
        mesh = make_mesh(local=multi)
    # multi-host: disjoint file slices per process (the reference's
    # multi-job sharding made explicit); the per-output existence skip
    # below additionally keeps ANY set of concurrent/restarted jobs safe
    for f in distributed.shard_inputs(sorted(in_dir.iterdir())):
        if not f.is_file():
            continue
        out = out_dir / f.name
        if out.exists():  # restartable sharding (ref: *-folder.cc:113-114)
            continue
        if f.stat().st_size == 0:
            continue
        batch = fasta_io.read_fasta_batch(f)
        res = md.compute([batch], mesh=mesh) if mesh is not None \
            else md.compute([batch])
        formats.write_distance(out, res.rows(with_score=True), with_score=True)
    return 0


def _add_matrix_merge(sub):
    p = sub.add_parser("matrix-distance-merge",
                       help="per-family distance across genus dirs")
    p.add_argument("data_dir")
    p.add_argument("base_dir")
    p.add_argument("output_dir")
    p.add_argument("family_ids", nargs="*")
    p.add_argument("-j", "--n-threads", type=int, default=1)
    p.add_argument("--verbose", action="store_true")
    p.set_defaults(func=cmd_matrix_merge)


def cmd_matrix_merge(args):
    cfg = Config()
    table, function_index = pipeline.load_data_dir(args.data_dir, cfg)
    md = MatrixDistance(table, function_index, cfg.distance, cfg.device)
    base = Path(args.base_dir)
    if not base.is_dir():
        print(f"Base directory {base} is not a valid directory", file=sys.stderr)
        return 1
    genus_dirs = [d for d in sorted(base.iterdir())
                  if d.is_dir() and (d / "local.family.defs").is_file()]
    if not genus_dirs:
        print(f"No valid genus directories found in {base}", file=sys.stderr)
        return 1
    from ..parallel import distributed

    distributed.initialize()
    work = args.family_ids or [str(i) for i in range(len(function_index))]
    # multi-host: disjoint family slices per process (the reference
    # shards -merge jobs by family id lists, *-merge.cc:125-135)
    work = distributed.shard_inputs(work)
    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    for fam in work:
        batches = []
        for g in genus_dirs:
            f = g / "fasta_by_function" / fam
            if f.is_file() and f.stat().st_size > 0:
                batches.append(fasta_io.read_fasta_batch(f))
        if not batches:
            continue
        res = md.compute(batches)
        formats.write_distance(out_dir / fam, res.rows(with_score=True),
                               with_score=True)
    return 0


def _add_serve(sub):
    p = sub.add_parser("serve", help="annotation service")
    p.add_argument("-d", "--data-dir", required=True)
    p.add_argument("--port", type=int, default=6100,
                   help="port to listen on; 0 means choose a random "
                        "port (ref: kmers-server.cc:46)")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--listen-port-file",
                   help="save the bound listen port to this file "
                        "(written atomically once listening; for test "
                        "harnesses with --port 0; ref: "
                        "kmers-server.cc:44)")
    p.add_argument("--kmer-version", metavar="STR",
                   help="k-mer data version string reported by "
                        "GET /version (ref: kmers-server.cc:48)")
    # daemon plumbing mirrors the reference server options
    # (ref: kmers-server.cc:44-46 --daemonize/--pid-file; :58,265-269
    # --no-listen "For profiling": load everything, don't serve)
    p.add_argument("--daemonize", action="store_true")
    p.add_argument("--pid-file")
    p.add_argument("--no-listen", action="store_true",
                   help="load the data dir and exit (profiling)")
    p.add_argument("--kmer-family-distribution", metavar="FILE",
                   help="write per-function signature-k-mer counts at "
                        "startup (ref: kmers-server.cc:254-263)")
    p.add_argument("--warm", type=int, nargs="?", const=384, default=0,
                   metavar="LEN",
                   help="pre-compile the coalesced-batch dispatch shapes "
                        "at startup for typical query length LEN "
                        "(default 384) — removes the first-shape XLA "
                        "compile from p99 tail latency under load")
    p.add_argument("--mesh", action="store_true",
                   help="dispatch onto a dp x tp device mesh: queries "
                        "dp-sharded, the signature table tp-sharded "
                        "across chips (BASELINE service config)")
    p.add_argument("--tp", type=int, default=None,
                   help="table-parallel shards within the mesh")
    p.set_defaults(func=cmd_serve)


def cmd_serve(args):
    import os

    from ..parallel import distributed
    from ..service.server import AnnotationService, serve

    multi = distributed.initialize()
    if multi:
        # pod-scale service: the mesh spans every process's devices
        # (table tp-sharded over the slice); rank 0 serves HTTP and
        # broadcasts each dispatch, other ranks follow (service/
        # multihost.py).  Requires --mesh; daemonizing a distributed
        # runtime is unsupported (fork would orphan the Gloo threads).
        import jax

        if not getattr(args, "mesh", False):
            raise SystemExit("serve: multi-host (SKT_COORDINATOR set) "
                             "requires --mesh")
        if args.daemonize:
            raise SystemExit("serve: --daemonize is incompatible with "
                             "multi-host serving")
        from ..parallel.mesh import make_mesh
        from ..service.multihost import follower_loop

        mesh = make_mesh(tp=args.tp)
        rank0 = jax.process_index() == 0

        def write_distribution(svc):
            svc.write_kmer_distribution(args.kmer_family_distribution)
            print("write distribution to "
                  f"{args.kmer_family_distribution}", file=sys.stderr)

        if args.no_listen:
            # profiling path: every rank loads the data dir on the mesh
            # and exits without serving (nobody enters the broadcast
            # loop); the distribution write is rank 0's, host-side
            svc = AnnotationService(args.data_dir, mesh=mesh,
                                    multihost=True)
            if rank0 and args.kmer_family_distribution:
                write_distribution(svc)
            if rank0:
                print(f"loaded {svc.table.n_items} kmers; "
                      "not listening", file=sys.stderr)
            return 0
        if rank0 and args.kmer_family_distribution:
            # host-side write (table.occupied() only) — needs no mesh;
            # building the sharded service twice would double the
            # fleet's time-to-ready on a production-size table
            write_distribution(AnnotationService(args.data_dir))
        if rank0:
            if args.pid_file:
                Path(args.pid_file).write_text(f"{os.getpid()}\n")
            serve(args.data_dir, host=args.host, port=args.port,
                  mesh=mesh, multihost=True, warm_len=args.warm,
                  listen_port_file=args.listen_port_file,
                  kmer_version=args.kmer_version)
        else:
            svc = AnnotationService(args.data_dir, mesh=mesh,
                                    multihost=True)
            follower_loop(svc)
        return 0

    def build_mesh():
        # constructed lazily and always AFTER the --daemonize fork:
        # make_mesh touches jax.devices(), and an XLA client initialized
        # in the parent does not survive fork (runtime threads are lost;
        # the daemon's first dispatch would hang)
        if not getattr(args, "mesh", False):
            return None
        from ..parallel.mesh import make_mesh

        return make_mesh(tp=args.tp)

    if args.no_listen or args.kmer_family_distribution:
        # mesh only on the no-listen (profiling) path, which returns
        # before any fork; the distribution write is host-side and the
        # daemonizing path must not touch jax yet
        svc = AnnotationService(args.data_dir,
                                mesh=build_mesh() if args.no_listen
                                else None)
        if args.kmer_family_distribution:
            svc.write_kmer_distribution(args.kmer_family_distribution)
            print(f"write distribution to {args.kmer_family_distribution}",
                  file=sys.stderr)
        if args.no_listen:
            print(f"loaded {svc.table.n_items} kmers; not listening",
                  file=sys.stderr)
            return 0
        del svc  # listening path constructs its own service
    if args.daemonize:
        if os.fork():
            return 0
        os.setsid()
        if os.fork():
            os._exit(0)
        devnull = os.open(os.devnull, os.O_RDWR)
        for fd in (0, 1, 2):
            os.dup2(devnull, fd)
    if args.pid_file:
        Path(args.pid_file).write_text(f"{os.getpid()}\n")
    serve(args.data_dir, host=args.host, port=args.port, mesh=build_mesh(),
          warm_len=args.warm, listen_port_file=args.listen_port_file,
          kmer_version=args.kmer_version)
    return 0


def _apply_n_threads(args) -> None:
    """Map the reference's --n-threads / -j to the native host runtime's
    worker count (SKT_THREADS; table placement, BDZ build, MT baseline,
    bdz_search).  The reference uses it for tbb::global_control
    (kmers-build-signatures.cc:167, kmers-call-functions.cc:91); device
    compute is unaffected — the chip is the parallelism."""
    import os

    n = getattr(args, "n_threads", None) or getattr(args, "parallel", None)
    if n and n > 1 and "SKT_THREADS" not in os.environ:
        os.environ["SKT_THREADS"] = str(n)


def main(argv=None):
    from ..utils.jaxcache import enable_cache

    enable_cache()
    parser = argparse.ArgumentParser(
        prog="skt", description="TPU-native signature k-mer framework")
    sub = parser.add_subparsers(dest="command", required=True)
    _add_build(sub)
    _add_call(sub)
    _add_annotate(sub)
    _add_matrix(sub)
    _add_matrix_folder(sub)
    _add_matrix_merge(sub)
    _add_serve(sub)

    from . import table_tool
    table_tool.add_subparsers(sub)

    p_setup = sub.add_parser("setup-build",
                             help="prepare a build data directory")
    p_setup.add_argument("setup_args", nargs=argparse.REMAINDER)

    def _setup(args):
        from . import setup_build
        return setup_build.main(args.setup_args)

    p_setup.set_defaults(func=_setup)

    args = parser.parse_args(argv)
    _apply_n_threads(args)
    return args.func(args)


if __name__ == "__main__":
    sys.exit(main())
