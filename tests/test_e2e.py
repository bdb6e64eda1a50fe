"""End-to-end: CLI build -> artifacts -> call/annotate/distance -> service."""

import threading

import numpy as np
import pytest

from signature_kmers_tpu.cli.main import main as cli_main
from signature_kmers_tpu.io import formats


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    from tests.fixtures.gen_corpus import generate_corpus

    root = tmp_path_factory.mktemp("corpus_e2e")
    generate_corpus(root)
    return root


@pytest.fixture(scope="module")
def data_dir(corpus, tmp_path_factory):
    out = tmp_path_factory.mktemp("kmerdata")
    rc = cli_main([
        "build-signatures",
        "-D", str(corpus / "Annotations"),
        "-F", str(corpus / "Seqs"),
        "--kmer-data-dir", str(out),
        "--final-kmers", "final.kmers",
    ])
    assert rc == 0
    return out


class TestBuildArtifacts:
    def test_artifacts_exist(self, data_dir):
        for name in ["function.index", "otu.index", "genomes",
                     "distinct_functions", "final.kmers",
                     "kmer_data.npz", "kmer_data.json"]:
            assert (data_dir / name).exists(), name
        assert (data_dir / "recall.report.d").is_dir()

    def test_function_index_roundtrip(self, data_dir):
        funcs = formats.read_function_index(data_dir / "function.index")
        assert "hypothetical protein" in funcs
        assert len(funcs) >= 7

    def test_final_kmers_roundtrip(self, data_dir):
        hi, lo, avg, fn = formats.read_final_kmers(data_dir / "final.kmers")
        assert hi.shape[0] > 500
        # sorted by packed kmer
        packed = (hi.astype(np.uint64) << 24) | lo
        assert (np.diff(packed.astype(np.int64)) > 0).all()

    def test_recall_reports(self, data_dir):
        # Genomes annotated via assignment files must recall cleanly.
        # Genomes annotated only via deflines have no recorded "original
        # assignment" (ref looks them up from definition files only,
        # kmers-build-signatures.cc:288-297), so each of their proteins
        # appears with empty old-function columns — as in the reference.
        for f in (data_dir / "recall.report.d").iterdir():
            for line in f.read_text().splitlines():
                cols = line.split("\t")
                assert cols[1] == "" and cols[2] == "", (
                    f"real recall mismatch: {line}")


class TestCallCli:
    def test_call_functions(self, corpus, data_dir, tmp_path):
        out = tmp_path / "calls.tsv"
        rc = cli_main([
            "call-functions", "-d", str(data_dir),
            "-i", str(corpus / "Queries" / "queries.fa"),
            "-o", str(out)])
        assert rc == 0
        rows = [l.split("\t") for l in out.read_text().splitlines()]
        assert len(rows) == 10  # 7 family queries + 3 decoys
        by_id = {r[0]: r for r in rows}
        from tests.fixtures.gen_corpus import FUNCTIONS

        for qi, fn in enumerate(FUNCTIONS):
            assert by_id[f"query.{qi}"][1] == fn
        for d in range(3):
            assert by_id[f"decoy.{d}"][2] == "65535"

    def test_debug_scoring_dumps(self, corpus, data_dir, tmp_path, capsys):
        """--debug-scoring: the reference's compile-time DEBUG_SCORING
        stage dumps (call_functions.tcc:359-613) as a runtime flag."""
        out = tmp_path / "calls_ds.tsv"
        rc = cli_main([
            "call-functions", "-d", str(data_dir),
            "-i", str(corpus / "Queries" / "queries.fa"),
            "--debug-scoring", "-o", str(out)])
        assert rc == 0
        err = capsys.readouterr().err
        assert "Initial calls:" in err
        assert "after collapse:" in err
        assert "after merge:" in err
        assert "Offset=" in err
        assert "KmerCall(" in err
        # same calls as the plain run
        rows = [l.split("\t") for l in out.read_text().splitlines()]
        assert len(rows) == 10

    def test_annotate_seqs(self, corpus, data_dir, tmp_path):
        calls = tmp_path / "calls"
        uncalled = tmp_path / "uncalled"
        rc = cli_main([
            "annotate-seqs", str(data_dir), str(tmp_path / "genus"),
            str(corpus / "Queries"), str(calls), str(uncalled)])
        assert rc == 0
        called_ids = {l.split("\t")[0] for l in calls.read_text().splitlines()}
        uncalled_ids = set(uncalled.read_text().splitlines())
        assert len(called_ids) == 7
        assert uncalled_ids == {"decoy.0", "decoy.1", "decoy.2"}


class TestDistanceCli:
    def test_matrix_distance_matches_golden(self, corpus, data_dir, tmp_path):
        out = tmp_path / "dist.tsv"
        rc = cli_main([
            "matrix-distance", "-d", str(data_dir),
            "-i", str(corpus / "Seqs" / "1000.7"),
            "-o", str(out)])
        assert rc == 0
        got = sorted(out.read_text().splitlines())

        # golden comparison
        from signature_kmers_tpu.core.config import BuildConfig, CallConfig
        from signature_kmers_tpu.golden.build import GoldenSignatureBuilder
        from signature_kmers_tpu.golden.call import GoldenFunctionCaller
        from signature_kmers_tpu.golden.distance import compute_distance
        from signature_kmers_tpu.io import fasta
        from signature_kmers_tpu.utils import paths

        b = GoldenSignatureBuilder(BuildConfig())
        b.load_function_data([], [], paths.populate_path_list(
            [corpus / "Annotations"]))
        b.load_fasta(paths.populate_path_list([corpus / "Seqs"]), False, set())
        b.process_kept_functions(set())
        b.extract_kmers(set())
        b.process_kmers()
        funcs = [b.fm.index_function_map[i]
                 for i in sorted(b.fm.index_function_map)]
        gc = GoldenFunctionCaller(b.kept_kmers.get, funcs,
                                  CallConfig(ignore_hypothetical=True))
        batch = fasta.SequenceBatch.from_file(corpus / "Seqs" / "1000.7")
        res = compute_distance(gc, [batch])
        want = sorted(f"{s1}\t{s2}\t{c}" for s1, s2, c in res.rows(False))
        assert got == want
        assert len(got) > 0

    def test_matrix_distance_folder_restartable(self, corpus, data_dir, tmp_path):
        out_dir = tmp_path / "out"
        rc = cli_main([
            "matrix-distance-folder", str(data_dir),
            str(corpus / "Seqs"), str(out_dir)])
        assert rc == 0
        files = sorted(p.name for p in out_dir.iterdir())
        assert len(files) == 6
        # restartability: touch one output, re-run, content preserved
        probe = out_dir / files[0]
        probe.write_text("SENTINEL\n")
        rc = cli_main([
            "matrix-distance-folder", str(data_dir),
            str(corpus / "Seqs"), str(out_dir)])
        assert rc == 0
        assert probe.read_text() == "SENTINEL\n"


class TestNaturalBreaks:
    def test_two_cluster_cutoff(self):
        from signature_kmers_tpu.stats.natural_breaks import (
            classify_jenks_fisher, score_cutoff)

        vals = [1.0, 1.1, 1.2, 9.0, 9.1, 9.2]
        breaks = classify_jenks_fisher(vals, 2)
        assert breaks[0] == 1.0
        assert breaks[1] == 9.0
        assert score_cutoff(vals) == 9.0

    def test_three_classes(self):
        from signature_kmers_tpu.stats.natural_breaks import classify_jenks_fisher

        vals = [0, 0.1, 5, 5.1, 10, 10.1]
        breaks = classify_jenks_fisher(vals, 3)
        assert breaks == [0.0, 5.0, 10.0]


class TestService:
    def test_endpoints(self, corpus, data_dir):
        import asyncio
        import urllib.request

        from signature_kmers_tpu.service import server as srv

        port = 16100
        loop = asyncio.new_event_loop()
        ready = None

        def run():
            loop.run_until_complete(
                srv.serve_async(str(data_dir), port=port))

        t = threading.Thread(target=run, daemon=True)
        t.start()
        import time

        base = f"http://127.0.0.1:{port}"
        for _ in range(100):
            try:
                v = urllib.request.urlopen(base + "/version", timeout=2).read()
                break
            except Exception:
                time.sleep(0.1)
        else:
            raise RuntimeError("service did not start")
        assert b"signature_kmers_tpu" in v

        fa = (corpus / "Queries" / "queries.fa").read_bytes()
        req = urllib.request.Request(base + "/query", data=fa, method="POST")
        resp = urllib.request.urlopen(req, timeout=60).read().decode()
        lines = resp.splitlines()
        assert len(lines) == 10
        from tests.fixtures.gen_corpus import FUNCTIONS

        assert lines[0].split("\t")[1] == FUNCTIONS[0]

        # /fq_lookup over real HTTP: reverse-translate a called query
        # protein into a FASTQ read and expect the same call at frame +1
        from signature_kmers_tpu.core import dna

        called = lines[0].split("\t")
        fa_lines = fa.decode("latin-1").splitlines()
        pep_parts = []
        for ln in fa_lines[1:]:
            if ln.startswith(">"):
                break
            pep_parts.append(ln)
        pep = "".join(pep_parts)
        codon = {}
        for i, aa in enumerate(dna._CODE_TABLE):
            codon.setdefault(
                aa, "TCAG"[i // 16] + "TCAG"[(i // 4) % 4] + "TCAG"[i % 4])
        read = "".join(codon[a] for a in pep)
        fq = (f"@r0\n{read}\n+\n{'I' * len(read)}\n").encode()
        req = urllib.request.Request(base + "/fq_lookup", data=fq,
                                     method="POST")
        resp = urllib.request.urlopen(req, timeout=60).read().decode()
        row = resp.splitlines()[0].split("\t")
        assert row[0] == "r0" and row[1] == "+1" and row[2] == called[1]

        urllib.request.urlopen(base + "/quit", timeout=5).read()
        t.join(timeout=10)
        assert not t.is_alive()

    def test_listen_port_file(self, data_dir, tmp_path):
        """--port 0 + --listen-port-file: the server binds a random
        port and announces it through the port file, mirroring the
        reference server's harness contract (kmers-server.cc:44-46)."""
        import asyncio
        import time
        import urllib.request

        from signature_kmers_tpu.service import server as srv

        pf = tmp_path / "listen.port"
        loop = asyncio.new_event_loop()

        def run():
            loop.run_until_complete(
                srv.serve_async(str(data_dir), port=0,
                                listen_port_file=str(pf),
                                kmer_version="V2024test"))

        t = threading.Thread(target=run, daemon=True)
        t.start()
        for _ in range(200):
            if pf.exists():
                break
            time.sleep(0.1)
        else:
            raise RuntimeError("port file never appeared")
        port = int(pf.read_text().strip())
        assert port > 0
        base = f"http://127.0.0.1:{port}"
        v = urllib.request.urlopen(base + "/version", timeout=5).read()
        assert b"signature_kmers_tpu" in v
        # --kmer-version's reference /version line (kser_request.cc:283-296)
        assert v.startswith(b"kmer\tV2024test\n")
        urllib.request.urlopen(base + "/quit", timeout=5).read()
        t.join(timeout=10)
        assert not t.is_alive()

    def test_mesh_service_over_http(self, corpus, data_dir):
        """serve --mesh end-to-end: the real asyncio server running on a
        sharded-table service answers /query over HTTP identically to a
        single-device server."""
        import asyncio
        import time
        import urllib.request

        from signature_kmers_tpu.parallel.mesh import make_mesh
        from signature_kmers_tpu.service import server as srv

        port = 16103
        loop = asyncio.new_event_loop()

        def run():
            loop.run_until_complete(
                srv.serve_async(str(data_dir), port=port,
                                mesh=make_mesh(tp=2)))

        t = threading.Thread(target=run, daemon=True)
        t.start()
        base = f"http://127.0.0.1:{port}"
        for _ in range(200):
            try:
                urllib.request.urlopen(base + "/version", timeout=2).read()
                break
            except Exception:
                time.sleep(0.1)
        else:
            raise RuntimeError("mesh service did not start")
        fa = (corpus / "Queries" / "queries.fa").read_bytes()
        req = urllib.request.Request(base + "/query", data=fa, method="POST")
        resp = urllib.request.urlopen(req, timeout=120).read().decode()
        from signature_kmers_tpu.service.server import AnnotationService

        single = AnnotationService(str(data_dir))
        assert resp == single.query_text(fa)
        urllib.request.urlopen(base + "/quit", timeout=5).read()
        t.join(timeout=10)
        assert not t.is_alive()

    def test_mesh_service_matches_single_device(self, corpus, data_dir):
        """serve --mesh: the sharded-table service (queries dp-sharded,
        table tp-sharded over the virtual 8-device mesh —
        ParallelFunctionCaller inside _make_engines) must answer /query,
        /add and /matrix byte-identically to the single-device service,
        including the copy-on-write /add rebuild of the sharded arrays
        (BASELINE service config #5)."""
        from signature_kmers_tpu.parallel.mesh import make_mesh
        from signature_kmers_tpu.service.server import AnnotationService

        single = AnnotationService(str(data_dir))
        mesh = AnnotationService(str(data_dir), mesh=make_mesh(tp=2))
        from signature_kmers_tpu.parallel.parallel_caller import (
            ParallelFunctionCaller)

        assert isinstance(mesh.caller, ParallelFunctionCaller)

        fa = (corpus / "Queries" / "queries.fa").read_bytes()
        assert mesh.query_text(fa) == single.query_text(fa)
        assert mesh.matrix_text(fa) == single.matrix_text(fa)

        # /add: swaps in a NEW sharded snapshot; lookups must then hit
        # the added kmer identically on both services
        add = b"ACDEFGHI\t17\t3\t120\t120\t9\n"
        r1 = single.add_text(add)
        r2 = mesh.add_text(add)
        assert r1 == r2 == "added 1\n"
        assert isinstance(mesh.caller, ParallelFunctionCaller)
        q = b">addq\nACDEFGHIACDEFGHIACDEFGHI\n"
        assert mesh.lookup_text(q) == single.lookup_text(q)
        assert mesh.query_text(fa) == single.query_text(fa)


class TestBuildCheckpoint:
    def test_resumable_extraction(self, corpus, tmp_path):
        out1 = tmp_path / "ck1"
        rc = cli_main([
            "build-signatures", "-D", str(corpus / "Annotations"),
            "-F", str(corpus / "Seqs"), "--kmer-data-dir", str(out1),
            "--final-kmers", "final.kmers", "--no-recall", "--checkpoint"])
        assert rc == 0
        ckpt = out1 / "build.ckpt.d"
        assert len(list(ckpt.glob("extract_*.npz"))) == 6
        fk1 = (out1 / "final.kmers").read_text()
        # re-run resumes purely from checkpoints and reproduces the output
        rc = cli_main([
            "build-signatures", "-D", str(corpus / "Annotations"),
            "-F", str(corpus / "Seqs"), "--kmer-data-dir", str(out1),
            "--final-kmers", "final.kmers", "--no-recall", "--checkpoint"])
        assert rc == 0
        assert (out1 / "final.kmers").read_text() == fk1


class TestMeshCli:
    def test_call_functions_mesh(self, corpus, data_dir, tmp_path):
        out1 = tmp_path / "calls_mesh.tsv"
        out2 = tmp_path / "calls_single.tsv"
        rc = cli_main([
            "call-functions", "-d", str(data_dir),
            "-i", str(corpus / "Queries" / "queries.fa"),
            "-o", str(out1), "--mesh"])
        assert rc == 0
        rc = cli_main([
            "call-functions", "-d", str(data_dir),
            "-i", str(corpus / "Queries" / "queries.fa"),
            "-o", str(out2)])
        assert rc == 0
        assert out1.read_text() == out2.read_text()


class TestMeshBuild:
    def test_build_mesh_matches_single(self, corpus, data_dir, tmp_path):
        out = tmp_path / "mesh_build"
        rc = cli_main([
            "build-signatures", "-D", str(corpus / "Annotations"),
            "-F", str(corpus / "Seqs"), "--kmer-data-dir", str(out),
            "--final-kmers", "final.kmers", "--no-recall", "--mesh"])
        assert rc == 0
        assert ((out / "final.kmers").read_text()
                == (data_dir / "final.kmers").read_text())


class TestOverlappedWriteFailure:
    def test_failed_table_save_fails_build(self, corpus, tmp_path,
                                           monkeypatch):
        """The overlapped table save runs on a background thread during
        the recall pass; its failure must fail the build (models/
        pipeline._BgTask re-raises at join) — a silent ENOSPC must not
        produce exit 0 with a missing store."""
        import pytest

        from signature_kmers_tpu.models import pipeline
        from signature_kmers_tpu.table.wide_table import WideKmerTable

        def boom(self, *a, **k):
            raise OSError("disk full (simulated)")

        monkeypatch.setattr(WideKmerTable, "save", boom)
        with pytest.raises(OSError, match="disk full"):
            pipeline.run_build(
                definition_dirs=[corpus / "Annotations"],
                fasta_dirs=[corpus / "Seqs"],
                kmer_data_dir=tmp_path / "kd",
                final_kmers="final.kmers",
                recall=True)


class TestBuildFlagPlumbing:
    def test_good_deleted_ignored_flags(self, corpus, tmp_path):
        # deleted feature: drop one protein; ignored function: drop Ribosomal
        from tests.fixtures.gen_corpus import FUNCTIONS

        deleted = tmp_path / "deleted"
        deleted.write_text("fig|1000.7.peg.1\n")
        ignored = tmp_path / "ignored"
        ignored.write_text(FUNCTIONS[5] + "\n")  # Ribosomal protein S12p
        goodf = tmp_path / "goodf"
        goodf.write_text("Rare but good function\n")
        out = tmp_path / "kd"
        rc = cli_main([
            "build-signatures", "-D", str(corpus / "Annotations"),
            "-F", str(corpus / "Seqs"), "--kmer-data-dir", str(out),
            "--deleted-features-file", str(deleted),
            "--ignored-functions-file", str(ignored),
            "--good-functions", str(goodf),
            "--no-recall"])
        assert rc == 0
        funcs = formats.read_function_index(out / "function.index")
        assert FUNCTIONS[5] not in funcs          # ignored dropped
        assert "Rare but good function" not in funcs  # good but zero evidence
        assert "hypothetical protein" in funcs

    def test_min_reps_filters_functions(self, corpus, tmp_path):
        out = tmp_path / "kd2"
        rc = cli_main([
            "build-signatures", "-D", str(corpus / "Annotations"),
            "-F", str(corpus / "Seqs"), "--kmer-data-dir", str(out),
            "--min-reps-required", "100", "--no-recall"])
        assert rc == 0
        funcs = formats.read_function_index(out / "function.index")
        # nothing reaches 100 genomes; only the forced hypothetical remains
        assert funcs == ["hypothetical protein"]

    def test_keep_functions_dir(self, corpus, tmp_path):
        # -K marks functions seen in those files as kept regardless of reps
        out = tmp_path / "kd3"
        rc = cli_main([
            "build-signatures", "-D", str(corpus / "Annotations"),
            "-K", str(corpus / "Seqs"), "--kmer-data-dir", str(out),
            "--min-reps-required", "100", "--no-recall"])
        assert rc == 0
        funcs = formats.read_function_index(out / "function.index")
        from tests.fixtures.gen_corpus import FUNCTIONS
        for fn in FUNCTIONS:
            assert fn in funcs
