"""Tests: setup-build prep, table tools, extended service endpoints."""

import numpy as np
import pytest

from signature_kmers_tpu.cli.main import main as cli_main
from signature_kmers_tpu.cli.setup_build import (main as setup_main,
                                                 renumber_fragment_runs)


class TestSetupBuild:
    def test_prepares_layout(self, tmp_path):
        src_seqs = tmp_path / "src_seqs"
        src_anno = tmp_path / "src_anno"
        src_seqs.mkdir()
        src_anno.mkdir()
        (src_seqs / "100.1").write_text(
            ">fig|100.1.peg.1\nMKLVVAGH\n"
            ">fig|100.1.peg.2\nACDEFGHI\n"
            ">fig|100.1.peg.3\nWWYYWWYY\n")
        (src_anno / "100.1").write_text(
            "fig|100.1.peg.1\tAlpha synthase\n"
            "fig|100.1.peg.2\tBeta ligase / Gamma ligase\n"
            "fig|100.1.peg.3\tSkipme\n")
        skip = tmp_path / "skip"
        skip.write_text("fig|100.1.peg.3\n")
        extra = tmp_path / "extra.fa"
        extra.write_text(">ext1 Extra protein func\nMKWWYYAC\n")
        out = tmp_path / "build"
        out.mkdir()
        rc = setup_main([
            str(out), "--source-seqs", str(src_seqs),
            "--source-anno", str(src_anno),
            "--skip-pegs", str(skip), "--skip-fusions",
            "--additional-fasta", str(extra),
            "--id-map", str(tmp_path / "idmap")])
        assert rc == 0
        seqs = (out / "Seqs" / "100.1").read_text()
        assert "peg.1" in seqs
        assert "peg.2" not in seqs  # fusion skipped
        assert "peg.3" not in seqs  # skip-pegs
        extra_fa = (out / "Seqs" / "7777777.1").read_text()
        assert ">fig|7777777.1.peg.1" in extra_fa
        ann = (out / "Annotations" / "0" / "7777777.1").read_text()
        assert "Extra protein func" in ann
        assert (out / "additional.funcs").read_text() == "Extra protein func\n"
        idmap = (tmp_path / "idmap").read_text()
        assert "ext1\tfig|7777777.1.peg.1" in idmap
        assert (out / "gnames" / "7777777.1").read_text().startswith("Extra")

    def test_otu_reps_writes_otus_artifact(self, tmp_path):
        src_seqs = tmp_path / "s"
        src_seqs.mkdir()
        for g in ("1.1", "2.2", "3.3"):
            (src_seqs / g).write_text(f">fig|{g}.peg.1 Some func\nMKLV\n")
        reps = tmp_path / "reps"
        # otu 7 has two members: 1.1 is the representative
        reps.write_text("7\t1.1\n7\t2.2\n9\t3.3\n")
        out = tmp_path / "b"
        out.mkdir()
        rc = setup_main([str(out), "--source-seqs", str(src_seqs),
                         "--otu-reps", str(reps)])
        assert rc == 0
        assert (out / "otus").read_text() == "7\t1.1\n7\t2.2\n9\t3.3\n"
        # only representatives were imported
        assert (out / "Seqs" / "1.1").is_file()
        assert not (out / "Seqs" / "2.2").exists()
        assert (out / "Seqs" / "3.3").is_file()

    def test_otu_index_populated_from_otu_file(self, tmp_path):
        from signature_kmers_tpu.io import formats

        otus = tmp_path / "otus"
        otus.write_text("7\t1.1\n7\t2.2\n9\t3.3\n")
        sets = formats.read_otu_sets(otus)
        assert sets == [("7", ["1.1", "2.2"]), ("9", ["3.3"])]
        formats.write_otu_index(tmp_path / "otu.index", sets)
        assert (tmp_path / "otu.index").read_text() == \
            "0\t7\t1.1\n1\t9\t3.3\n"

    def test_fragment_renumbering(self):
        items = [
            ("a", "Big protein # fragment"),
            ("b", "Big protein # fragment"),
            ("c", "Big protein # fragment"),
            ("d", "Other protein # note"),
            ("e", "Lone protein # frameshift"),
        ]
        out = renumber_fragment_runs(items)
        assert out[0] == ("a", "Big protein # fragment 1")
        assert out[1] == ("b", "Big protein # fragment 2")
        assert out[2] == ("c", "Big protein # fragment 3")
        assert out[3] == ("d", "Other protein")
        # run of one: no suffix, comment stripped (kmers-setup-build.pl:229-247)
        assert out[4] == ("e", "Lone protein")

    def test_function_overrides(self, tmp_path):
        src_seqs = tmp_path / "s"
        src_seqs.mkdir()
        (src_seqs / "5.5").write_text(">fig|5.5.peg.1 Original func\nMKLV\n")
        ov = tmp_path / "ov"
        ov.write_text("fig|5.5.peg.1\tNew func\n")
        out = tmp_path / "b"
        out.mkdir()
        rc = setup_main([str(out), "--source-seqs", str(src_seqs),
                         "--function-overrides", str(ov)])
        assert rc == 0
        ann = (out / "Annotations" / "0" / "5.5").read_text()
        assert ann.splitlines()[-1] == "fig|5.5.peg.1\tNew func"


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    from tests.fixtures.gen_corpus import generate_corpus

    root = tmp_path_factory.mktemp("corpus_tools")
    generate_corpus(root)
    out = tmp_path_factory.mktemp("kd_tools")
    otus = root / "otus"
    otus.write_text("12\tg1\n12\tg2\n34\tg3\n")
    rc = cli_main([
        "build-signatures",
        "-D", str(root / "Annotations"),
        "-F", str(root / "Seqs"),
        "--kmer-data-dir", str(out),
        "--final-kmers", "final.kmers",
        "--otu-file", str(otus),
        "--no-recall"])
    assert rc == 0
    return out


class TestTableTool:
    def test_otu_index_written(self, data_dir):
        assert (data_dir / "otu.index").read_text() == \
            "0\t12\tg1\n1\t34\tg3\n"

    def test_info_and_verify(self, data_dir, capsys):
        assert cli_main(["table-tool", "info", str(data_dir)]) == 0
        out = capsys.readouterr().out
        assert "kmers" in out
        assert cli_main(["table-tool", "verify", str(data_dir)]) == 0

    def test_dump_build_roundtrip(self, data_dir, tmp_path):
        dump = tmp_path / "dump.kmers"
        assert cli_main(["table-tool", "dump", str(data_dir),
                         "-o", str(dump)]) == 0
        # matches the build's own final.kmers
        assert sorted(dump.read_text().splitlines()) == sorted(
            (data_dir / "final.kmers").read_text().splitlines())
        rebuilt = tmp_path / "rebuilt"
        assert cli_main(["table-tool", "build", str(dump),
                         str(rebuilt)]) == 0
        from signature_kmers_tpu.cli.table_tool import open_table

        t1 = open_table(data_dir / "kmer_data")
        t2 = open_table(rebuilt / "kmer_data")
        assert t1.n_items == t2.n_items


class TestServiceAdmin:
    def test_add_and_sizes(self, data_dir):
        from signature_kmers_tpu.service.server import AnnotationService

        svc = AnnotationService(str(data_dir))
        n0 = svc.table.n_items
        sizes = svc.dump_sizes_text()
        assert f"kmers\t{n0}" in sizes
        resp = svc.add_text(b"WWWWYYYY\t42\t3\t\nMMMMKKKK\t7\t2\t\n")
        assert resp == "added 2\n"
        assert svc.table.n_items == n0 + 2
        from signature_kmers_tpu.core import alphabet

        hi, lo = alphabet.pack_kmer_str("WWWWYYYY")
        found, r0, _, _ = svc.table.lookup_np(
            np.asarray([hi], np.uint32), np.asarray([lo], np.uint32))
        assert found[0]
        assert int(r0[0] & 0xFFFF) == 42
        assert int(r0[0] >> 16) == 3


class TestServiceMappings:
    def test_keyed_mapping_and_checkpoint(self, data_dir, tmp_path):
        from signature_kmers_tpu.service.server import AnnotationService

        svc = AnnotationService(str(data_dir))
        resp = svc.mapping_add_text("fam1", b"WWWWYYYY\t5\t11\t\nMMMMKKKK\t6\t12\t\n")
        assert "2 kmers" in resp
        assert svc.dump_mapping_text() == "fam1\t2\n"
        hits = svc.mapping_lookup_text(
            "fam1", b">s1\nAAWWWWYYYYAA\n>s2\nACDEFGHIKL\n")
        lines = hits.splitlines()
        assert len(lines) == 1
        assert lines[0] == "s1\t2\t11\t5"
        assert svc.mapping_lookup_text("missing", b">s\nMKLV\n") == ""
        # keyed matrix: s1/s2 share both mapping k-mers, s3 shares none
        m = svc.mapping_matrix_text(
            "fam1",
            b">s1\nAAWWWWYYYYMMMMKKKK\n>s2\nWWWWYYYYCCMMMMKKKK\n>s3\nACDEFGHIKL\n")
        lines = m.splitlines()
        assert len(lines) == 1
        f = lines[0].split("\t")
        assert f[:3] == ["s1", "s2", "2"]
        assert abs(float(f[3]) - 2 / (18 + 18)) < 1e-6
        assert svc.mapping_matrix_text("missing", b">s\nMKLV\n") == ""
        # checkpoint round trip
        n = svc.table.n_items
        svc.add_text(b"CCCCHHHH\t1\t2\t\n")
        assert svc.checkpoint_text() == "checkpointed\n"
        svc2 = AnnotationService(str(data_dir))
        assert svc2.table.n_items == n + 1


class TestSetupBuildPhageAndRoles:
    def test_overlapping_phage_pegs(self):
        from signature_kmers_tpu.cli.setup_build import \
            find_overlapping_phage_pegs

        rows = [
            ("fig|1.1.peg.1", "ctgA_100_900", "pp1ab"),   # longest, kept
            ("fig|1.1.peg.2", "ctgA_400_900", "pp1a"),    # same stop, skip
            ("fig|1.1.peg.3", "ctgA_600_900", "pp1"),     # same stop, skip
            ("fig|1.1.peg.4", "ctgA_100_200", "capsid"),  # unique stop
            ("fig|1.1.peg.5", "ctgB_100_900", "other"),   # other contig
            ("fig|1.1.peg.6", "badloc", "x"),             # unparsable
        ]
        skipped = dict(find_overlapping_phage_pegs(rows))
        assert skipped == {"fig|1.1.peg.2": "pp1a", "fig|1.1.peg.3": "pp1"}

    def test_cli_phage_and_subsystem_roles(self, tmp_path, capsys):
        from signature_kmers_tpu.cli.setup_build import main as sb_main

        root = tmp_path / "d"
        root.mkdir()
        src = tmp_path / "src"
        src.mkdir()
        (src / "1.1").write_text(
            ">fig|1.1.peg.1\nMKLVWWWWYYYY\n>fig|1.1.peg.2\nMKLVNNNN\n")
        loc = tmp_path / "locs.tsv"
        loc.write_text("fig|1.1.peg.1\tctgA_10_400\tpp1ab\n"
                       "fig|1.1.peg.2\tctgA_100_400\tpp1a\n")
        roles = tmp_path / "roles.txt"
        roles.write_text("Zeta role\nAlpha role\n")
        rc = sb_main([str(root), "--source-seqs", str(src),
                      "--phage-locations", str(loc),
                      "--protect-subsystem-roles",
                      "--subsystem-roles", str(roles)])
        assert rc == 0
        out = capsys.readouterr().out
        assert "fig|1.1.peg.2\tpp1a" in out
        # the overlapped peg is excluded from Seqs and Annotations
        seqs = (root / "Seqs" / "1.1").read_text()
        assert "peg.1" in seqs and "peg.2" not in seqs
        anno = (root / "Annotations" / "0" / "1.1").read_text()
        assert "peg.2" not in anno
        assert (root / "subsystem.roles").read_text() == \
            "Alpha role\nZeta role\n"
        # existing non-empty file is preserved (ref: ! -s check)
        (root / "subsystem.roles").write_text("Keep me\n")
        sb_main([str(root), "--source-seqs", str(src),
                 "--protect-subsystem-roles",
                 "--subsystem-roles", str(roles)])
        assert (root / "subsystem.roles").read_text() == "Keep me\n"


class TestMatrixNaturalBreaks:
    def test_cli_natural_breaks_classes(self, data_dir, tmp_path, capsys):
        from signature_kmers_tpu.cli.main import main as cli_main
        from tests.fixtures.gen_corpus import FUNCTIONS, _rand_prot
        import random

        r = random.Random(20240817)
        cores = {fn: _rand_prot(r, 220) for fn in FUNCTIONS}
        rm = random.Random(7)
        q = tmp_path / "q.fa"
        with open(q, "w") as f:
            i = 0
            for fn in list(FUNCTIONS)[:2]:
                for _v in range(3):
                    s = list(cores[fn])
                    for _ in range(4):
                        s[rm.randrange(len(s))] = rm.choice(
                            "ACDEFGHIKLMNPQRSTVWY")
                    f.write(f">m{i}\n{''.join(s)}\n")
                    i += 1
        out = tmp_path / "d.tsv"
        rc = cli_main(["matrix-distance", "-d", str(data_dir), "-i", str(q),
                       "-o", str(out), "--natural-breaks", "2"])
        assert rc == 0
        assert "natural breaks:" in capsys.readouterr().err
        rows = [line.split("\t")
                for line in out.read_text().splitlines()]
        assert rows and all(len(r) == 5 for r in rows)
        classes = {int(r[4]) for r in rows}
        assert classes <= {0, 1} and len(classes) == 2


class TestQueryBatcher:
    def test_concurrent_queries_coalesce(self, data_dir):
        import asyncio

        from signature_kmers_tpu.service.server import AnnotationService
        from tests.fixtures.gen_corpus import FUNCTIONS, _rand_prot
        import random

        svc = AnnotationService(str(data_dir))
        r = random.Random(20240817)
        cores = [(fn, _rand_prot(r, 220)) for fn in FUNCTIONS]

        async def run():
            # a slow first call keeps later arrivals queued -> coalesced
            reqs = [f">q{i}\n{seq}\n".encode()
                    for i, (_fn, seq) in enumerate(cores)]
            return await asyncio.gather(
                *[svc.batcher.query(b) for b in reqs])

        outs = asyncio.run(run())
        assert len(outs) == len(cores)
        for i, ((fn, _seq), out) in enumerate(zip(cores, outs)):
            lines = out.splitlines()
            assert len(lines) == 1
            f = lines[0].split("\t")
            assert f[0] == f"q{i}" and f[1] == fn
        # all requests were queued before the drain task first ran, so
        # they shared one device batch
        assert svc.batcher.batches_run == 1

    def test_overlapped_dispatch(self, data_dir, monkeypatch):
        """Requests arriving while one batch is on the device are
        dispatched by a SECOND worker concurrently (depth > 1);
        multihost pins depth 1 (collective order must match across
        ranks)."""
        import asyncio
        import threading
        import time

        from signature_kmers_tpu.service.server import AnnotationService
        from tests.fixtures.gen_corpus import FUNCTIONS, _rand_prot
        import random

        # pin the ambient env: a developer's SKT_SERVE_DEPTH export must
        # not change what this test asserts
        monkeypatch.delenv("SKT_SERVE_DEPTH", raising=False)
        svc = AnnotationService(str(data_dir))
        assert svc.batcher.depth == 4  # default; SKT_SERVE_DEPTH overrides
        caller = svc.engines.caller
        orig = caller.call_batch
        state = {"cur": 0, "max": 0}
        lock = threading.Lock()
        # event-synchronized (not wall-clock): each dispatch announces
        # itself and then blocks on `gate`, so the test KNOWS when batch
        # 1 is in the executor and when batch 2 runs concurrently — no
        # sleep/timing race on a loaded CI host
        entered = [threading.Event(), threading.Event()]
        gate = threading.Event()
        n_entries = [0]

        def slow(batch, *a, **k):
            with lock:
                state["cur"] += 1
                state["max"] = max(state["max"], state["cur"])
                i = n_entries[0]
                n_entries[0] += 1
            if i < len(entered):
                entered[i].set()
            assert gate.wait(30)
            try:
                return orig(batch, *a, **k)
            finally:
                with lock:
                    state["cur"] -= 1

        caller.call_batch = slow
        r = random.Random(20250821)
        seqs = [_rand_prot(r, 220) for _ in range(3)]

        async def run():
            loop = asyncio.get_event_loop()
            t1 = asyncio.ensure_future(
                svc.batcher.query(f">a\n{seqs[0]}\n".encode()))
            # deterministic: batch 1 is inside the executor NOW
            await loop.run_in_executor(None, entered[0].wait, 30)
            t2 = asyncio.ensure_future(
                svc.batcher.query(f">b\n{seqs[1]}\n".encode()))
            t3 = asyncio.ensure_future(
                svc.batcher.query(f">c\n{seqs[2]}\n".encode()))
            # batch 2 (t2+t3 coalesced) dispatched while batch 1 is
            # still blocked on the gate -> provably concurrent
            await loop.run_in_executor(None, entered[1].wait, 30)
            gate.set()
            return await asyncio.gather(t1, t2, t3)

        outs = asyncio.run(run())
        assert [o.split("\t")[0] for o in outs] == ["a", "b", "c"]
        # t2/t3 coalesced into one batch dispatched while t1 was in
        # flight: two dispatches total, overlapping on the executor
        assert svc.batcher.batches_run == 2
        assert state["max"] == 2
        assert svc.batcher.call_ms > 0
        assert FUNCTIONS  # fixture sanity (corpus functions exist)


class TestWarm:
    def test_warm_compiles_shapes_and_serves(self, data_dir):
        """service.warm pre-compiles the pow2-rows dispatch shapes; the
        service must answer real queries correctly afterwards."""
        import random

        from signature_kmers_tpu.service.server import AnnotationService
        from tests.fixtures.gen_corpus import FUNCTIONS, _rand_prot

        svc = AnnotationService(str(data_dir))
        # length 256 IS its own 128-bucket max -> one length, rows 64+128
        n = svc.warm(length=256, max_rows=128)
        assert n == 2
        # non-bucket length warms BOTH its own probe width and the
        # bucket max (regression: warming 384 alone left 300-aa traffic
        # to compile W=304 mid-run as a 6.4 s p99 stall)
        assert svc.warm(length=300, max_rows=64) == 2  # 300 and 384
        # lengths beyond the template tile must not read out of bounds
        # (regression: a fixed 1280-char template + offsets*length)
        assert svc.warm(length=1536, max_rows=64) == 1
        r = random.Random(20240817)
        fn, seq = FUNCTIONS[0], _rand_prot(r, 220)
        out = svc.query_text(f">q\n{seq}\n".encode())
        assert out.split("\t")[1] == fn


class TestTableRelayout:
    def test_relayout_preserves_entries(self, tmp_path):
        """table-tool relayout: a saved table with legacy (oversized)
        geometry is re-placed through the current build_table sizing;
        membership and values are unchanged, geometry shrinks."""
        from signature_kmers_tpu.table import open_table
        from signature_kmers_tpu.table.wide_table import WideKmerTable

        rng = np.random.default_rng(23)
        hi = rng.integers(0, 1 << 24, 60_000, dtype=np.uint32)
        lo = rng.integers(0, 1 << 24, 60_000, dtype=np.uint32)
        pk = (hi.astype(np.uint64) << 24) | lo
        _, idx = np.unique(pk, return_index=True)
        hi, lo = hi[idx], lo[idx]
        n = hi.shape[0]
        v0 = rng.integers(0, 2**32, n, dtype=np.uint32)
        v1 = rng.integers(0, 2**32, n, dtype=np.uint32)
        v2 = rng.integers(0, 1 << 16, n, dtype=np.uint32)
        legacy = WideKmerTable.build(hi, lo, v0, v1, v2, bits=20)
        d = tmp_path / "kd"
        d.mkdir()
        legacy.save(d / "kmer_data")
        assert open_table(d / "kmer_data").bits == 20  # legacy sticks

        rc = cli_main(["table-tool", "relayout", str(d)])
        assert rc == 0
        t2 = open_table(d / "kmer_data")
        assert t2.bits < 20  # current sizing for this key count
        assert t2.n_items == n
        f, r0, r1, r2 = t2.lookup_np(hi, lo)
        assert f.all()
        np.testing.assert_array_equal(r0, v0)
        np.testing.assert_array_equal(r1, v1)
        np.testing.assert_array_equal(r2, v2)


class TestKmerDistribution:
    def test_write_kmer_distribution(self, data_dir, tmp_path):
        from signature_kmers_tpu.service.server import AnnotationService

        svc = AnnotationService(str(data_dir))
        out = tmp_path / "dist.tsv"
        svc.write_kmer_distribution(out)
        rows = [line.split("\t")
                for line in out.read_text().splitlines()]
        assert rows
        total = sum(int(r[1]) for r in rows)
        assert total == svc.table.n_items
        names = {r[2] for r in rows}
        assert "hypothetical protein" in names or len(names) >= 1
