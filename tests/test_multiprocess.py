"""Real multi-process jax.distributed integration test.

Everything else in tests/ runs multi-device logic in ONE process on 8
virtual CPU devices.  This test launches 2 genuine OS processes, each
with 2 virtual CPU devices, connects them through
``jax.distributed.initialize`` (coordinator + Gloo CPU collectives), and
runs the sharded call path AND the sharded build step on the
process-spanning 4-device (dp x tp) mesh.  Each process asserts the
mesh outputs are bit-identical to the single-device path (the reference
has no in-process multi-node support at all — SURVEY §5); this test also
verifies both processes computed identical digests.

The driver is tests/drivers/mp_driver.py.
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

DRIVER = Path(__file__).parent / "drivers" / "mp_driver.py"
CLI_DRIVER = Path(__file__).parent / "drivers" / "mp_cli_driver.py"
SERVE_DRIVER = Path(__file__).parent / "drivers" / "mp_serve_driver.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.parametrize("nproc", [2, 4])
def test_distributed_call_and_build(tmp_path, nproc):
    """2 ranks (the baseline, 2 devices each) and 4 ranks with ONE
    device each: the (2, 2) mesh then has every device on a different
    process, so dp AND tp BOTH span process boundaries (VERDICT r3 #5);
    the driver asserts the sharded call and build outputs are
    bit-identical to single-device on every rank."""
    port = _free_port()
    env = dict(os.environ)
    env["XLA_FLAGS"] = ("--xla_force_host_platform_device_count="
                        + ("2" if nproc == 2 else "1"))
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = str(Path(__file__).resolve().parents[1])
    procs = [
        subprocess.Popen(
            [sys.executable, str(DRIVER), str(pid), str(nproc), str(port),
             str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for pid in range(nproc)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.communicate(timeout=30)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"driver failed:\n{out[-4000:]}"
    digests = [(tmp_path / f"ok.{pid}").read_text() for pid in range(nproc)]
    assert len(set(digests)) == 1


@pytest.fixture(scope="module")
def mp_data(tmp_path_factory):
    """Small built data dir + query files split across 4 FASTAs."""
    from tests.fixtures.gen_corpus import generate_corpus

    from signature_kmers_tpu.cli.main import main as cli_main

    root = tmp_path_factory.mktemp("mp_corpus")
    generate_corpus(root)
    data = tmp_path_factory.mktemp("mp_kmerdata")
    rc = cli_main([
        "build-signatures",
        "-D", str(root / "Annotations"),
        "-F", str(root / "Seqs"),
        "--kmer-data-dir", str(data),
        "--no-recall",
    ])
    assert rc == 0
    # split the query FASTA into 4 files (one record block per file slot)
    recs = (root / "Queries" / "queries.fa").read_text().split(">")
    recs = [r for r in recs if r.strip()]
    qdir = tmp_path_factory.mktemp("mp_queries")
    files = []
    for i in range(4):
        part = recs[i::4]
        f = qdir / f"q{i}.fa"
        f.write_text("".join(">" + r for r in part))
        files.append(str(f))
    return data, files


def test_multihost_cli_io_sharding(mp_data, tmp_path):
    """The real call-functions CLI under 2 jax.distributed processes:
    each process parses only its file slice (cli/main.py cmd_call
    multi-host sharding), process 0 merges the shards; the merged output
    must contain exactly the single-process rows."""
    data, files = mp_data
    from signature_kmers_tpu.cli.main import main as cli_main

    expected = tmp_path / "expected.tsv"
    rc = cli_main(["call-functions", "-d", str(data), "-i", *files,
                   "-o", str(expected)])
    assert rc == 0

    nproc = 2
    port = _free_port()
    merged = tmp_path / "merged.tsv"
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env["PYTHONPATH"] = str(Path(__file__).resolve().parents[1])
    procs = [
        subprocess.Popen(
            [sys.executable, str(CLI_DRIVER), "call", str(pid), str(nproc),
             str(port), str(data), str(merged), *files],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for pid in range(nproc)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.communicate(timeout=30)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"cli driver failed:\n{out[-4000:]}"
    # same rows (order differs: shards concatenate by process id)
    assert sorted(merged.read_text().splitlines()) \
        == sorted(expected.read_text().splitlines())
    assert merged.read_text() != ""
    # shard files cleaned up
    assert not list(tmp_path.glob("merged.tsv.shard*"))


def test_multihost_cli_mesh_local_devices(mp_data, tmp_path):
    """call-functions --mesh under 2 jax.distributed processes: each rank
    must construct its mesh from its OWN local devices (make_mesh
    local=True) — slicing the global device list hands every rank
    process 0's devices and deadlocks/crashes (round-3 review finding)."""
    data, files = mp_data
    from signature_kmers_tpu.cli.main import main as cli_main

    expected = tmp_path / "expected_mesh.tsv"
    rc = cli_main(["call-functions", "-d", str(data), "-i", *files,
                   "-o", str(expected)])
    assert rc == 0

    nproc = 2
    port = _free_port()
    merged = tmp_path / "merged_mesh.tsv"
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = str(Path(__file__).resolve().parents[1])
    procs = [
        subprocess.Popen(
            [sys.executable, str(CLI_DRIVER), "call-mesh", str(pid),
             str(nproc), str(port), str(data), str(merged), *files],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for pid in range(nproc)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.communicate(timeout=30)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"mesh cli driver failed:\n{out[-4000:]}"
    assert sorted(merged.read_text().splitlines()) \
        == sorted(expected.read_text().splitlines())


def _run_cli_ranks(args_of_pid, nproc, env_extra=None, timeout=600):
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env["PYTHONPATH"] = str(Path(__file__).resolve().parents[1])
    if env_extra:
        env.update(env_extra)
    procs = [
        subprocess.Popen([sys.executable, str(CLI_DRIVER), *args_of_pid(pid)],
                         env=env, stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT, text=True)
        for pid in range(nproc)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=timeout)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.communicate(timeout=30)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"cli driver failed:\n{out[-4000:]}"


def test_multihost_cli_folder_4way(mp_data, tmp_path):
    """matrix-distance-folder under FOUR jax.distributed processes: the
    reference's restartable batch sharding (each job takes disjoint
    files, kmers-matrix-distance-folder.cc:108-116) in-process at 4
    ranks — per-file outputs must be byte-identical to a single-process
    run over the same folder."""
    data, files = mp_data
    from signature_kmers_tpu.cli.main import main as cli_main

    in_dir = Path(files[0]).parent
    exp_dir = tmp_path / "expected"
    rc = cli_main(["matrix-distance-folder", str(data), str(in_dir),
                   str(exp_dir)])
    assert rc == 0
    exp = {p.name: p.read_text() for p in exp_dir.iterdir()}
    assert exp

    nproc = 4
    port = _free_port()
    out_dir = tmp_path / "mp_out"
    _run_cli_ranks(
        lambda pid: ["folder", str(pid), str(nproc), str(port), str(data),
                     str(in_dir), str(out_dir)], nproc)
    got = {p.name: p.read_text() for p in out_dir.iterdir()}
    assert got == exp


def test_multihost_cli_merge_4way(mp_data, tmp_path):
    """matrix-distance-merge under FOUR processes: the family work list
    is sharded round-robin across ranks (*-merge.cc:125-135); per-family
    outputs must match the single-process run."""
    data, files = mp_data
    from signature_kmers_tpu.cli.main import main as cli_main

    # genus-dir structure: two genus dirs, families drawn from the query
    # files (each family file present in both genera)
    base = tmp_path / "base"
    fams = []
    for gi, g in enumerate(("g1", "g2")):
        gd = base / g
        (gd / "fasta_by_function").mkdir(parents=True)
        (gd / "local.family.defs").write_text("present\n")
        for fi, f in enumerate(files):
            fam = f"fam{fi}"
            # give the two genera different member subsets
            recs = Path(f).read_text().split(">")
            recs = [r for r in recs if r.strip()]
            part = recs[gi::2] or recs[:1]
            (gd / "fasta_by_function" / fam).write_text(
                "".join(">" + r for r in part))
            if fam not in fams:
                fams.append(fam)

    exp_dir = tmp_path / "exp_merge"
    rc = cli_main(["matrix-distance-merge", str(data), str(base),
                   str(exp_dir), *fams])
    assert rc == 0
    exp = {p.name: p.read_text() for p in exp_dir.iterdir()}

    nproc = 4
    port = _free_port()
    out_dir = tmp_path / "mp_merge"
    _run_cli_ranks(
        lambda pid: ["merge", str(pid), str(nproc), str(port), str(data),
                     str(base), str(out_dir), *fams], nproc)
    got = {p.name: p.read_text() for p in out_dir.iterdir()}
    assert got == exp


@pytest.mark.parametrize("nproc", [2, 4])
def test_multihost_serve(mp_data, tmp_path, nproc):
    """`serve --mesh` over a 2- and 4-process jax.distributed runtime
    (the BASELINE pod-slice service): rank 0's HTTP front-end broadcasts
    each dispatch onto the process-spanning (dp x tp) mesh, other ranks
    run the follower loop.  /query results must equal the single-process
    service's; /add must rebuild the table on ALL ranks (the follow-up
    /query would hang or diverge otherwise); dispatches OVERLAP (depth
    > 1: broadcasts + program launches in ticket order under the
    dispatch lock, collection collective-free off-lock); /quit stops
    the fleet."""
    import time
    import urllib.request

    data, files = mp_data
    fasta_body = b"".join(Path(f).read_bytes() for f in files)

    # single-process expectation through the service layer
    from signature_kmers_tpu.service.server import AnnotationService

    svc = AnnotationService(data)
    expected = svc.query_text(fasta_body)
    assert expected.strip()
    # single-process expectations for the sharded admin endpoints too
    # (VERDICT r4 missing #2: /lookup probes the tp-sharded table via
    # OP_LOOKUP, /matrix runs the mesh distance via OP_MATRIX).  The
    # matrix body duplicates each query under two ids — distinct query
    # families share no signature k-mers, so pairs need twin sequences.
    recs = [r for r in fasta_body.decode().split(">") if r.strip()]
    dup = []
    for r in recs[:3]:
        head, _, seqpart = r.partition("\n")
        rid = head.split()[0]
        dup.append(f">{rid}.a\n{seqpart}")
        dup.append(f">{rid}.b\n{seqpart}")
    matrix_body = "".join(dup).encode()
    expected_lookup = svc.lookup_text(fasta_body)
    expected_matrix = svc.matrix_text(matrix_body)
    # /fq_lookup: six-frame translated calling rides the broadcast
    # dispatch path too — build a FASTQ read that reverse-translates
    # one query protein (simple codon table, frame +1)
    codon = {"A": "GCT", "C": "TGT", "D": "GAT", "E": "GAA", "F": "TTT",
             "G": "GGT", "H": "CAT", "I": "ATT", "K": "AAA", "L": "CTT",
             "M": "ATG", "N": "AAT", "P": "CCT", "Q": "CAA", "R": "CGT",
             "S": "TCT", "T": "ACT", "V": "GTT", "W": "TGG", "Y": "TAT"}
    prot = recs[0].partition("\n")[2].replace("\n", "")
    dna = "".join(codon[c] for c in prot if c in codon)
    fastq_body = f"@read0\n{dna}\n+\n{'I' * len(dna)}\n".encode()
    expected_fq = svc.fq_lookup_text(fastq_body)
    # burst body for the overlap section: >= 3x SKT_SERVE_MIN_FILL (the
    # multihost coalescing gate, default 64 seqs) so concurrent workers
    # actually START — a sub-fill body is correctly serialized into one
    # coalesced batch and shows no overlap
    dup_q = []
    for k in range(7):
        for r in recs:
            head, _, seqpart = r.partition("\n")
            dup_q.append(f">{head.split()[0]}.c{k}\n{seqpart}")
    burst_body = "".join(dup_q).encode()
    expected_burst = svc.query_text(burst_body)
    assert expected_lookup.strip() and expected_matrix.strip()
    assert expected_fq.strip()
    assert expected_burst.count("\n") >= 64
    del svc

    coord = _free_port()
    http_port = _free_port()
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    # 2 ranks x 2 devices, or 4 ranks x 1 device: the (2, 2) mesh then
    # spans every process in both axes
    env["XLA_FLAGS"] = ("--xla_force_host_platform_device_count="
                        + ("2" if nproc == 2 else "1"))
    env["PYTHONPATH"] = str(Path(__file__).resolve().parents[1])
    procs = [
        subprocess.Popen(
            [sys.executable, str(SERVE_DRIVER), str(pid), str(nproc),
             str(coord), str(data), str(http_port)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for pid in range(nproc)
    ]

    def req(path, body=None, timeout=300):
        url = f"http://127.0.0.1:{http_port}{path}"
        try:
            r = urllib.request.urlopen(url, data=body, timeout=timeout)
        except urllib.error.HTTPError as e:  # surface the handler error
            raise AssertionError(
                f"{path} -> HTTP {e.code}: "
                f"{e.read().decode()[:500]}") from None
        return r.read().decode()

    try:
        deadline = time.time() + 300
        up = False
        while time.time() < deadline:
            if any(p.poll() is not None for p in procs):
                break  # a rank died during startup; fall through to asserts
            try:
                up = "signature_kmers_tpu" in req("/version", timeout=5)
                break
            except Exception:
                time.sleep(1.0)
        assert up, "serve front-end never came up"

        got = req("/query", fasta_body)
        assert sorted(got.splitlines()) == sorted(expected.splitlines())

        # multihost serve overlaps dispatches like the single-host
        # batcher (default depth 4): the broadcast lock pins the
        # collective ORDER, not the depth
        sizes = dict(line.split("\t")
                     for line in req("/dump_sizes").splitlines())
        assert sizes["query_depth"] == "4"

        # /lookup and /matrix run TABLE-SHARDED on the spanning mesh
        # (OP_LOOKUP / OP_MATRIX): byte-identical to the single-process
        # service (deterministic row order on both sides)
        assert req("/lookup", fasta_body) == expected_lookup
        assert req("/matrix", matrix_body) == expected_matrix
        assert req("/fq_lookup", fastq_body) == expected_fq

        # /add: broadcast rebuild on every rank; the follow-up query runs
        # on the NEW sharded table on both ranks
        added = req("/add", b"ACDEFGHI\t5\t3\t250\t250\t0\n")
        assert added.strip() == "added 1"
        got2 = req("/query", fasta_body)
        assert sorted(got2.splitlines()) == sorted(expected.splitlines())

        # CONCURRENT /query + /add: the engines-snapshot read and the
        # OP_CALL broadcast must be atomic against OP_ADD + engine swap
        # (multihost._dispatch_lock) — without it the two ranks' lazy
        # table placements issue different Gloo transfer sequences and
        # the fleet aborts on a collective size mismatch (regression:
        # observed SIGABRT, 2 MB placement vs 12 KB input rows)
        import threading

        conc_out: dict = {}
        conc_err: list = []

        def qclient(cid):
            try:
                for i in range(3):
                    conc_out[(cid, i)] = req("/query", burst_body,
                                             timeout=300)
            except Exception as e:  # noqa: BLE001
                conc_err.append(f"q{cid}: {e!r}")

        def aclient():
            try:
                conc_out["add"] = req(
                    "/add", b"CDEFGHIK\t5\t3\t250\t250\t0\n", timeout=300)
            except Exception as e:  # noqa: BLE001
                conc_err.append(f"add: {e!r}")

        sizes0 = dict(line.split("\t")
                      for line in req("/dump_sizes").splitlines())
        t_conc0 = time.perf_counter()
        ths = [threading.Thread(target=qclient, args=(c,))
               for c in range(3)] + [threading.Thread(target=aclient)]
        for t in ths:
            t.start()
        for t in ths:
            t.join()
        t_conc = time.perf_counter() - t_conc0
        assert not conc_err, conc_err
        assert conc_out["add"].strip() == "added 1"
        for k, v in conc_out.items():
            if k != "add":
                assert sorted(v.splitlines()) == \
                    sorted(expected_burst.splitlines()), k

        # overlap counter: cumulative in-dispatch wall time across the
        # concurrent burst exceeds the burst's wall clock — only
        # possible when >1 dispatch was in flight at once on the
        # spanning mesh (VERDICT r4 #1 'done' criterion)
        sizes1 = dict(line.split("\t")
                      for line in req("/dump_sizes").splitlines())
        call_ms = (float(sizes1["query_call_ms"])
                   - float(sizes0["query_call_ms"]))
        assert call_ms > 0
        overlap = call_ms / 1e3 / t_conc
        print(f"overlap ratio at {nproc} ranks: {overlap:.2f} "
              f"({call_ms:.0f} ms in-dispatch / {t_conc*1e3:.0f} ms wall)")
        assert overlap > 1.0, (call_ms, t_conc)

        assert req("/quit").strip() == "OK"
    finally:
        outs = []
        for p in procs:
            try:
                out, _ = p.communicate(timeout=120)
            except subprocess.TimeoutExpired:
                p.kill()
                out, _ = p.communicate(timeout=30)
            outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"serve driver failed:\n{out[-4000:]}"


def test_kill_rank_call_mesh_fails_fast(mp_data, tmp_path):
    """Fault injection (VERDICT r4 #8): rank 1 hard-dies mid
    `call-functions --mesh`; rank 0 must EXIT with a clear error in
    bounded wall time — never hang a Gloo collective indefinitely.
    The failure detector is jax's coordination-service heartbeat: the
    surviving process is terminated with a 'another task died'
    diagnostic (verified by experiment; the reference has no
    distributed runtime to fail at all — its resilience model is
    restartability, kmers-matrix-distance-folder.cc:108-116)."""
    data, files = mp_data
    nproc = 2
    port = _free_port()
    out = tmp_path / "out.tsv"
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = str(Path(__file__).resolve().parents[1])
    procs = []
    for pid in range(nproc):
        e = dict(env)
        if pid == 1:
            e["SKT_TEST_DIE_S"] = "8"  # dies after init, mid-work
        procs.append(subprocess.Popen(
            [sys.executable, str(CLI_DRIVER), "call-mesh", str(pid),
             str(nproc), str(port), str(data), str(out), *files],
            env=e, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True))
    outs = []
    try:
        for p in procs:
            # BOUNDED: the survivor must exit well inside 240 s (the
            # heartbeat timeout is ~10 s + polling); a hang fails here
            o, _ = p.communicate(timeout=240)
            outs.append(o)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.communicate(timeout=30)
    assert procs[1].returncode == 17, outs[1][-2000:]  # the injected death
    # rank 0: non-zero exit with the failure named (not a hang, not rc 0)
    assert procs[0].returncode not in (None, 0), outs[0][-2000:]
    assert ("task died" in outs[0] or "detected fatal errors" in outs[0]
            or "heartbeat timeout" in outs[0]
            or "DEADLINE_EXCEEDED" in outs[0]), outs[0][-3000:]


def test_kill_rank_folder_then_restart_recovers(mp_data, tmp_path):
    """Fault injection + restartability: rank 1 dies mid 2-rank
    `matrix-distance-folder`; the survivor exits with an error, then a
    fresh SINGLE-process run over the same output dir completes the
    remaining files via the output-existence restart skip — the
    reference's recovery model (folder.cc:108-116) survives a dead rank
    here too."""
    data, files = mp_data
    from signature_kmers_tpu.cli.main import main as cli_main

    in_dir = Path(files[0]).parent
    exp_dir = tmp_path / "expected"
    rc = cli_main(["matrix-distance-folder", str(data), str(in_dir),
                   str(exp_dir)])
    assert rc == 0
    exp = {p.name: p.read_text() for p in exp_dir.iterdir()}
    assert exp

    nproc = 2
    port = _free_port()
    out_dir = tmp_path / "mp_out"
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env["PYTHONPATH"] = str(Path(__file__).resolve().parents[1])
    procs = []
    for pid in range(nproc):
        e = dict(env)
        if pid == 1:
            # deterministic: die the moment the fleet writes its first
            # output file (folder runs are short; a timer would race
            # completion)
            e["SKT_TEST_DIE_WHEN_DIR_NONEMPTY"] = str(out_dir)
        procs.append(subprocess.Popen(
            [sys.executable, str(CLI_DRIVER), "folder", str(pid),
             str(nproc), str(port), str(data), str(in_dir), str(out_dir)],
            env=e, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True))
    try:
        for p in procs:
            p.communicate(timeout=240)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.communicate(timeout=30)
    assert procs[1].returncode == 17

    # recovery: a fresh single-process run over the SAME output dir
    # (skips any files the dead fleet already produced)
    rc = cli_main(["matrix-distance-folder", str(data), str(in_dir),
                   str(out_dir)])
    assert rc == 0
    got = {p.name: p.read_text() for p in out_dir.iterdir()}
    assert got == exp


def test_kill_follower_serve_mesh_fails_fast(mp_data, tmp_path):
    """Fault injection on the pod service: the follower rank dies while
    rank 0 is serving; rank 0 must terminate in bounded time (the
    coordination service aborts it with a clear diagnostic) instead of
    hanging its next broadcast forever on a peerless collective."""
    import time
    import urllib.request

    data, files = mp_data
    nproc = 2
    coord = _free_port()
    http_port = _free_port()
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = str(Path(__file__).resolve().parents[1])
    procs = [
        subprocess.Popen(
            [sys.executable, str(SERVE_DRIVER), str(pid), str(nproc),
             str(coord), str(data), str(http_port)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for pid in range(nproc)
    ]
    try:
        deadline = time.time() + 300
        up = False
        while time.time() < deadline:
            if any(p.poll() is not None for p in procs):
                break
            try:
                r = urllib.request.urlopen(
                    f"http://127.0.0.1:{http_port}/version", timeout=5)
                up = b"signature_kmers_tpu" in r.read()
                break
            except Exception:
                time.sleep(1.0)
        assert up, "serve front-end never came up"

        procs[1].kill()  # the follower rank is preempted

        # rank 0 must exit on its own within the heartbeat bound
        t0 = time.time()
        procs[0].communicate(timeout=240)
        assert procs[0].returncode not in (None, 0)
        assert time.time() - t0 < 240
    finally:
        outs = []
        for p in procs:
            if p.poll() is None:
                p.kill()
            try:
                o, _ = p.communicate(timeout=30)
            except Exception:
                o = ""
            outs.append(o)


def test_multihost_cli_annotate_sharding(mp_data, tmp_path):
    """annotate-seqs under 2 jax.distributed processes: file slices per
    process, shard outputs merged by rank 0 for BOTH the calls file and
    the uncalled-ids file."""
    data, files = mp_data
    from signature_kmers_tpu.cli.main import main as cli_main

    seq_dir = Path(files[0]).parent
    exp_calls = tmp_path / "exp_calls"
    exp_unc = tmp_path / "exp_unc"
    rc = cli_main(["annotate-seqs", str(data), "genus-unused", str(seq_dir),
                   str(exp_calls), str(exp_unc)])
    assert rc == 0

    nproc = 2
    port = _free_port()
    calls = tmp_path / "calls"
    unc = tmp_path / "uncalled"
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env["PYTHONPATH"] = str(Path(__file__).resolve().parents[1])
    procs = [
        subprocess.Popen(
            [sys.executable, str(CLI_DRIVER), "annotate", str(pid),
             str(nproc), str(port), str(data), str(seq_dir), str(calls),
             str(unc)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for pid in range(nproc)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.communicate(timeout=30)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"annotate driver failed:\n{out[-4000:]}"
    assert sorted(calls.read_text().splitlines()) \
        == sorted(exp_calls.read_text().splitlines())
    assert sorted(unc.read_text().splitlines()) \
        == sorted(exp_unc.read_text().splitlines())
    assert not list(tmp_path.glob("calls.shard*"))
    assert not list(tmp_path.glob("uncalled.shard*"))
