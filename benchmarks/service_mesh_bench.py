"""Multi-process `serve --mesh` throughput: overlapped vs serial dispatch.

VERDICT r4 #1 'done' criterion: a 2-process service benchmark showing
the qps uplift of overlapped (depth > 1) dispatch at pod scale.  Rank 0
serves HTTP and broadcasts every dispatch onto the process-spanning
(dp x tp) mesh; rank 1 runs the follower loop.  The same client load is
driven twice — SKT_SERVE_DEPTH=1 (the round-4 serialized behavior) and
the default depth 4 — against fresh fleets.

Runs on the CPU backend (2 virtual devices per rank, Gloo collectives):
this measures the DISPATCH PIPELINE overlap, which is the quantity the
depth changes; chip speed is benchmarked elsewhere.  On real pod
hardware the same code path rides ICI.

Usage:
  python benchmarks/service_mesh_bench.py [n_clients] [seqs_per_req] [seconds]
"""

import json
import os
import socket
import subprocess
import sys
import threading
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from service_bench import req  # noqa: E402

REPO = Path(__file__).resolve().parents[1]
N_SEQS = 3_000  # small corpus: CPU-backend batches stay sub-second, so
#                 the depth sweep completes hundreds of requests


def ensure_data_small() -> Path:
    from e2e_build_bench import generate_corpus

    root = Path("/tmp/skt_service_mesh_data")
    marker = root / ".done"
    if marker.exists():
        return root / "kmer_data"
    import shutil

    if root.exists():
        shutil.rmtree(root)
    generate_corpus(root, N_SEQS, n_genomes=20)
    from signature_kmers_tpu.cli.main import main as cli_main

    rc = cli_main(["build-signatures",
                   "-D", str(root / "Annotations"),
                   "-F", str(root / "Seqs"),
                   "--kmer-data-dir", str(root / "kmer_data"),
                   "--no-recall"])
    assert rc in (0, None)
    marker.touch()
    return root / "kmer_data"


def make_queries_small(n_bodies: int, seqs_per_req: int, seed=5) -> list:
    rng = np.random.default_rng(seed)
    AA = np.frombuffer(b"ACDEFGHIKLMNPQRSTVWY", dtype=np.uint8)
    root = Path("/tmp/skt_service_mesh_data")
    fa_files = sorted((root / "Seqs").iterdir())
    recs = []
    for f in fa_files[:4]:
        txt = f.read_text().splitlines()
        recs.extend(txt[i + 1] for i in range(0, len(txt) - 1, 2))
    bodies = []
    for b in range(n_bodies):
        out = []
        for i in range(seqs_per_req):
            s = np.frombuffer(
                recs[rng.integers(0, len(recs))].encode(), dtype=np.uint8
            ).copy()
            pos = rng.integers(0, s.shape[0], max(1, s.shape[0] // 30))
            s[pos] = AA[rng.integers(0, 20, pos.shape[0])]
            out.append(f">b{b}.s{i}\n{s.tobytes().decode()}\n")
        bodies.append("".join(out).encode())
    return bodies


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def run_fleet(data, bodies, depth: int, n_clients: int, seqs_per_req: int,
              seconds: float, nproc: int = 2) -> dict:
    coord = _free_port()
    http_port = _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = str(REPO)
    env["SKT_SERVE_DEPTH"] = str(depth)
    # coalescing gate: extra workers only run while >= 64 seqs pending,
    # so depth > 1 overlaps FULL batches instead of racing to 1-request
    # dispatches (no effect at depth 1)
    env["SKT_SERVE_MIN_FILL"] = "64"
    env["SKT_COORDINATOR"] = f"127.0.0.1:{coord}"
    env["SKT_NUM_PROCESSES"] = str(nproc)
    procs = []
    for pid in range(nproc):
        e = dict(env)
        e["SKT_PROCESS_ID"] = str(pid)
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "signature_kmers_tpu.cli.main",
             "serve", "-d", str(data), "--port", str(http_port),
             "--mesh", "--tp", "2", "--warm", "300"],
            cwd=str(REPO), env=e,
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL))
    try:
        deadline = time.time() + 300
        while time.time() < deadline:
            if any(p.poll() is not None for p in procs):
                raise RuntimeError("a rank died during startup")
            try:
                req(http_port, "/version", timeout=5)
                break
            except Exception:
                time.sleep(1.0)
        else:
            raise RuntimeError("mesh service never came up")

        req(http_port, "/query", bodies[0])  # compile warmup (single)
        # CONCURRENT pre-load (untimed): coalesced batches hit different
        # (rows, W) program shapes than a lone request; drive the real
        # client load until those have all compiled, so the timed window
        # measures dispatch, not XLA CPU compile storms
        warm_stop = time.time() + 10.0

        def warm_client(cid):
            rng = np.random.default_rng(1000 + cid)
            while time.time() < warm_stop:
                try:
                    req(http_port, "/query",
                        bodies[rng.integers(0, len(bodies))])
                except Exception:
                    return
        wt = [threading.Thread(target=warm_client, args=(c,))
              for c in range(n_clients)]
        for t in wt:
            t.start()
        for t in wt:
            t.join()

        sizes0 = dict(line.split("\t") for line in
                      req(http_port, "/dump_sizes").splitlines())

        lat_lock = threading.Lock()
        latencies: list = []
        errors: list = []
        stop_at = time.time() + seconds

        def client(cid):
            rng = np.random.default_rng(cid)
            while time.time() < stop_at:
                body = bodies[rng.integers(0, len(bodies))]
                t0 = time.perf_counter()
                try:
                    out = req(http_port, "/query", body)
                    assert out.count("\n") == seqs_per_req, out[:200]
                except Exception as e:  # noqa: BLE001
                    with lat_lock:
                        errors.append(f"client {cid}: {e!r}")
                    return
                with lat_lock:
                    latencies.append(time.perf_counter() - t0)

        t_start = time.time()
        threads = [threading.Thread(target=client, args=(c,))
                   for c in range(n_clients)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        elapsed = time.time() - t_start
        sizes1 = dict(line.split("\t") for line in
                      req(http_port, "/dump_sizes").splitlines())
        req(http_port, "/quit")
        for p in procs:
            p.wait(timeout=120)

        lat = np.sort(np.asarray(latencies))
        n_req = lat.shape[0]
        if n_req == 0:
            return {"depth": depth, "error": "no requests",
                    "client_errors": errors[:3]}
        call_ms = (float(sizes1.get("query_call_ms", 0))
                   - float(sizes0.get("query_call_ms", 0)))
        batches = (int(sizes1["query_batches"])
                   - int(sizes0["query_batches"]))
        return {
            "depth": int(sizes1.get("query_depth", depth)),
            "qps": round(n_req / elapsed, 1),
            "lat_p50_ms": round(float(lat[n_req // 2]) * 1e3, 1),
            "lat_p99_ms": round(float(lat[min(n_req - 1,
                                              int(n_req * .99))]) * 1e3, 1),
            "requests": n_req,
            "batches": batches,
            # >1 only when dispatches overlapped in wall time
            "overlap_ratio": round(call_ms / 1e3 / elapsed, 2),
            "dead_clients": len(errors),
        }
    finally:
        for p in procs:
            if p.poll() is None:
                p.terminate()
                try:
                    p.wait(timeout=30)
                except subprocess.TimeoutExpired:
                    p.kill()
                    p.wait(timeout=30)


def main():
    n_clients = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    seqs_per_req = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    seconds = float(sys.argv[3]) if len(sys.argv) > 3 else 15.0

    data = ensure_data_small()
    bodies = make_queries_small(32, seqs_per_req)

    out = {"n_clients": n_clients, "seqs_per_req": seqs_per_req,
           "ranks": 2}
    for depth in (1, 4):
        r = run_fleet(data, bodies, depth, n_clients, seqs_per_req, seconds)
        out[f"depth{depth}"] = r
        print(f"depth {depth}: {r}", file=sys.stderr, flush=True)
    d1, d4 = out.get("depth1", {}), out.get("depth4", {})
    if d1.get("qps") and d4.get("qps"):
        out["qps_uplift"] = round(d4["qps"] / d1["qps"], 2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
