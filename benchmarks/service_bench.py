"""Service throughput/latency benchmark (VERDICT r3 missing #2).

BASELINE config #5 is a *streaming* annotation service; this measures it
as numbers: N concurrent HTTP clients posting FASTA /query bodies
against the real serve CLI (subprocess, default device), reporting
qps, seqs/s, p50/p95/p99 request latency, and the coalesced device
batch sizes (from the /dump_sizes query_* counters — the batcher merges
concurrent requests into shared dispatches, service/server.py).

Usage:
  python benchmarks/service_bench.py [n_clients] [seqs_per_req] [seconds]

Data dir: a 30K-sequence synthetic corpus built by the real CLI (cached
under /tmp/skt_service_data); queries are mutated family members (hit-
heavy, like production annotation).
"""

import json
import os
import subprocess
import sys
import threading
import time
import urllib.request
from pathlib import Path

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from e2e_build_bench import generate_corpus  # noqa: E402

N_SEQS_CORPUS = 30_000


def ensure_data() -> Path:
    root = Path("/tmp/skt_service_data")
    # marker versioned: v2 = sub-cliff wide layout (the ~4.4M-key service
    # table now sizes its main store <= 64 MB; stale caches would keep
    # benchmarking the old 268 MB slow-state layout)
    marker = root / ".done_v2"
    if marker.exists():
        return root / "kmer_data"
    import shutil

    if root.exists():
        shutil.rmtree(root)
    generate_corpus(root, N_SEQS_CORPUS, n_genomes=100)
    from signature_kmers_tpu.cli.main import main as cli_main

    rc = cli_main(["build-signatures",
                   "-D", str(root / "Annotations"),
                   "-F", str(root / "Seqs"),
                   "--kmer-data-dir", str(root / "kmer_data"),
                   "--no-recall"])
    assert rc in (0, None)
    marker.touch()
    return root / "kmer_data"


def make_queries(n_req_bodies: int, seqs_per_req: int, seq_len=300,
                 seed=5) -> list:
    """Mutated copies of corpus family sequences -> hit-heavy queries."""
    rng = np.random.default_rng(seed)
    AA = np.frombuffer(b"ACDEFGHIKLMNPQRSTVWY", dtype=np.uint8)
    root = Path("/tmp/skt_service_data")
    fa_files = sorted((root / "Seqs").iterdir())
    recs = []
    for f in fa_files[:4]:
        txt = f.read_text().splitlines()
        recs.extend(txt[i + 1] for i in range(0, len(txt) - 1, 2))
    bodies = []
    for b in range(n_req_bodies):
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


def req(port, path, body=None, timeout=600):
    r = urllib.request.urlopen(
        f"http://127.0.0.1:{port}{path}", data=body, timeout=timeout)
    return r.read().decode()


def main():
    n_clients = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    seqs_per_req = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    seconds = float(sys.argv[3]) if len(sys.argv) > 3 else 20.0

    data = ensure_data()
    bodies = make_queries(64, seqs_per_req)

    # --port 0 + --listen-port-file: the server picks the port, so a
    # parallel job on the host can never steal a pre-probed one
    port_file = data.parent / f"listen.port.{os.getpid()}"
    port_file.unlink(missing_ok=True)

    # --warm: pre-compile the pow2-rows dispatch-shape grid at startup —
    # without it a mid-run first-shape compile lands in the p99 tail
    # (round-4 driver record: p99 816.8 ms unwarmed vs 231 ms warmed)
    proc = subprocess.Popen(
        [sys.executable, "-m", "signature_kmers_tpu.cli.main",
         "serve", "-d", str(data), "--port", "0",
         "--listen-port-file", str(port_file), "--warm", "300"],
        cwd=str(Path(__file__).resolve().parents[1]),
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    try:
        deadline = time.time() + 300
        port = None
        while time.time() < deadline:
            if port is None and port_file.exists():
                port = int(port_file.read_text().strip())
            if port is not None:
                try:
                    req(port, "/version", timeout=5)
                    break
                except Exception:
                    pass
            time.sleep(1.0)
        else:
            raise RuntimeError("service never came up")
        port_file.unlink(missing_ok=True)

        # warmup: compile the device program for the request shape
        t0 = time.time()
        req(port, "/query", bodies[0])
        print(f"warmup query: {time.time()-t0:.1f}s", flush=True)

        sizes0 = dict(line.split("\t") for line in
                      req(port, "/dump_sizes").splitlines())

        lat_lock = threading.Lock()
        latencies = []
        client_errors = []
        stop_at = time.time() + seconds

        def client(cid):
            rng = np.random.default_rng(cid)
            while time.time() < stop_at:
                body = bodies[rng.integers(0, len(bodies))]
                t0 = time.perf_counter()
                try:
                    out = req(port, "/query", body)
                    assert out.count("\n") == seqs_per_req, out[:200]
                except Exception as e:  # noqa: BLE001 — report, don't die
                    with lat_lock:
                        client_errors.append(f"client {cid}: {e!r}")
                    return  # a dead thread deflates qps: flag it below
                dt = time.perf_counter() - t0
                with lat_lock:
                    # completion wall time too: lets the report split the
                    # tail into run-start (residual warmup / first table
                    # touch) vs steady-state (queueing)
                    latencies.append((dt, time.time()))

        t_start = time.time()
        threads = [threading.Thread(target=client, args=(c,))
                   for c in range(n_clients)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        elapsed = time.time() - t_start

        sizes1 = dict(line.split("\t") for line in
                      req(port, "/dump_sizes").splitlines())
        req(port, "/quit")

        for msg in client_errors:
            print(f"CLIENT ERROR: {msg}", file=sys.stderr)
        n_req = len(latencies)
        if n_req == 0:
            print(json.dumps({"error": "no requests completed",
                              "client_errors": client_errors[:5]}),
                  flush=True)
            return
        lat = np.sort(np.asarray([d for d, _t in latencies]))
        # steady-state tail: requests completing after the first quarter
        # of the run — a residual start-of-run stall (first real-table
        # touch, link hiccup) then cannot masquerade as steady queueing
        t_steady = t_start + elapsed * 0.25
        steady = np.sort(np.asarray(
            [d for d, t in latencies if t >= t_steady]))
        batches = int(sizes1["query_batches"]) - int(sizes0["query_batches"])
        seqs = int(sizes1["query_seqs"]) - int(sizes0["query_seqs"])
        call_ms = (float(sizes1.get("query_call_ms", 0))
                   - float(sizes0.get("query_call_ms", 0)))
        result = {
            "n_clients": n_clients,
            "seqs_per_req": seqs_per_req,
            "requests": n_req,
            "qps": round(n_req / elapsed, 1),
            "seqs_per_s": round(n_req * seqs_per_req / elapsed, 1),
            "lat_p50_ms": round(float(lat[n_req // 2]) * 1e3, 1),
            "lat_p95_ms": round(float(lat[int(n_req * 0.95)]) * 1e3, 1),
            "lat_p99_ms": round(float(lat[min(n_req - 1,
                                              int(n_req * 0.99))]) * 1e3, 1),
            # tail attribution: steady-state p99 (post-startup window),
            # the slowest single device dispatch, and the mean dispatch —
            # p99 ~= p50 + call_max says "one stalled dispatch";
            # p99_steady >> mean_batch says "queue depth"
            "lat_p99_steady_ms": round(float(
                steady[min(steady.shape[0] - 1,
                           int(steady.shape[0] * 0.99))]) * 1e3, 1)
            if steady.shape[0] else 0.0,
            "call_max_ms": round(
                float(sizes1.get("query_call_max_ms", 0)), 1),
            # the max BEFORE the measured window (warmup query): when
            # call_max_ms == this, no in-window dispatch stalled
            "call_max_warmup_ms": round(
                float(sizes0.get("query_call_max_ms", 0)), 1),
            "mean_batch_call_ms": round(call_ms / max(1, batches), 1),
            "coalesced_batches": batches,
            "mean_coalesced_seqs": round(seqs / max(1, batches), 1),
            # cumulative wall ms inside call_batch across the run; with
            # overlapped dispatch (query_depth 2) this can exceed elapsed
            "call_ms": round(call_ms, 1),
            "dispatch_depth": int(sizes1.get("query_depth", 1)),
            "elapsed_s": round(elapsed, 1),
            # clients that died mid-run silently deflate qps — flag them
            "dead_clients": len(client_errors),
        }
        print(json.dumps(result), flush=True)
    finally:
        if proc.poll() is None:
            proc.terminate()
            try:
                proc.wait(timeout=30)
            except subprocess.TimeoutExpired:
                proc.kill()
                proc.wait(timeout=30)


if __name__ == "__main__":
    main()
