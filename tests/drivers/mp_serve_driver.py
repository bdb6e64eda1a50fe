"""Multi-host serve driver (launched by test_multiprocess.py).

Runs the real `skt serve --mesh --tp 2` CLI under a multi-process
jax.distributed runtime: rank 0 is the HTTP front-end on the
process-spanning (dp x tp) mesh, other ranks run the follower loop
(service/multihost.py).  The parent test drives the HTTP surface.

Usage:
  python mp_serve_driver.py <pid> <nproc> <coord_port> <data_dir> <http_port>
"""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))


def main():
    pid, nproc, port, data_dir, http_port = sys.argv[1:6]

    import jax

    jax.config.update("jax_platforms", "cpu")
    os.environ["SKT_COORDINATOR"] = f"127.0.0.1:{port}"
    os.environ["SKT_NUM_PROCESSES"] = nproc
    os.environ["SKT_PROCESS_ID"] = pid

    from signature_kmers_tpu.cli.main import main as cli_main

    # --warm: pre-compiles the dispatch shapes rank-by-rank during
    # startup (readiness-gated by the parent's 300 s poll).  Without
    # it, the FIRST real query compiles concurrently on every rank and
    # a loaded host can skew the ranks past Gloo's hard 30 s
    # context-init key-exchange timeout ("GetKeyValue() timed out"),
    # 500-ing the query (observed under a saturating co-located bench).
    rc = cli_main(["serve", "-d", data_dir, "--port", http_port,
                   "--mesh", "--tp", "2", "--warm", "300"])
    print(f"pid={pid} rc={rc}", flush=True)
    sys.exit(rc or 0)


if __name__ == "__main__":
    main()
