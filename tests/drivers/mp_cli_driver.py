"""Multi-host CLI driver (launched by test_multiprocess.py).

Runs the real `skt call-functions` CLI under a 2-process
jax.distributed runtime, exercising the multi-host I/O sharding path:
each process parses only its file slice, writes a private shard, and
process 0 merges (cli/main.py cmd_call).

Usage: python mp_cli_driver.py <pid> <nproc> <port> <data_dir> <out> <files...>
"""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))


def main():
    pid, nproc, port = sys.argv[1], sys.argv[2], sys.argv[3]
    data_dir, out = sys.argv[4], sys.argv[5]
    files = sys.argv[6:]

    import jax

    jax.config.update("jax_platforms", "cpu")
    os.environ["SKT_COORDINATOR"] = f"127.0.0.1:{port}"
    os.environ["SKT_NUM_PROCESSES"] = nproc
    os.environ["SKT_PROCESS_ID"] = pid

    from signature_kmers_tpu.cli.main import main as cli_main

    rc = cli_main(["call-functions", "-d", data_dir, "-i", *files,
                   "-o", out])
    print(f"pid={pid} rc={rc}", flush=True)
    sys.exit(rc)


if __name__ == "__main__":
    main()
