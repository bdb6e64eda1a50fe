"""Multi-host CLI driver (launched by test_multiprocess.py).

Runs the real `skt call-functions` CLI under a 2-process
jax.distributed runtime, exercising the multi-host I/O sharding path:
each process parses only its file slice, writes a private shard, and
process 0 merges (cli/main.py cmd_call).

Usage:
  python mp_cli_driver.py call <pid> <nproc> <port> <data_dir> <out> <files...>
  python mp_cli_driver.py annotate <pid> <nproc> <port> <data_dir> \
      <seq_dir> <calls_out> <uncalled_out>
"""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))


def main():
    mode = sys.argv[1]
    pid, nproc, port = sys.argv[2], sys.argv[3], sys.argv[4]
    data_dir = sys.argv[5]

    import jax

    jax.config.update("jax_platforms", "cpu")
    os.environ["SKT_COORDINATOR"] = f"127.0.0.1:{port}"
    os.environ["SKT_NUM_PROCESSES"] = nproc
    os.environ["SKT_PROCESS_ID"] = pid

    # fault injection (tests/test_multiprocess.py kill-a-rank tests):
    # this rank hard-dies mid-run, simulating preemption/crash — the
    # SURVIVORS must then exit with a clear error in bounded time
    # (jax's coordination service heartbeat), never hang a collective
    die_s = os.environ.get("SKT_TEST_DIE_S")
    die_dir = os.environ.get("SKT_TEST_DIE_WHEN_DIR_NONEMPTY")
    if die_s or die_dir:
        import threading
        import time as _time

        def _die():
            if die_dir:
                # deterministic mid-run trigger: fire as soon as the
                # fleet has produced its FIRST output file (guaranteed
                # after distributed init, before the run completes)
                d = Path(die_dir)
                while not (d.is_dir() and any(d.iterdir())):
                    _time.sleep(0.05)
            else:
                _time.sleep(float(die_s))
            print(f"pid={pid} injected fault (os._exit 17)", flush=True)
            sys.stdout.flush()
            os._exit(17)

        threading.Thread(target=_die, daemon=True).start()

    from signature_kmers_tpu.cli.main import main as cli_main

    if mode == "call":
        out, files = sys.argv[6], sys.argv[7:]
        rc = cli_main(["call-functions", "-d", data_dir, "-i", *files,
                       "-o", out])
    elif mode == "call-mesh":
        # multi-host --mesh: each rank must build a LOCAL mesh over its
        # own devices (regression for the jax.devices()[:n] slicing bug)
        out, files = sys.argv[6], sys.argv[7:]
        rc = cli_main(["call-functions", "-d", data_dir, "-i", *files,
                       "-o", out, "--mesh", "--tp", "1"])
    elif mode == "folder":
        # 4-way I/O sharding of the restartable folder batch (ref:
        # kmers-matrix-distance-folder.cc:108-116): each process takes a
        # disjoint file slice and writes its own per-file outputs
        input_dir, output_dir = sys.argv[6], sys.argv[7]
        rc = cli_main(["matrix-distance-folder", data_dir, input_dir,
                       output_dir])
    elif mode == "merge":
        # family work list sharded across processes (*-merge.cc:125-135)
        base_dir, output_dir, fams = sys.argv[6], sys.argv[7], sys.argv[8:]
        rc = cli_main(["matrix-distance-merge", data_dir, base_dir,
                       output_dir, *fams])
    else:
        seq_dir, calls_out, uncalled_out = sys.argv[6:9]
        rc = cli_main(["annotate-seqs", data_dir, "genus-unused", seq_dir,
                       calls_out, uncalled_out])
    print(f"pid={pid} rc={rc}", flush=True)
    sys.exit(rc)


if __name__ == "__main__":
    main()
