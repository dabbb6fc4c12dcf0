"""Worker for the gather_parts failure tests (not a test module).

Two real processes bootstrap jax.distributed, each writes a part file via
:func:`icl.dist.mesh.gather_parts`, and a failure is injected per ``mode``:
``ok`` (no failure), ``fail`` (rank 0's merge raises), ``failwrite``
(rank 1's write_part raises).  The tests assert the contract on the exit
codes and on which files survive: on failure EVERY rank must raise —
nobody may hang at a collective or exit clean — and successful ranks KEEP
their parts (so the merge can be retried); on success the parts are
consumed and only the merged file remains.

Usage: python _gather_fail_worker.py <pid> <nproc> <port> <out_dir> <mode>
"""

import os
import sys


def main():
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)
    pid, nproc, port, out, mode = (int(sys.argv[1]), int(sys.argv[2]),
                                   sys.argv[3], sys.argv[4], sys.argv[5])
    from icl import runtime

    runtime.init(topology="4x1", seed=0,
                 coordinator=f"localhost:{port}",
                 num_processes=nproc, process_id=pid)
    from icl.dist.mesh import gather_parts

    path = os.path.join(out, "merged.out")

    def write_part(part_path):
        if mode == "failwrite" and pid == 1:
            raise OSError("injected part-write failure")
        with open(part_path, "w") as f:
            f.write(f"rank {pid} payload\n")

    def merge(parts):
        if mode == "fail":
            raise OSError("injected merge failure")
        with open(path, "wb") as f:
            for p in parts:
                with open(p, "rb") as pf:
                    f.write(pf.read())
        return path

    try:
        gather_parts(path, "part", write_part, merge)
    except OSError as e:
        print(f"worker {pid}: rank-0 error surfaced: {e}", flush=True)
        sys.exit(3)
    except RuntimeError as e:
        print(f"worker {pid}: peer failure surfaced: {e}", flush=True)
        sys.exit(4)
    print(f"worker {pid}: merged OK", flush=True)


if __name__ == "__main__":
    main()
