"""Multi-process checkpoint-save wall through the real CLI (VERDICT r4
missing#3).

Single-process saves overlap the host pull with training (32 ms measured
loop stall); multi-process saves stay synchronous after the hand-rolled
background thread deadlocked multi-controller collective ordering.  This
measures what that synchronous path actually costs: two REAL
`icl-relation --train` processes (4 faked CPU devices each) at production
model dims (lstm 200 / head 800 — the 24 MB params+Adam state), with
`--ckpt_every` low enough to collect several saves, parsing the per-save
"loop stalled N ms" lines the training loop logs.

Co-located CPU processes measure the pod-relevant quantity directly: the
device→host pull here is a local copy (like a pod host's PCIe pull), NOT
the 0.6 s relay artifact — so these numbers ARE the pod-shaped stall, up
to storage speed.

Run: ``python3 tools/ckpt_wall_mp.py [--saves 6]`` (CPU, ~2-4 min).
Prints one JSON line per configuration.  Results → BENCHMARKS.md.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import socket
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "dist", "_cli_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def ensure_data(data_dir: str, images: int = 64) -> None:
    marker = os.path.join(data_dir, ".ckptwall.done")
    if os.path.exists(marker) and open(marker).read().strip() == str(images):
        return
    sys.path.insert(0, REPO)
    from icl.testing.synth import SynthConfig, generate_dataset

    os.makedirs(data_dir, exist_ok=True)
    generate_dataset(data_dir, "train", SynthConfig(
        num_images=images, captions_per_image=2, vocab_size=60, emb_dim=32,
        max_mentions_per_caption=2, max_boxes_per_image=4, seed=0))
    with open(marker, "w") as f:
        f.write(str(images))


def run_cli(data_dir: str, model_dir: str, *, processes: int,
            ckpt_every: int, epochs: int, timeout: int = 1200):
    """Spawn the real relation CLI across N processes; return stdouts."""
    args = ["--train", "--data_dir", data_dir, "--data_split", "train",
            "--epochs", str(epochs), "--images_per_batch", "8",
            "--lstm_hidden_width", "200", "--head_hidden", "800",
            "--dropout", "0.0", "--seed", "7",
            "--ckpt_every", str(ckpt_every),
            "--mesh", "8x1", "--model_file", model_dir]
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    if processes == 1:
        specs = [(8, args)]
    else:
        port = _free_port()
        per = 8 // processes
        specs = [(per, args + ["--coordinator", f"localhost:{port}",
                               "--num_processes", str(processes),
                               "--process_id", str(pid)])
                 for pid in range(processes)]
    procs = [subprocess.Popen(
        [sys.executable, WORKER, str(nd), "relation", *a],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for nd, a in specs]
    outs = [p.communicate(timeout=timeout)[0] for p in procs]
    for p, out in zip(procs, outs):
        if p.returncode != 0:
            raise RuntimeError(f"worker failed rc={p.returncode}:\n{out}")
    return outs


STALL_RE = re.compile(r"checkpoint save at step (\d+): loop stalled "
                      r"(\d+) ms")


def stalls_ms(out: str) -> list[int]:
    return [int(m.group(2)) for m in STALL_RE.finditer(out)]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_dir", default="/tmp/icl_ckptwall_data")
    ap.add_argument("--ckpt_every", type=int, default=2)
    ap.add_argument("--epochs", type=int, default=2)
    args = ap.parse_args()

    ensure_data(args.data_dir)
    results = []
    for processes in (1, 2):
        with tempfile.TemporaryDirectory(prefix="icl_ckptwall_m_") as mdir:
            t0 = time.perf_counter()
            outs = run_cli(args.data_dir, os.path.join(mdir, "m.model"),
                           processes=processes, ckpt_every=args.ckpt_every,
                           epochs=args.epochs)
            wall = time.perf_counter() - t0
        per_proc = [stalls_ms(o) for o in outs]
        assert all(per_proc), "no save-stall lines parsed"
        # the loop blocks on the SLOWEST process at each collective step,
        # so report the per-save max across processes as the pod stall
        n = min(len(s) for s in per_proc)
        per_save = [max(s[i] for s in per_proc) for i in range(n)]
        results.append({
            "processes": processes,
            "saves": n,
            "stall_ms_per_save": per_save,
            "stall_ms_median": sorted(per_save)[n // 2],
            "stall_ms_min": min(per_save),
            "stall_ms_max": max(per_save),
            "total_wall_s": round(wall, 1),
        })
        print(json.dumps(results[-1]), flush=True)


if __name__ == "__main__":
    main()
