"""Data-parallel scaling arithmetic for the v5e pod config (VERDICT r4
missing#1b).

Real multi-chip hardware is not reachable from this environment (SURVEY
§9.3(5)): one v5e chip behind a relay.  What CAN be stated exactly is the
communication-volume arithmetic — the per-step gradient all-reduce payload
is a measured quantity (the f32 master gradients are exactly params-sized),
the per-chip step time is the trace-attributed 2.15 ms/step at 128
images/chip (BENCHMARKS.md ledger), and v5e ICI/DCN bandwidths are public
figures.  This tool measures the payloads on the host (no device needed)
and prints the DP-efficiency model at 8/64/256 chips, including the
batch-size floor where the psum hides under backward compute.

Model (stated so the table is checkable):

* ring all-reduce of G bytes over N chips moves 2·G·(N-1)/N ≈ 2·G bytes
  through every chip's ICI;
* v5e ICI: 2D torus, 45 GB/s one-way per link, 2 links per axis direction
  pair → a 2-axis bidirectional all-reduce drains ≈ 4 × 45 = 180 GB/s per
  chip (the "How to Scale Your Model" recipe; a 1-axis ring would be
  90 GB/s — both rows are printed);
* XLA overlaps the psum with the backward pass: grads become ready
  progressively, so comm can hide under t_bwd (≈ 2/3 of the step, the
  fwd:bwd split in the train trace).  step(N) = t_fwd + max(t_bwd, t_comm),
  efficiency = t_step(1-chip-equivalent) / step(N);
* per-chip compute scales linearly in images/chip (measured flat 128→512
  in the batch-size sweeps): t_compute = 16.8 µs/image.

DCN (multi-slice DP) is printed for contrast: ~25 GB/s per HOST (8 chips
share it), so a cross-slice all-reduce is ~60× slower per chip than ICI —
the pod config keeps all 256 chips in ONE ICI slice for exactly this
reason.

Run: ``python3 tools/dp_scaling.py`` (CPU, ~seconds).  Output feeds the
BENCHMARKS.md "DP scaling model" section.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# --- measured constants (BENCHMARKS.md ledger, same-day trace rows) ---
STEP_MS_128 = 2.15          # bf16 fused train step at 128 images/chip
IMAGES_REF = 128
T_PER_IMAGE_US = STEP_MS_128 * 1e3 / IMAGES_REF   # 16.8 us/image
BWD_FRACTION = 2.0 / 3.0    # fwd:bwd split from the train trace

# --- public v5e figures (scaling-book / TPU docs) ---
ICI_LINK_GBPS = 45.0        # one-way per link
ICI_AXES = 2                # v5e 2D torus
DCN_HOST_GBPS = 25.0        # per host, 8 chips/host


def measure_payloads() -> dict:
    """Exact param/optimizer byte counts at production dims (host only)."""
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
    import jax.numpy as jnp

    import __graft_entry__ as ge
    from icl.models import RelationModel
    from icl.train import create_train_state

    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(1000, 300)).astype(np.float32))
    batch = ge._synth_relation_batch(rng, I=2, C=2, L=8, M=4, vocab=1000)
    model = RelationModel(lstm_hidden=200, head_hidden=800)
    state = create_train_state(model, (table, batch), seed=0)
    params_b = sum(x.size * 4 for x in jax.tree.leaves(state.params))
    opt_b = sum(x.size * 4 for x in jax.tree.leaves(state.opt_state))

    # eval-hook pinned footprint at POD dims: --eval_batches 16 batches of
    # 1024 images at the config's largest buckets (C=5, L=48, M=32)
    eb = ge._synth_relation_batch(rng, I=1024, C=5, L=48, M=32, vocab=1000)
    eval_batch_b = sum(np.asarray(v).nbytes for v in eb.values())
    return {"grad_psum_mb": params_b / 2**20,
            "params_plus_adam_mb": (params_b + opt_b) / 2**20,
            "eval_batch_mb_pod_dims": eval_batch_b / 2**20,
            "eval_hook_pinned_mb_16_batches": 16 * eval_batch_b / 2**20}


def allreduce_us(grad_mb: float, n: int, axes: int = ICI_AXES) -> float:
    """Ring all-reduce wall over the ICI at N chips (2-axis by default)."""
    if n <= 1:
        return 0.0
    w_gbps = 2 * axes * ICI_LINK_GBPS          # bidirectional, all axes
    bytes_per_chip = 2 * grad_mb * 2**20 * (n - 1) / n
    return bytes_per_chip / (w_gbps * 1e9) * 1e6


def step_model(grad_mb: float, n: int, global_batch: int) -> dict:
    per_chip = global_batch / n
    t_compute = per_chip * T_PER_IMAGE_US
    t_fwd = t_compute * (1 - BWD_FRACTION)
    t_bwd = t_compute * BWD_FRACTION
    t_comm = allreduce_us(grad_mb, n)
    step = t_fwd + max(t_bwd, t_comm)
    return {"chips": n, "global_batch": global_batch,
            "images_per_chip": per_chip,
            "t_compute_us": round(t_compute, 1),
            "t_psum_us": round(t_comm, 1),
            "step_us": round(step, 1),
            "dp_efficiency": round(t_compute / step, 3),
            "images_per_s": round(global_batch / (step * 1e-6))}


def batch_floor(grad_mb: float, n: int) -> int:
    """Smallest global batch where the psum fully hides under backward."""
    t_comm = allreduce_us(grad_mb, n)
    per_chip = t_comm / (BWD_FRACTION * T_PER_IMAGE_US)
    return int(np.ceil(per_chip * n))


def main():
    pay = measure_payloads()
    g = pay["grad_psum_mb"]
    rows = [step_model(g, n, b)
            for n, b in [(1, 128), (8, 1024), (64, 1024), (256, 1024),
                         (64, 8192), (256, 8192), (256, 32768)]]
    out = {
        "payloads": {k: round(v, 1) for k, v in pay.items()},
        "constants": {
            "step_ms_at_128_img": STEP_MS_128,
            "t_per_image_us": round(T_PER_IMAGE_US, 2),
            "bwd_fraction": round(BWD_FRACTION, 3),
            "ici_link_gbps_oneway": ICI_LINK_GBPS,
            "ici_axes": ICI_AXES,
            "dcn_host_gbps": DCN_HOST_GBPS,
        },
        "allreduce_us": {
            "ici_2axis_256chips": round(allreduce_us(g, 256), 1),
            "ici_1axis_256chips": round(allreduce_us(g, 256, axes=1), 1),
            # DCN: 8 chips funnel through one 25 GB/s host NIC -> per-chip
            # share 25/8 GB/s bidirectional-ish; quote the simple 2G/W form
            "dcn_2slices_per_host": round(
                2 * g * 2**20 / (DCN_HOST_GBPS * 1e9) * 1e6, 1),
        },
        "batch_floor_full_overlap": {str(n): batch_floor(g, n)
                                     for n in (8, 64, 256)},
        "scaling": rows,
    }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
