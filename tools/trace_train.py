#!/usr/bin/env python3
"""Capture a jax.profiler trace of the PRODUCTION fused train step.

Wall-clock micros are relay-floored (BENCHMARKS.md), so kernel attribution
comes from device traces: this runs bench.py's relation (or affinity) train
workload warmed up, traces a few scan calls, and prints the trace dir for
tools/trace_summary.py.

Usage: /opt/venv/bin/python3 tools/trace_train.py [--task relation]
       [--images 128] [--iters 10] [--out /tmp/icl_trace]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--task", default="relation",
                    choices=["relation", "affinity"])
    ap.add_argument("--images", type=int, default=128)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--dtype", default="bf16", choices=["f32", "bf16"])
    ap.add_argument("--out", default="/tmp/icl_trace")
    args = ap.parse_args()

    import jax as _jax
    if args.dtype == "f32":
        # match bench.py's production precision: default-precision f32
        # GEMMs are different (bf16-pass) kernels and mis-attribute
        _jax.config.update("jax_default_matmul_precision", "high")
    import bench
    import __graft_entry__ as ge
    from icl.train import create_train_state

    rng = np.random.default_rng(0)
    table = jnp.asarray(
        rng.normal(size=(bench.VOCAB, bench.DIM)).astype(np.float32) * 0.1)
    cd = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    table = table.astype(cd)   # matches the CLI: table ships in compute dtype

    if args.task == "relation":
        from icl.models import RelationModel
        from icl.train import make_relation_train_step
        stacked = jax.tree.map(
            lambda *xs: jnp.stack(xs),
            *[ge._synth_relation_batch(np.random.default_rng(s),
                                       I=args.images, C=bench.C, L=bench.L,
                                       M=bench.M, vocab=bench.VOCAB)
              for s in range(args.iters)])
        model = RelationModel(lstm_hidden=bench.LSTM_H,
                              head_hidden=bench.HEAD_H,
                              compute_dtype=cd, fused=True)
        one = jax.tree.map(lambda x: x[0], stacked)
        state = create_train_state(model, (table, one), seed=0)
        step = make_relation_train_step(class_weights=[0.3, 1, 1, 1],
                                        donate=False, grid_loss=True)
    else:
        from icl.models import AffinityModel
        from icl.train import make_affinity_train_step
        stacked = jax.tree.map(
            lambda *xs: jnp.stack(xs),
            *[ge._synth_affinity_batch(np.random.default_rng(s),
                                       I=args.images, L=8, M=16, B=24,
                                       vocab=bench.VOCAB, box_dim=4096)
              for s in range(args.iters)])
        model = AffinityModel(lstm_hidden=bench.LSTM_H, head_hidden=1024,
                              compute_dtype=cd, fused=True)
        one = jax.tree.map(lambda x: x[0], stacked)
        state = create_train_state(model, (table, one), seed=0)
        step = make_affinity_train_step(donate=False, grid_loss=True)

    @jax.jit
    def run(state, table, stacked):
        def body(st, batch):
            st, metrics = step(st, table, batch)
            return st, metrics["loss"]
        st, losses = jax.lax.scan(body, state, stacked)
        return jnp.sum(losses)

    # warm up (compile + first dispatch)
    float(run(state, table, stacked))
    with jax.profiler.trace(args.out):
        for _ in range(3):
            float(run(state, table, stacked))
    print(f"steps traced: {3 * args.iters}")
    print(args.out)


if __name__ == "__main__":
    main()
