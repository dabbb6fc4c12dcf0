#!/usr/bin/env python3
"""Trace the PRODUCTION fused predict path (the bench.py headline).

Usage: /opt/venv/bin/python3 tools/trace_predict.py [--task affinity]
       [--images 128] [--iters 10] [--dtype f32] [--out /tmp/icl_ptrace]
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
    ap = argparse.ArgumentParser(allow_abbrev=False)
    ap.add_argument("--task", default="relation",
                    choices=["relation", "affinity"])
    ap.add_argument("--images", type=int, default=128)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--dtype", default="f32", choices=["f32", "bf16"])
    ap.add_argument("--out", default="/tmp/icl_ptrace")
    args = ap.parse_args()

    import bench
    import __graft_entry__ as ge
    from icl.models import AffinityModel, RelationModel

    if args.dtype == "f32":
        jax.config.update("jax_default_matmul_precision", "high")
    rng = np.random.default_rng(0)
    table = jnp.asarray(
        rng.normal(size=(bench.VOCAB, bench.DIM)).astype(np.float32) * 0.1)
    cd = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    table = table.astype(cd)   # matches bench/CLI: table ships in compute dtype
    if args.task == "relation":
        stacked = jax.tree.map(
            lambda *xs: jnp.stack(xs),
            *[ge._synth_relation_batch(np.random.default_rng(s),
                                       I=args.images, C=bench.C, L=bench.L,
                                       M=bench.M, vocab=bench.VOCAB)
              for s in range(args.iters)])
        model = RelationModel(lstm_hidden=bench.LSTM_H,
                              head_hidden=bench.HEAD_H,
                              compute_dtype=cd, fused=True)
    else:
        # same shapes as bench_affinity_tpu (L=8, M=16, B=24, fc7 4096)
        stacked = jax.tree.map(
            lambda *xs: jnp.stack(xs),
            *[ge._synth_affinity_batch(np.random.default_rng(s),
                                       I=args.images, L=8, M=16, B=24,
                                       vocab=bench.VOCAB, box_dim=4096)
              for s in range(args.iters)])
        model = AffinityModel(lstm_hidden=bench.LSTM_H, head_hidden=1024,
                              compute_dtype=cd, fused=True)
    one = jax.tree.map(lambda x: x[0], stacked)
    params = model.init(jax.random.PRNGKey(0), table, one)["params"]

    @jax.jit
    def run(params, table, stacked):
        def body(carry, batch):
            p = jax.nn.softmax(model.apply({"params": params}, table, batch,
                                           deterministic=True), axis=-1)
            return carry + jnp.sum(p), None
        tot, _ = jax.lax.scan(body, jnp.float32(0), stacked)
        return tot

    float(run(params, table, stacked))
    with jax.profiler.trace(args.out):
        for _ in range(3):
            float(run(params, table, stacked))
    print(f"calls traced: {3 * args.iters}")
    print(args.out)


if __name__ == "__main__":
    main()
