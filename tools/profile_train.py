#!/usr/bin/env python3
"""Decompose relation train-step time on the real TPU (round-2 perf work).

Times several ablated train steps with bench.py's relay-aware scan timer to
attribute the predict↔train gap (VERDICT r1 weak#1) before optimizing:

  full        — production step (fwd+bwd+Adam, dropout on)
  nodrop      — dropout off (isolates dropout mask cost)
  stopenc     — stop_gradient on the BiLSTM encodings (head-only backward)
  headless    — loss directly on mention reps (BiLSTM fwd+bwd only)
  fwdloss     — loss value only, no grad (fwd + loss)
  predict     — deterministic fwd (no loss), the 14.4M baseline

Usage: /opt/venv/bin/python3 tools/profile_train.py [--images 128]
       [--iters 25] [--dtype bf16]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax

from bench import C, DIM, HEAD_H, L, LSTM_H, M, VOCAB, _timed_scan_rate
from icl.models import RelationModel
from icl.train import create_train_state
from icl.train.steps import masked_weighted_ce


def build(images, nbatches, dtype):
    import __graft_entry__ as ge

    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(VOCAB, DIM)).astype(np.float32) * 0.1)
    stacked = jax.tree.map(
        lambda *xs: jnp.stack(xs),
        *[ge._synth_relation_batch(np.random.default_rng(s), I=images, C=C,
                                   L=L, M=M, vocab=VOCAB)
          for s in range(nbatches)])
    one = jax.tree.map(lambda x: x[0], stacked)
    cd = jnp.bfloat16 if dtype == "bf16" else jnp.float32
    model = RelationModel(lstm_hidden=LSTM_H, head_hidden=HEAD_H,
                          compute_dtype=cd)
    state = create_train_state(model, (table, one), seed=0)
    return model, state, table, stacked


def apply_ablated(model, params, table, batch, *, deterministic, drng,
                  stop_enc=False, skip_head=False):
    """RelationModel.__call__ re-derived with ablation switches."""
    from icl.models._dense import DenseParams
    from icl.models.relation import gather_mention_reps
    from icl.models.rnn import BiLSTM
    import flax.linen as nn

    class Ablated(nn.Module):
        @nn.compact
        def __call__(self, emb_table, b):
            tokens, tok_len = b["tokens"], b["tok_len"]
            I, Ci, Li = tokens.shape
            x = jnp.take(emb_table, tokens.reshape(I * Ci, Li), axis=0)
            enc_flat, _ = BiLSTM(model.lstm_hidden,
                                 compute_dtype=model.compute_dtype,
                                 name="caption_bilstm")(
                x, tok_len.reshape(I * Ci))
            enc = enc_flat.reshape(I, Ci, Li, 2 * model.lstm_hidden)
            if stop_enc:
                enc = jax.lax.stop_gradient(enc)
            mreps = gather_mention_reps(enc, b["m_cap"], b["m_first"],
                                        b["m_last"])
            if skip_head:
                s = jnp.sum(mreps, axis=(1, 2))              # [I]
                return jnp.broadcast_to(s[:, None, None],
                                        (*b["pair_label"].shape, 4))
            R = mreps.shape[-1]
            W1, b1 = DenseParams(2 * R, model.head_hidden,
                                 name="head_dense")()
            W2, b2 = DenseParams(model.head_hidden, 4, name="head_out")()
            proj_i = mreps @ W1[:R]
            proj_j = mreps @ W1[R:]
            pair_ij = b["pair_ij"]
            Mm = mreps.shape[1]
            flat_i = proj_i.reshape(I * Mm, -1)
            flat_j = proj_j.reshape(I * Mm, -1)
            img_off = (jnp.arange(I, dtype=jnp.int32) * Mm)[:, None]
            h = (jnp.take(flat_i, img_off + pair_ij[:, :, 0], axis=0)
                 + jnp.take(flat_j, img_off + pair_ij[:, :, 1], axis=0) + b1)
            h = nn.relu(h)
            h = nn.Dropout(model.dropout, deterministic=deterministic)(h)
            return h @ W2 + b2

    return Ablated().apply({"params": params}, table, batch,
                           rngs={"dropout": drng} if not deterministic else {})


def make_step(model, variant):
    cw = jnp.asarray([0.3, 1, 1, 1], jnp.float32)

    def step(state, table, batch):
        drng = state.step_rng()

        def loss_fn(params):
            logits = apply_ablated(
                model, params, table, batch,
                deterministic=(variant == "nodrop"),
                drng=drng,
                stop_enc=(variant == "stopenc"),
                skip_head=(variant == "headless"))
            return masked_weighted_ce(logits, batch["pair_label"],
                                      batch["pair_valid"], cw)

        if variant == "fwdloss":
            loss = loss_fn(state.params)
            return state, loss
        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads), loss

    return step


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=128)
    ap.add_argument("--iters", type=int, default=25)
    ap.add_argument("--dtype", default="bf16")
    args = ap.parse_args()

    model, state, table, stacked = build(args.images, args.iters, args.dtype)
    pairs = args.iters * args.images * (M * (M - 1) // 2)
    results = {}

    for variant in ["predict", "fwdloss", "full", "nodrop", "stopenc",
                    "headless"]:
        if variant == "predict":
            @jax.jit
            def run(state, table, stacked):
                def body(carry, batch):
                    p = jax.nn.softmax(model.apply(
                        {"params": state.params}, table, batch,
                        deterministic=True), axis=-1)
                    return carry + jnp.sum(p), None
                tot, _ = jax.lax.scan(body, jnp.float32(0), stacked)
                return tot
        else:
            step = make_step(model, variant)

            @jax.jit
            def run(state, table, stacked, _step=step):
                def body(st, batch):
                    st, loss = _step(st, table, batch)
                    return st, loss
                st, losses = jax.lax.scan(body, state, stacked)
                return jnp.sum(losses)

        rate = _timed_scan_rate(run, (state, table, stacked), pairs)
        results[variant] = rate
        print(f"{variant:10s} {rate/1e6:8.2f} M pairs/s "
              f"({pairs/rate*1e3:7.1f} ms/call)", flush=True)

    print(json.dumps({k: round(v) for k, v in results.items()}))


if __name__ == "__main__":
    main()
