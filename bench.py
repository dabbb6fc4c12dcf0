#!/usr/bin/env python3
"""Headline benchmark: caption mention-pairs/sec per chip (BASELINE.json).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload: the relation scoring path (BiLSTM caption encoder + pair head at
the reference dims of SURVEY §6.4: lstm 200/dir, head 800, w2v-300) over
Flickr30k-shaped batches.  ``vs_baseline`` is the speedup over the
reference-style pipeline rate: the same model executed per-example through
the Keras-3 CPU oracle (one ``predict`` per pair — how the reference ran,
SURVEY §4.2), measured once on this machine and cached in
``BASELINE_MEASURED.json``.  Driver target: ≥ 50× (BASELINE.md).

Flags: --images N (batch size), --iters N, --denominator (force remeasure),
--full (also bench affinity + write BENCHMARKS.md), --dtype bf16.
"""

from __future__ import annotations

import argparse
import json
import re
import os
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
MEASURED = os.path.join(REPO, "BASELINE_MEASURED.json")

# Flickr30k-shaped workload (5 captions/image, ~16 mentions → 120 pairs)
VOCAB, DIM, C, L, M = 20_000, 300, 5, 32, 16
LSTM_H, HEAD_H = 200, 800


def _fixed_latency():
    """Per-call host↔device roundtrip overhead (the axon relay adds ~30 ms;
    block_until_ready alone does not guarantee completion through it, so all
    timing here uses scalar host transfers and subtracts this latency)."""
    import jax
    import jax.numpy as jnp

    tiny = jax.jit(lambda x: x + 1.0)
    float(tiny(jnp.float32(0)))
    samples = []
    for _ in range(7):
        t0 = time.perf_counter()
        float(tiny(jnp.float32(0)))
        samples.append(time.perf_counter() - t0)
    # min, not mean: latency spikes would inflate the subtraction and
    # over-report rates
    return min(samples)


def _timed_scan_rate(run_fn, args, work_items: int, repeats: int = 5) -> float:
    """Time a jitted scan-over-batches program returning a scalar.

    The scan makes execution inherently sequential on device; the scalar
    return forces true completion through the relay.  Relay latency is
    additive noise (~30 ms ± jitter), so take the MINIMUM of several timed
    calls and subtract the measured fixed latency.  Callers should size the
    scan so device time ≫ latency (≥ 200 ms) for a stable rate.
    """
    lat = _fixed_latency()
    float(run_fn(*args))                         # compile + warm
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(run_fn(*args))
        best = min(best, time.perf_counter() - t0)
    if best - lat < 0.5 * lat:
        # device time is buried in relay latency — report the conservative
        # no-subtraction lower bound instead of a nonsense division
        return work_items / best
    return work_items / (best - lat)


def bench_relation_tpu(images: int, nbatches: int, fused: bool, dtype: str):
    import jax
    import jax.numpy as jnp
    from icl.models import RelationModel

    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(VOCAB, DIM)).astype(np.float32) * 0.1)
    import __graft_entry__ as ge
    stacked = jax.tree.map(
        lambda *xs: jnp.stack(xs),
        *[ge._synth_relation_batch(np.random.default_rng(s), I=images, C=C,
                                   L=L, M=M, vocab=VOCAB)
          for s in range(nbatches)])
    cd = jnp.bfloat16 if dtype == "bf16" else jnp.float32
    table = table.astype(cd)   # frozen w2v table ships in compute dtype
    model = RelationModel(lstm_hidden=LSTM_H, head_hidden=HEAD_H,
                          compute_dtype=cd, fused=fused)
    one = jax.tree.map(lambda x: x[0], stacked)
    params = model.init(jax.random.PRNGKey(0), table, one)["params"]

    @jax.jit
    def run(params, table, stacked):
        def step(carry, batch):
            probs = jax.nn.softmax(
                model.apply({"params": params}, table, batch,
                            deterministic=True), axis=-1)
            return carry + jnp.sum(probs), None
        total, _ = jax.lax.scan(step, jnp.float32(0), stacked)
        return total

    pairs = nbatches * images * (M * (M - 1) // 2)
    return _timed_scan_rate(run, (params, table, stacked), pairs)


def measure_reference_denominator(n_pairs: int = 200) -> float:
    """Reference-style rate: per-example Keras predict over single pairs.

    Mirrors SURVEY §4.2's reference call stack: the model (BiLSTM caption
    encoder + pair head) is BUILT ONCE — as the reference's compiled Keras
    model was — then driven one pair per ``predict`` call, re-encoding both
    captions for every pair exactly as the reference's O(M²) loop did.
    """
    os.environ.setdefault("KERAS_BACKEND", "torch")
    import keras
    import torch

    fwd = keras.layers.LSTM(LSTM_H, return_sequences=True)
    bwd = keras.layers.LSTM(LSTM_H, return_sequences=True, go_backwards=True)
    d1 = keras.layers.Dense(HEAD_H, activation="relu")
    d2 = keras.layers.Dense(4, activation="softmax")
    rng = np.random.default_rng(0)
    emb = rng.normal(size=(VOCAB, DIM)).astype(np.float32) * 0.1
    toks = rng.integers(1, VOCAB, size=(2, L))

    def one_pair():
        x = keras.ops.convert_to_tensor(emb[toks])      # re-embed per pair
        with torch.no_grad():
            f = np.asarray(fwd(x))
            b = np.asarray(bwd(x))[:, ::-1]
            enc = np.concatenate([f, b], -1)
            m_i = np.concatenate([enc[0, 0], enc[0, -1]])
            m_j = np.concatenate([enc[1, 0], enc[1, -1]])
            pair = keras.ops.convert_to_tensor(
                np.concatenate([m_i, m_j])[None])
            return np.asarray(d2(d1(pair)))

    one_pair()                                          # build + warm
    t0 = time.perf_counter()
    for _ in range(n_pairs):
        one_pair()
    dt = time.perf_counter() - t0
    return n_pairs / dt


def bench_affinity_tpu(images: int, nbatches: int, fused: bool, dtype: str):
    import jax
    import jax.numpy as jnp
    from icl.models import AffinityModel

    Mm, B = 16, 24
    rng = np.random.default_rng(1)
    table = jnp.asarray(rng.normal(size=(VOCAB, DIM)).astype(np.float32) * 0.1)

    def one_batch(seed):
        r = np.random.default_rng(seed)
        return {
            "phrase_tokens": jnp.asarray(
                r.integers(1, VOCAB, size=(images, Mm, 8)).astype(np.int32)),
            "phrase_len": jnp.asarray(
                r.integers(1, 6, size=(images, Mm)).astype(np.int32)),
            "box_feats": jnp.asarray(
                r.normal(size=(images, B, 4096)).astype(np.float32) * 0.1),
            "box_valid": jnp.ones((images, B), bool),
            "grid_label": jnp.zeros((images, Mm, B), jnp.int32),
            "grid_valid": jnp.ones((images, Mm, B), bool),
            "img_valid": jnp.ones((images,), bool),
        }

    stacked = jax.tree.map(lambda *xs: jnp.stack(xs),
                           *[one_batch(s) for s in range(nbatches)])
    one = jax.tree.map(lambda x: x[0], stacked)
    cd = jnp.bfloat16 if dtype == "bf16" else jnp.float32
    table = table.astype(cd)   # frozen w2v table ships in compute dtype
    model = AffinityModel(lstm_hidden=LSTM_H, head_hidden=1024,
                          compute_dtype=cd, fused=fused)
    params = model.init(jax.random.PRNGKey(0), table, one)["params"]

    # Scan over batch INDICES into the stacked buffer: sweeps the batch set
    # several times for more device work per transferred byte.  Each step's
    # batch is a device-side dynamic gather, so XLA cannot hoist the body.
    # 24 sweeps put device time ≥250 ms — an order of magnitude above the
    # ~30 ms relay latency, so the rate is no longer a shadowed lower bound
    # (round-1 caveat, VERDICT r1 weak#2).
    sweeps = 24
    idx = jnp.arange(nbatches * sweeps, dtype=jnp.int32) % nbatches

    @jax.jit
    def run(params, table, stacked, idx):
        def step(carry, i):
            batch = jax.tree.map(lambda x: x[i], stacked)
            probs = jax.nn.softmax(
                model.apply({"params": params}, table, batch,
                            deterministic=True), axis=-1)
            return carry + jnp.sum(probs), None
        total, _ = jax.lax.scan(step, jnp.float32(0), idx)
        return total

    return _timed_scan_rate(run, (params, table, stacked, idx),
                            nbatches * sweeps * images * Mm * B)


def bench_relation_train(images: int, nbatches: int, dtype: str,
                         fused: bool = True):
    """Training throughput: full fwd+bwd+Adam step, pairs/sec.

    ``fused`` (TPU) trains through the grid_head_train custom-VJP kernel
    with in-kernel dropout — the production TPU path since round 2."""
    import jax
    import jax.numpy as jnp
    import __graft_entry__ as ge
    from icl.models import RelationModel
    from icl.train import create_train_state, make_relation_train_step

    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(VOCAB, DIM)).astype(np.float32) * 0.1)
    stacked = jax.tree.map(
        lambda *xs: jnp.stack(xs),
        *[ge._synth_relation_batch(np.random.default_rng(s), I=images, C=C,
                                   L=L, M=M, vocab=VOCAB)
          for s in range(nbatches)])
    one = jax.tree.map(lambda x: x[0], stacked)
    cd = jnp.bfloat16 if dtype == "bf16" else jnp.float32
    table = table.astype(cd)   # frozen w2v table ships in compute dtype
    model = RelationModel(lstm_hidden=LSTM_H, head_hidden=HEAD_H,
                          compute_dtype=cd, fused=fused)
    state = create_train_state(model, (table, one), seed=0)
    step = make_relation_train_step(class_weights=[0.3, 1, 1, 1],
                                    donate=False, grid_loss=fused)

    # sweep the batch set several times via device-side index gathers so
    # total device time ≫ the ~30 ms relay latency (same pattern as the
    # affinity predict bench); the optimizer state threads through normally
    sweeps = 4
    idx = jnp.arange(nbatches * sweeps, dtype=jnp.int32) % nbatches

    @jax.jit
    def run(state, table, stacked, idx):
        def body(st, i):
            batch = jax.tree.map(lambda x: x[i], stacked)
            st, metrics = step(st, table, batch)
            return st, metrics["loss"]
        st, losses = jax.lax.scan(body, state, idx)
        return jnp.sum(losses)

    pairs = nbatches * sweeps * images * (M * (M - 1) // 2)
    return _timed_scan_rate(run, (state, table, stacked, idx), pairs)


def bench_affinity_train(images: int, nbatches: int, dtype: str,
                         fused: bool = True):
    """Affinity training throughput: full fwd+bwd+Adam, grid cells/sec."""
    import jax
    import jax.numpy as jnp
    import __graft_entry__ as ge
    from icl.models import AffinityModel
    from icl.train import create_train_state, make_affinity_train_step

    Mm, B = 16, 24
    rng = np.random.default_rng(2)
    table = jnp.asarray(rng.normal(size=(VOCAB, DIM)).astype(np.float32) * 0.1)
    stacked = jax.tree.map(
        lambda *xs: jnp.stack(xs),
        *[ge._synth_affinity_batch(np.random.default_rng(100 + s), I=images,
                                   M=Mm, B=B, L=8, vocab=VOCAB,
                                   box_dim=4096)
          for s in range(nbatches)])
    one = jax.tree.map(lambda x: x[0], stacked)
    cd = jnp.bfloat16 if dtype == "bf16" else jnp.float32
    table = table.astype(cd)   # frozen w2v table ships in compute dtype
    model = AffinityModel(lstm_hidden=LSTM_H, head_hidden=1024,
                          compute_dtype=cd, fused=fused)
    state = create_train_state(model, (table, one), seed=0)
    step = make_affinity_train_step(donate=False, grid_loss=fused)

    # 48 index sweeps: the affinity step is ~0.65 ms on device, so a plain
    # 10-batch scan sits UNDER the relay latency and reports a floored
    # lower bound (the round-1 affinity-predict mistake, repeated by the
    # first round-2 version of this function — 3.3M "measured" vs ~19M real)
    sweeps = 48
    idx = jnp.arange(nbatches * sweeps, dtype=jnp.int32) % nbatches

    @jax.jit
    def run(state, table, stacked, idx):
        def body(st, i):
            batch = jax.tree.map(lambda x: x[i], stacked)
            st, metrics = step(st, table, batch)
            return st, metrics["loss"]
        st, losses = jax.lax.scan(body, state, idx)
        return jnp.sum(losses)

    cells = nbatches * sweeps * images * Mm * B
    return _timed_scan_rate(run, (state, table, stacked, idx), cells)



def bench_mention(task: str, mentions: int, nbatches: int, dtype: str,
                  train: bool = False):
    """Mention-task (nonvisual/cardinality FFNN) throughput, mentions/sec.

    The fourth task family previously had NO regression-visible number
    (VERDICT r3 weak#4) — an FFNN-path slowdown was invisible to bench.
    Workload: production dims (hidden 300 over mean-pooled 300-d w2v,
    2 or 12 classes), L=16 token spans, same scan-over-device-indices
    timing as the other benches (the FFNN is tiny, so many sweeps keep
    device time above the relay latency)."""
    import jax
    import jax.numpy as jnp

    from icl.models import CARDINALITY_CLASSES, CardinalityModel, NonvisualModel
    from icl.models.nonvisual import mean_pool_tokens
    from icl.train import create_train_state, make_mention_train_step
    from icl.train.steps import make_mention_predict

    ncls = 2 if task == "nonvisual" else len(CARDINALITY_CLASSES)
    Lm = 16
    rng = np.random.default_rng(3)
    table = jnp.asarray(rng.normal(size=(VOCAB, DIM)).astype(np.float32) * 0.1)
    cd = jnp.bfloat16 if dtype == "bf16" else jnp.float32
    table = table.astype(cd)   # frozen w2v table ships in compute dtype

    def one_batch(seed):
        r = np.random.default_rng(seed)
        ln = r.integers(1, Lm + 1, size=mentions).astype(np.int32)
        tok = r.integers(1, VOCAB, size=(mentions, Lm)).astype(np.int32)
        tok[np.arange(Lm)[None] >= ln[:, None]] = 0
        lab = r.integers(0, ncls, size=mentions).astype(np.int32)
        return (jnp.asarray(tok), jnp.asarray(ln), jnp.asarray(lab),
                jnp.ones(mentions, bool))

    stacked = jax.tree.map(lambda *xs: jnp.stack(xs),
                           *[one_batch(s) for s in range(nbatches)])
    model = (NonvisualModel(hidden=300, num_classes=2) if task == "nonvisual"
             else CardinalityModel(hidden=300))
    pooled0 = mean_pool_tokens(table, stacked[0][0], stacked[1][0])
    state = create_train_state(model, (pooled0,), seed=0)

    # hundreds of sweeps: one FFNN batch is microseconds of device time —
    # anything less sits far below the ~30 ms relay latency floor
    sweeps = max(1, (3_000_000 // (mentions * nbatches)))
    idx = jnp.arange(nbatches * sweeps, dtype=jnp.int32) % nbatches

    if train:
        step = make_mention_train_step(donate=False)

        @jax.jit
        def run(state, table, stacked, idx):
            def body(st, i):
                b = jax.tree.map(lambda x: x[i], stacked)
                st, metrics = step(st, table, *b)
                return st, metrics["loss"]
            st, losses = jax.lax.scan(body, state, idx)
            return jnp.sum(losses)

        return _timed_scan_rate(run, (state, table, stacked, idx),
                                nbatches * sweeps * mentions)

    predict = make_mention_predict(model.apply)

    @jax.jit
    def run(params, table, stacked, idx):
        def body(carry, i):
            tok, ln, _, _ = jax.tree.map(lambda x: x[i], stacked)
            return carry + jnp.sum(predict(params, table, tok, ln)), None
        total, _ = jax.lax.scan(body, jnp.float32(0), idx)
        return total

    return _timed_scan_rate(run, (state.params, table, stacked, idx),
                            nbatches * sweeps * mentions)


def _preserved_hand_sections(old: str) -> str:
    """Return every hand-maintained '## <title>' section verbatim from the
    existing BENCHMARKS.md, in their original order.  These sections (the
    optimization ledger, scale rehearsal, flagship run, checkpoint wall,
    serve throughput, DP scaling model, ...) are an engineering record
    appended to across rounds — regenerating the file must carry ALL of
    them forward.  An allowlist of known titles silently DELETED the four
    r5 sections when --full next ran (r5 finding); instead, everything but
    the sections this script itself generates is preserved."""
    generated = ("Precision policy", "Timing methodology", "Parity")
    out = []
    for m in re.finditer(r"^## (.+?)\n.*?(?=^## |\Z)", old, re.M | re.S):
        if not m.group(1).strip().startswith(generated):
            out.append(m.group(0).rstrip() + "\n\n")
    if not out:
        return ("## Optimization ledger (relation)\n\n(hand-maintained "
                "section absent - see git history of BENCHMARKS.md)\n\n")
    return "".join(out)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=128)
    ap.add_argument("--iters", type=int, default=100,
                    help="batches scanned per timed call; keep device time "
                         "well above the ~30ms relay latency")
    ap.add_argument("--denominator", action="store_true",
                    help="force remeasure of the reference CPU rate")
    ap.add_argument("--full", action="store_true")
    ap.add_argument("--dtype", default="f32", choices=["f32", "bf16"])
    ap.add_argument("--precision", default="high",
                    choices=["high", "highest", "default"],
                    help="matmul precision; 'high' (bf16_3x, the default) "
                         "is the parity-grade scoring mode — TPU "
                         "default-precision f32 deviates up to 4.5e-3 from "
                         "the oracle (BENCHMARKS.md)")
    ap.add_argument("--no-fused", action="store_true")
    args = ap.parse_args()

    import jax
    if args.precision != "default":
        jax.config.update("jax_default_matmul_precision", args.precision)
    platform = jax.devices()[0].platform
    fused = (platform == "tpu") and not args.no_fused

    rate = bench_relation_tpu(args.images, args.iters, fused, args.dtype)

    ref_rate = None
    if os.path.exists(MEASURED) and not args.denominator:
        with open(MEASURED) as f:
            cached = json.load(f)
        # the cached CPU denominator is only valid for the workload it was
        # measured on — a changed constant silently skews vs_baseline
        if cached.get("workload") == {"vocab": VOCAB, "dim": DIM, "L": L,
                                      "lstm": LSTM_H, "head": HEAD_H}:
            ref_rate = cached.get("reference_pairs_per_sec")
    if ref_rate is None:
        ref_rate = measure_reference_denominator()
        with open(MEASURED, "w") as f:
            json.dump({"reference_pairs_per_sec": ref_rate,
                       "note": "Keras-3 CPU oracle, one predict per pair "
                               "(reference-style per-example loop, SURVEY §4.2)",
                       "workload": {"vocab": VOCAB, "dim": DIM, "L": L,
                                    "lstm": LSTM_H, "head": HEAD_H}}, f,
                      indent=2)

    result = {
        "metric": "caption_mention_pairs_per_sec",
        "value": round(rate, 1),
        "unit": f"pairs/s/chip ({platform}, {args.dtype}, "
                f"{args.precision}-precision"
                f"{', fused' if fused else ''})",
        "vs_baseline": round(rate / ref_rate, 1),
    }
    if args.full:
        # bf16 predict is ~2x faster, so the same iter count leaves the
        # per-call device time near the relay latency — triple it so the
        # measurement is not latency-dominated (measured 17-20M pairs/s
        # across sessions at >=200 ms device time; an early 21.8M reading
        # at 28 ms device time reflected relay-day variance)
        rate_bf16 = (rate if args.dtype == "bf16" else
                     bench_relation_tpu(args.images, args.iters * 3, fused,
                                        "bf16"))
        aff = bench_affinity_tpu(min(args.images, 32),
                                 max(args.iters, 30), fused, args.dtype)
        train_rate = bench_relation_train(args.images,
                                          max(args.iters // 4, 10), "bf16",
                                          fused=fused)
        aff_train = bench_affinity_train(min(args.images, 32),
                                         max(args.iters // 4, 10), "bf16",
                                         fused=fused)
        nv_pred = bench_mention("nonvisual", 4096, 8, args.dtype)
        nv_train = bench_mention("nonvisual", 4096, 8, "bf16", train=True)
        card_pred = bench_mention("cardinality", 4096, 8, args.dtype)
        card_train = bench_mention("cardinality", 4096, 8, "bf16",
                                   train=True)
        bm_path = os.path.join(REPO, "BENCHMARKS.md")
        old_doc = ""
        if os.path.exists(bm_path):
            with open(bm_path) as f0:
                old_doc = f0.read()
        hand_sections = _preserved_hand_sections(old_doc)
        with open(bm_path, "w") as f:
            f.write(
                "# Benchmarks\n\n"
                f"Platform: {platform}; headline dtype {args.dtype} at "
                f"{args.precision} matmul precision; fused={fused}; "
                f"workload: Flickr30k-shaped relation batches (L={L}, "
                f"C={C}, M={M}, lstm {LSTM_H}, head {HEAD_H}).\n\n"
                "| metric | value | unit |\n|---|---|---|\n"
                f"| caption mention-pairs/sec (predict, {args.dtype}, "
                f"{args.precision} precision"
                + (" — parity-grade headline"
                   if args.dtype == "f32" and args.precision != "default"
                   else " — throughput mode, see precision policy")
                + f") | {rate:,.0f} | pairs/s/chip |\n"
                f"| caption mention-pairs/sec (predict, bf16) | "
                f"{rate_bf16:,.0f} | pairs/s/chip |\n"
                f"| caption mention-pairs/sec (train fwd+bwd+Adam, bf16, "
                f"fused-train kernel) | {train_rate:,.0f} | pairs/s/chip |\n"
                f"| phrase-box affinities/sec (predict, {args.dtype}, "
                f"fused K2) | {aff:,.0f} | cells/s/chip |\n"
                f"| phrase-box affinities/sec (train fwd+bwd+Adam, bf16, "
                f"fused-train kernel) | {aff_train:,.0f} | cells/s/chip |\n"
                f"| nonvisual mentions/sec (predict, {args.dtype}) | "
                f"{nv_pred:,.0f} | mentions/s/chip |\n"
                f"| nonvisual mentions/sec (train fwd+bwd+Adam, bf16) | "
                f"{nv_train:,.0f} | mentions/s/chip |\n"
                f"| cardinality mentions/sec (predict, {args.dtype}) | "
                f"{card_pred:,.0f} | mentions/s/chip |\n"
                f"| cardinality mentions/sec (train fwd+bwd+Adam, bf16) | "
                f"{card_train:,.0f} | mentions/s/chip |\n"
                f"| reference pipeline rate (Keras-3 CPU oracle, per-example)"
                f" | {ref_rate:,.1f} | pairs/s |\n"
                f"| **speedup vs reference** | **{rate / ref_rate:,.0f}x** | "
                ">=50x target (BASELINE.md) |\n\n"
                "The affinity predict workload scans 24 on-device sweeps "
                "(>=250 ms device time, ~10x the relay latency), so the "
                "round-1 'latency-shadowed lower bound' caveat no longer "
                "applies — this is a clean measurement.\n\n"
                "## Precision policy (measured on v5e)\n\n"
                "- TPU 'default' matmul precision multiplies f32 in bf16: "
                "scores deviate from the CPU oracle by up to 4.5e-3 — far "
                "over the 1e-5 gate. Predict/serve/bench therefore default "
                "to 'high' (bf16_3x): measured 2.15e-5 vs the oracle and "
                "45% faster than 'highest' (which measures 3.06e-5 — the "
                "residual is transcendental ULP drift through the LSTM "
                "recurrence, not matmuls; fused kernels irrelevant to it).\n"
                "- Oracle gate is platform-aware: 1e-5 CPU (measured "
                "~1.5e-7), 5e-5 TPU.\n"
                "- bf16 compute (`compute_dtype`) deviates up to 7.1e-5 — a "
                "throughput mode, not parity-grade.\n"
                "- Predict-kernel dots are pinned to HIGHEST (Mosaic "
                "rejects HIGH; measured faster than a VPU formulation at "
                "the predict tile shapes). The TRAIN kernel's dots follow "
                "the session policy: one-pass-bf16 DEFAULT in production, "
                "exact-f32 under 'highest' (parity contexts/tests).\n"
                "- Training runs at 'default' precision (throughput).\n\n"
                + hand_sections +
                                "## Timing methodology\n\n"
                "Work is chained on-device via lax.scan over distinct "
                "stacked batches inside one jit call and forced by a scalar "
                "host transfer; best of 5 calls; the measured fixed relay "
                "latency (~30ms, min of 7) is subtracted when device time "
                "exceeds 1.5x latency, else the unsubtracted lower bound is "
                "reported. block_until_ready alone over-reports ~10x "
                "through the axon relay (see bench.py docstrings). "
                "Sub-relay-latency microbenchmarks are meaningless here — "
                "kernel-level attribution uses jax.profiler device traces "
                "instead (tools/profile_train.py). Rates also vary a few "
                "percent across sessions with relay conditions — compare "
                "numbers measured the same day (the table above is "
                "regenerated in one run). HOST-side timings (dataset load, "
                "batch assembly) carry a larger caveat: the build/bench "
                "host is a single burst-throttled vCPU measuring up to ~3x "
                "slower for the same work when its CPU credit is exhausted "
                "(a 20M-element np.diff measured 0.06-4.0 s across "
                "consecutive runs) — the scale-table load walls are from a "
                "full-credit window, and device rates are unaffected.\n\n"
                "## Parity\n\n"
                "\"Bit-compatible\" is operationalized per SURVEY §7.3: "
                "bitwise-deterministic .scores across runs with fixed "
                "seed/config, plus probability parity vs the Keras-3 oracle "
                "holding identical weights (gates above; tests/parity/, "
                "--oracle-parity[-full] CLI flags). All four task models "
                "carry an oracle gate (incl. cardinality since round 2). "
                "The fused affinity-rank kernel path (icl-affinity "
                "--rank_file) measures max|p - p_oracle| = 4.0e-07 on v5e "
                "vs a float64 oracle at production dims (G=16, A=16, B=24, "
                "K=1024, masked boxes, 'high' policy).\n")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
