"""MSCOCO-scale rehearsal: load + train + resume a ~50k-image synthetic split.

SURVEY §1 [B:11] claims the rebuild handles "MSCOCO at larger scale"; this
tool turns that from extrapolation into measurement (VERDICT r2 missing#2).
It generates (once, cached on disk) a synthetic split of --images images,
then measures:

* dataset-generation and dataset-load wall time,
* RSS after load and peak RSS across the run,
* steady training throughput over --steps steps (threaded prefetch, same
  path as the CLI), separately for relation and affinity,
* time-to-resume: wall time of a --resume auto run capped at ONE step
  from a mid-training checkpoint (skip-aware schedule: no host-side
  replay of trained batches).  NOTE: the window also includes the capped
  run's own end-of-run checkpoint save + manager close (~1-2 s), so it
  slightly overstates pure restore+rebuild+step latency.

Run on the TPU host: ``python3 tools/scale_rehearsal.py --images 50000
--steps 500``.  Results are recorded in BENCHMARKS.md §scale.
"""

from __future__ import annotations

import argparse
import json
import os
import resource
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024.0
    return float("nan")


def peak_rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def ensure_dataset(data_dir: str, images: int) -> float:
    """Generate the split once; returns generation seconds (0 if cached)."""
    marker = os.path.join(data_dir, ".scale.done")
    # one marker holding the image count: re-running with a different
    # --images against the same dir must regenerate, not silently measure
    # the other split (r3 review)
    if os.path.exists(marker):
        with open(marker) as f:
            if f.read().strip() == str(images):
                return 0.0
    from icl.testing.synth import SynthConfig, generate_dataset

    t0 = time.perf_counter()
    os.makedirs(data_dir, exist_ok=True)
    counts = generate_dataset(data_dir, "train", SynthConfig(
        num_images=images, captions_per_image=5, vocab_size=400,
        emb_dim=300, max_mentions_per_caption=3, max_boxes_per_image=6,
        seed=0))
    dt = time.perf_counter() - t0
    with open(marker, "w") as f:
        f.write(str(images))
    return dt


class _Killed(Exception):
    """Raised by the capped generator to emulate a mid-epoch kill (so
    run_training never writes its end-of-training marker and a later
    --resume auto lands mid-run, like tests/integration/test_resume.py)."""


def _train_capped(task, ds, emb, steps, ipb, ckpt_dir=None, resume="none",
                  ckpt_every=0, seed=0, kill=False):
    """CLI-equivalent capped training run; returns timing dict."""
    import jax
    import jax.numpy as jnp

    from icl.data.imagebatch import AffinityBatcher, RelationBatcher
    from icl.dist.mesh import build_mesh, replicate, shard_batch
    from icl.models import AffinityModel, RelationModel
    from icl.train import (create_train_state, make_affinity_train_step,
                           make_relation_train_step)
    from icl.train.loop import LoopConfig, run_training

    mesh = build_mesh(None)
    table = replicate(jnp.asarray(emb.table), mesh)
    on_tpu = jax.devices()[0].platform == "tpu"
    if task == "relation":
        batcher = RelationBatcher(images_per_batch=ipb, build_grid=True,
                                  with_ids=False)
        model = RelationModel(lstm_hidden=200, head_hidden=800,
                              dropout=0.5, fused=on_tpu)
        step = make_relation_train_step(class_weights=[0.3, 1, 1, 1],
                                        grid_loss=model.fused)
        count_key = "pair_valid"
    else:
        batcher = AffinityBatcher(images_per_batch=ipb, with_ids=False)
        model = AffinityModel(lstm_hidden=200, head_hidden=1024,
                              dropout=0.5, fused=on_tpu)
        step = make_affinity_train_step(grid_loss=model.fused)
        count_key = "grid_valid"

    b0 = next(iter(batcher.batches(ds)))
    jb0 = {k: jnp.asarray(v) for k, v in b0.arrays.items()}
    state = create_train_state(model, (table, jb0), seed=seed)
    state = replicate(state, mesh)

    counts = {"n": 0, "examples": 0, "built": 0}

    def make_batches(epoch_rng, skip=0):
        counts["built"] = 0
        for b in batcher.batches(ds, rng=epoch_rng, skip=skip):
            if counts["n"] >= steps:
                if kill:
                    raise _Killed()
                return
            counts["n"] += 1
            counts["built"] += 1
            counts["examples"] += int(b.arrays[count_key].sum())
            jb = {k: jnp.asarray(v) for k, v in b.arrays.items()}
            # same sharded feed as the CLI (icl/cli/relation.py) — a no-op
            # placement on the 1-chip bench host, real DP on a multi-chip
            # one, so the measured path matches production either way
            yield (shard_batch(jb, mesh),)
        if kill:
            raise _Killed()

    t0 = time.perf_counter()
    cfg = LoopConfig(epochs=1, ckpt_dir=ckpt_dir, ckpt_every=ckpt_every,
                     resume=resume, seed=seed, log_every=100, mesh=mesh)
    final_step = -1
    try:
        state = run_training(state, lambda s, b: step(s, table, b),
                             make_batches, cfg)
        jax.block_until_ready(state.params)
        final_step = int(state.step)
    except _Killed:
        pass
    wall = time.perf_counter() - t0
    return {"steps": counts["n"], "built": counts["built"],
            "examples": counts["examples"], "wall_s": wall,
            "examples_per_s": counts["examples"] / max(wall, 1e-9),
            "final_step": final_step}


def measure_ckpt_wall(n_saves: int = 5) -> dict:
    """Checkpoint save cost at production dims (VERDICT r3 weak#2).

    ``Checkpointer.save`` synchronously pulls the FULL state (params +
    Adam moments) to host numpy before the orbax enqueue; at the 2.15 ms
    device step, every 10 ms of save wall stalls ~5 steps.  Measures, on
    a fresh relation state at production dims (lstm 200 / head 800):

    * ``save_call_s`` — what the training loop blocks on per save
      (host pull + orbax enqueue; orbax finalizes async),
    * ``save_durable_s`` — save + wait_until_finished (full durability),
    * ``state_mb`` — the host payload the pull materializes.

    Dataset-independent, so it runs on a tiny synthetic batch.
    """
    import shutil
    import tempfile

    import jax
    import jax.numpy as jnp

    import __graft_entry__ as ge
    from icl.dist.mesh import build_mesh, replicate
    from icl.models import RelationModel
    from icl.train import create_train_state
    from icl.train.checkpoint import Checkpointer

    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(1000, 300)).astype(np.float32))
    batch = ge._synth_relation_batch(rng, I=2, C=2, L=8, M=4, vocab=1000)
    model = RelationModel(lstm_hidden=200, head_hidden=800)
    state = create_train_state(model, (table, batch), seed=0)
    state = replicate(state, build_mesh(None))
    payload = jax.tree.map(np.asarray, (state.params, state.opt_state))
    state_mb = sum(x.nbytes for x in jax.tree.leaves(payload)) / 2**20

    # every save must see FRESH device arrays: jax caches pulled host
    # values per buffer, so re-saving untouched params measures a no-op
    # pull (61 ms) instead of the real one (~0.6 s batched) — the r4
    # measurement bug that first hid the true cost
    @jax.jit
    def perturb(params):
        return jax.tree.map(lambda x: x * (1.0 + 1e-6), params)

    ck = tempfile.mkdtemp(prefix="icl_ckpt_wall_")
    try:
        ckpt = Checkpointer(ck, max_to_keep=2)
        calls, durable = [], []
        for i in range(n_saves):
            state = state.replace(step=state.step + 1,
                                  params=perturb(state.params),
                                  opt_state=state.opt_state)
            t0 = time.perf_counter()
            ckpt.save(state)
            calls.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            ckpt.wait()
            durable.append(calls[-1] + time.perf_counter() - t0)
        ckpt.close()
    finally:
        shutil.rmtree(ck, ignore_errors=True)
    return {"state_mb": round(state_mb, 1),
            "save_call_s": round(min(calls), 3),
            "save_call_max_s": round(max(calls), 3),
            "save_durable_s": round(min(durable), 3),
            "n_saves": n_saves}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_dir", default="/tmp/icl_scale_data")
    ap.add_argument("--images", type=int, default=50000)
    ap.add_argument("--steps", type=int, default=500)
    ap.add_argument("--images_per_batch", type=int, default=64)
    ap.add_argument("--task", default="both",
                    choices=["relation", "affinity", "both"])
    ap.add_argument("--skip_resume", action="store_true")
    args = ap.parse_args()

    out: dict = {"images": args.images}
    out["gen_time_s"] = round(ensure_dataset(args.data_dir, args.images), 1)
    sizes = {f: os.path.getsize(os.path.join(args.data_dir, f)) / 2**20
             for f in os.listdir(args.data_dir)
             if f.startswith("train.") or f == "embeddings.txt"}
    out["files_mb"] = {k: round(v, 1) for k, v in sorted(sizes.items())}

    from icl.cli._common import split_vocab
    from icl.data.embeddings import EmbeddingStore

    t0 = time.perf_counter()
    emb = EmbeddingStore.load(
        os.path.join(args.data_dir, "embeddings.txt"),
        restrict_to=split_vocab(args.data_dir, "train"))
    out["emb_load_s"] = round(time.perf_counter() - t0, 2)
    out["rss_after_emb_mb"] = round(rss_mb(), 0)

    tasks = (["relation", "affinity"] if args.task == "both"
             else [args.task])
    for task in tasks:
        from icl.data.pipeline import (load_affinity_dataset,
                                       load_relation_dataset)

        t0 = time.perf_counter()
        if task == "relation":
            ds = load_relation_dataset(args.data_dir, "train", emb)
            n_items = ds.num_pairs
        else:
            ds = load_affinity_dataset(args.data_dir, "train", emb)
            n_items = ds.num_cells
        r: dict = {
            "load_s": round(time.perf_counter() - t0, 2),
            "items": n_items, "images_loaded": len(ds.images),
            "rss_after_load_mb": round(rss_mb(), 0),
        }
        r["train"] = {k: round(v, 2) if isinstance(v, float) else v
                      for k, v in _train_capped(
                          task, ds, emb, args.steps,
                          args.images_per_batch).items()}
        r["rss_after_train_mb"] = round(rss_mb(), 0)

        if not args.skip_resume:
            # mid-training checkpoint, then measure a fresh resume: the
            # skip-aware schedule must not rebuild trained batches
            import shutil
            import tempfile

            ck = tempfile.mkdtemp(prefix=f"icl_scale_ck_{task}_")
            half = max(args.steps // 2, 1)
            _train_capped(task, ds, emb, half, args.images_per_batch,
                          ckpt_dir=ck, ckpt_every=half, kill=True)
            # the kill path never closes the manager; poll until orbax's
            # async finalize lands (a real kill exits the process and the
            # atomic rename makes incomplete steps invisible)
            from icl.train.checkpoint import Checkpointer

            t_wait = time.time()
            while time.time() - t_wait < 120:
                c = Checkpointer(ck)
                s = c.latest_step
                c.close()
                if s is not None and s >= half:
                    break
                time.sleep(0.5)
            t0 = time.perf_counter()
            rr = _train_capped(task, ds, emb, 1, args.images_per_batch,
                               ckpt_dir=ck, resume="auto")
            r["resume"] = {"to_first_step_s": round(
                time.perf_counter() - t0, 2),
                "resumed_built_batches": rr["built"],
                "resumed_from_step": rr["final_step"] - rr["steps"]}
            shutil.rmtree(ck, ignore_errors=True)
        out[task] = r
        del ds

    out["peak_rss_mb"] = round(peak_rss_mb(), 0)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
