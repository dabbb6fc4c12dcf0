"""Generic training loop: stepping, logging, checkpointing, profiling (L5).

Replaces Keras ``model.fit`` (SURVEY §4.1).  The loop is task-agnostic: the
CLI hands it a jitted ``step_fn`` and a ``make_batches(epoch_rng)`` factory
yielding per-step argument tuples (already device-ready; sharded by the
caller when a mesh is active).  Subsystems wired per SURVEY §5:

* §5.1 tracing  — ``profile_dir`` wraps the loop in ``jax.profiler`` traces;
  per-step wall clock + examples/sec logged every ``log_every`` steps;
* §5.3/5.4      — orbax checkpoint every ``ckpt_every`` steps + at end;
  ``resume='auto'`` restores latest before training;
* §5.5 metrics  — JSONL stream (one object per logged step) next to the
  checkpoint dir.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Callable, Iterable

import jax
import numpy as np

from icl.train.checkpoint import Checkpointer
from icl.train.state import TrainState
from icl.util.log import LOG


@dataclasses.dataclass
class LoopConfig:
    epochs: int = 10
    ckpt_dir: str | None = None
    ckpt_every: int = 200
    log_every: int = 20
    profile_dir: str | None = None
    resume: str = "none"          # "none" | "auto"
    metrics_path: str | None = None
    seed: int = 0
    eval_every: int = 0           # steps between dev evals (0: off)
    early_stop: int = 0           # stop after N consecutive evals without
                                  # eval-loss improvement (0: off; needs
                                  # eval_every — the Keras EarlyStopping
                                  # monitoring the reference era relied on)
    mesh: object | None = None    # re-places restored state (multi-process
                                  # restores yield process-local arrays)


def prefetch(iterator, depth: int = 2):
    """Run the batch generator in a BACKGROUND THREAD with a bounded queue.

    Host-side batch assembly (numpy padding + id bookkeeping) measures
    4–10 ms/batch at production shapes — slower than the ~2 ms device step —
    so a same-thread buffer (the round-1 deque version of this function)
    left training host-bound: the generator only advanced when the consumer
    asked.  The worker thread overlaps assembly with device compute, and
    device transfers (``jnp.asarray`` inside the generator) start ``depth``
    batches ahead of the consuming step, which also hides host→device
    latency on slow links (the axon relay here).  Order-preserving;
    generator exceptions re-raise at the consumer.  An abandoned consumer
    (step_fn raised, generator closed early) sets a stop event that the
    worker observes at its next queue interaction, so neither the thread
    nor its device-ready batches outlive the epoch that needed them.
    """
    import queue as _queue
    import threading

    q: _queue.Queue = _queue.Queue(maxsize=max(depth, 1))
    _end = object()
    stop = threading.Event()

    def _put(item) -> bool:
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except _queue.Full:
                continue
        return False

    def _worker():
        try:
            for item in iterator:
                if not _put(item):
                    return
            _put(_end)
        except BaseException as e:   # noqa: BLE001 — re-raised below
            _put(e)

    threading.Thread(target=_worker, daemon=True,
                     name="icl-batch-prefetch").start()
    try:
        while True:
            item = q.get()
            if item is _end:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()


def run_training(state: TrainState, step_fn: Callable,
                 make_batches: Callable[[np.random.Generator], Iterable[tuple]],
                 cfg: LoopConfig,
                 eval_fn: Callable[[TrainState], dict] | None = None) -> TrainState:
    """Drive the jitted ``step_fn`` over ``make_batches`` for ``cfg.epochs``.

    ``eval_fn`` (optional): called every ``cfg.eval_every`` steps with the
    current state; returns a metrics dict (e.g. dev loss/acc) that is
    logged and appended to the JSONL stream under ``eval_*`` keys —
    the reference's Keras ``fit(validation_data=...)`` monitoring
    (SURVEY §2.1 model layer) as a loop hook."""
    from icl.dist.mesh import is_main_process, replicate

    ckpt = Checkpointer(cfg.ckpt_dir) if cfg.ckpt_dir else None
    start_epoch = start_batch = 0
    if ckpt and cfg.resume == "auto":
        before = int(state.step)
        state, start_epoch, start_batch = ckpt.restore_with_position(state)
        if int(state.step) != before:
            LOG.info("resumed from checkpoint at step %d "
                     "(epoch %d, batch %d)", int(state.step),
                     start_epoch, start_batch)
            if cfg.mesh is not None:
                # restore materializes host-local arrays on every process;
                # re-place them as committed replicated mesh arrays (a
                # multi-process jit rejects process-local inputs)
                state = replicate(state, cfg.mesh)

    # artifact writes (metrics JSONL; checkpoint saves gate themselves in
    # Checkpointer.save) happen on the coordinator only — N pod processes
    # sharing a model dir must not interleave one stream (SURVEY §5.5)
    metrics_f = None
    if cfg.metrics_path and is_main_process():
        os.makedirs(os.path.dirname(os.path.abspath(cfg.metrics_path)),
                    exist_ok=True)
        metrics_f = open(cfg.metrics_path, "a", encoding="utf-8")

    if cfg.early_stop and (eval_fn is None or not cfg.eval_every):
        # the eval hook can be absent even when requested (missing dev
        # split) — say so instead of silently training to the epoch cap
        LOG.warning("--early_stop %d requested but no dev eval will run "
                    "(eval hook unavailable or --eval_every 0) — training "
                    "runs to the epoch cap", cfg.early_stop)
    if cfg.profile_dir:
        jax.profiler.start_trace(cfg.profile_dir)
    try:
        # epoch rngs are STATELESS in (seed, epoch): a resumed run replays
        # the exact shuffle schedule of an uninterrupted one, so restoring
        # (epoch, batch_in_epoch) and skipping already-trained batches makes
        # kill-anywhere resume bit-reproducible (tests/integration/
        # test_resume.py kills mid-epoch with shuffling on)
        import inspect

        # skip-aware generators (all in-tree ones) never BUILD the skipped
        # batches — resume does no host-side replay of trained batches'
        # padding/feature reads; legacy generators fall back to iterate-and-
        # drop (still bit-identical, just wasteful)
        supports_skip = "skip" in inspect.signature(make_batches).parameters
        t_last = time.perf_counter()
        ex_since = 0
        # host-side mirror of state.step: every step_fn increments by
        # exactly 1 (TrainState.apply_gradients), so reading the device
        # scalar back each iteration would only add a per-step host sync —
        # ~30 ms/step through a relay link vs the ~2 ms device step.  The
        # mirror keeps the dispatch queue full; device work is only forced
        # at log/eval/checkpoint points.
        step = int(state.step)
        save_stall, n_saves = 0.0, 0   # loop-visible checkpoint-save wall
        best_eval = float("inf")
        best_state = None      # host copy of the best-eval state
        stale_evals = 0
        stop_early = False
        for epoch in range(start_epoch, cfg.epochs):
            epoch_rng = np.random.default_rng(
                np.random.SeedSequence([cfg.seed, epoch]))
            skip = start_batch if epoch == start_epoch else 0
            if supports_skip:
                gen = make_batches(epoch_rng, skip=skip)
                batch_in_epoch = skip
            else:
                gen = make_batches(epoch_rng)
                batch_in_epoch = 0
            for args in prefetch(gen):
                batch_in_epoch += 1
                if not supports_skip and batch_in_epoch <= skip:
                    continue
                state, metrics = step_fn(state, *args)
                step += 1
                ex_since += 1
                if step % cfg.log_every == 0:
                    # examples/sec is advisory: sampling THIS batch's valid
                    # count (× steps since last log) happens at the same
                    # point the loss read already syncs the device, so the
                    # hot loop itself stays fetch-free (no per-step
                    # host↔device round-trip — ~30 ms each over a relay)
                    loss = float(metrics["loss"])
                    acc = float(metrics.get("acc", np.nan))
                    now = time.perf_counter()
                    rate = _batch_examples(args) * ex_since / max(
                        now - t_last, 1e-9)
                    t_last, ex_since = now, 0
                    LOG.info("epoch %d step %d loss %.4f acc %.3f (%.0f ex/s)",
                             epoch, step, loss, acc, rate)
                    if metrics_f:
                        metrics_f.write(json.dumps(
                            {"epoch": epoch, "step": step, "loss": loss,
                             "acc": acc, "examples_per_sec": rate}) + "\n")
                        metrics_f.flush()
                if (eval_fn is not None and cfg.eval_every
                        and step % cfg.eval_every == 0):
                    ev = {k: float(v) for k, v in eval_fn(state).items()}
                    LOG.info("epoch %d step %d EVAL %s", epoch, step,
                             " ".join(f"{k} {v:.4f}" for k, v in ev.items()))
                    if metrics_f:
                        metrics_f.write(json.dumps(
                            {"epoch": epoch, "step": step,
                             **{f"eval_{k}": v for k, v in ev.items()}})
                            + "\n")
                        metrics_f.flush()
                    if cfg.early_stop:
                        if ev.get("loss", float("inf")) < best_eval:
                            best_eval, stale_evals = ev["loss"], 0
                            # Keras restore_best_weights: a host copy, not
                            # a checkpoint — improvements can be frequent.
                            # One batched transfer: per-leaf np.asarray
                            # serializes ~32 relay roundtrips (1.5 s vs
                            # 0.6 s at production dims — see
                            # icl.train.checkpoint)
                            best_state = jax.device_get(state)
                        else:
                            stale_evals += 1
                            if stale_evals >= cfg.early_stop:
                                LOG.info(
                                    "early stop at step %d: eval loss has "
                                    "not improved for %d eval(s) "
                                    "(best %.4f)", step, stale_evals,
                                    best_eval)
                                stop_early = True
                                break
                if ckpt and cfg.ckpt_every and step % cfg.ckpt_every == 0:
                    t_save = time.perf_counter()
                    ckpt.save(state, epoch=epoch,
                              batch_in_epoch=batch_in_epoch)
                    dt_save = time.perf_counter() - t_save
                    save_stall += dt_save
                    n_saves += 1
                    LOG.info("checkpoint save at step %d: loop stalled "
                             "%.0f ms", step, dt_save * 1e3)
            if stop_early:
                break
        if stop_early and best_state is not None:
            # restore_best_weights: the state at the best dev loss, not the
            # stale-by-N-evals tail the stop condition just rejected
            LOG.info("early stop: restoring best-eval state (step %d, "
                     "loss %.4f)", int(best_state.step), best_eval)
            state = best_state
            if cfg.mesh is not None:
                state = replicate(state, cfg.mesh)
        if n_saves:
            LOG.info("periodic checkpoint saves: %d, total loop-visible "
                     "stall %.2f s", n_saves, save_stall)
        if ckpt:
            if stop_early and best_state is not None:
                # prune checkpoints past the best step — otherwise predict
                # and resume would pick the newer (worse) latest_step
                ckpt.wait()
                for s_ in ckpt.all_steps():
                    if s_ > int(state.step):
                        ckpt.delete(s_)
            # end-of-training marker: resume would start past the last epoch
            # (force: a periodic save may already exist at this exact step)
            ckpt.save(state, wait=True, epoch=cfg.epochs, batch_in_epoch=0,
                      force=True)
            ckpt.close()
    finally:
        if cfg.profile_dir:
            jax.profiler.stop_trace()
        if metrics_f:
            metrics_f.close()
    return state


def _valid_sum(x) -> int:
    """Sum a (possibly multi-process global) validity mask for logging.

    A globally-sharded array's full value is not fetchable from one process;
    sum the local shards and scale by covered fraction — an estimate exact
    under balanced sharding (contiguous equal row blocks, icl.dist.mesh),
    and advisory either way (examples/sec logging only).  Shards are
    deduplicated by their global index first: on a d×m mesh a P('data')
    batch is REPLICATED over the model axis, so addressable_shards holds
    each local row block m_local times and a device-ratio scale would
    overcount by m (r3 review finding)."""
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        return _dedup_shard_sum(x.addressable_shards, x.size)
    return int(np.asarray(x).sum())


def _dedup_shard_sum(shards, total_size: int) -> int:
    uniq = {repr(s.index): s for s in shards}
    local = sum(int(np.asarray(s.data).sum()) for s in uniq.values())
    covered = sum(int(np.asarray(s.data).size) for s in uniq.values())
    return int(round(local * (total_size / max(covered, 1))))


def _batch_examples(args: tuple) -> int:
    """Best-effort example count for throughput logging."""
    for a in args:
        if isinstance(a, dict):
            for key in ("pair_valid", "grid_valid"):
                if key in a:
                    return _valid_sum(a[key])
        elif getattr(a, "dtype", None) == bool:
            return _valid_sum(a)
    return 0
