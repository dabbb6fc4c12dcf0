"""Device mesh construction and sharding helpers (layer L2).

Reference parity: **the reference has no distribution of any kind** — it ran
per-example loops in one process (SURVEY §3.3/§3.4).  The rebuild makes data
parallelism first-class for the MSCOCO-scale config (BASELINE.json
configs[4]): batches shard over a ``Mesh('data', 'model')``, params are
replicated, and XLA inserts the gradient ``psum`` over ICI because the train
step is jitted with sharded-batch/replicated-param in_shardings — there are
no hand-written collectives and no NCCL/MPI anywhere (SURVEY §3.4).

The 'model' axis is plumbed but size-1 by default: the largest layer in the
stack (affinity fc7 head, 4096×1024) fits comfortably on one chip; SURVEY
§3.3 records TP/PP/SP/EP as N/A for this workload.

Topology strings: ``"1"``/``"8"`` (data-only), ``"4x2"`` (data×model).
Multi-host bootstrap goes through :func:`icl.runtime.init`.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def build_mesh(topology: str | None = None,
               devices: list | None = None) -> Mesh:
    """Build a (data, model) mesh from a topology string.

    ``None`` → all local devices on the data axis.  ``"DxM"`` → explicit
    data×model grid; ``"D"`` → D data-parallel devices, model=1.
    """
    devices = devices if devices is not None else jax.devices()
    if topology is None or topology == "auto":
        d, m = len(devices), 1
    elif "x" in topology:
        d_str, m_str = topology.split("x", 1)
        d, m = int(d_str), int(m_str)
    else:
        d, m = int(topology), 1
    if d * m > len(devices):
        raise ValueError(f"topology {d}x{m} needs {d*m} devices, "
                         f"have {len(devices)}")
    grid = np.asarray(devices[:d * m]).reshape(d, m)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def data_axis_size(mesh: Mesh) -> int:
    return mesh.shape[DATA_AXIS]


def is_main_process() -> bool:
    """True on the process that owns run artifacts (checkpoints, metrics,
    config dumps).  Single-process runs are always main; on a pod exactly
    one host writes so N processes sharing a model dir cannot race each
    other (SURVEY §5.3–5.6 multi-host safety)."""
    return jax.process_index() == 0


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Place a pytree of host arrays with the leading axis sharded on 'data'.

    Every array in a batch (tokens, span tables, labels, masks) carries the
    batch dimension first by construction (icl.data.imagebatch), so one
    PartitionSpec suffices.
    """
    def put(x):
        spec = P(DATA_AXIS, *([None] * (np.ndim(x) - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Fully replicate a pytree (params, embedding table) over the mesh."""
    def put(x):
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree.map(put, tree)


def local_data_rows(mesh: Mesh, global_rows: int) -> tuple[int, int]:
    """Contiguous [lo, hi) global-batch rows owned by THIS process.

    Multi-host input sharding (the pod config's "each host feeds its local
    shard"): instead of every host materializing the full global batch and
    letting ``jax.device_put`` take its shards, each host pads/loads only
    the rows its own devices hold.  Requires the process's data-axis
    devices to be contiguous (true for ``build_mesh`` over ``jax.devices()``,
    which orders devices by process).
    """
    d = mesh.shape[DATA_AXIS]
    if global_rows % d:
        raise ValueError(f"global batch {global_rows} not divisible by "
                         f"data axis {d}")
    per = global_rows // d
    # a process owns data-row block i if ANY of its devices sits in mesh
    # row i — checking only model-column 0 both crashed (mine[0] on [])
    # and mis-owned rows when the model axis crosses hosts (r3 review
    # finding); model-axis replicas on other hosts feed the same rows,
    # which make_array_from_process_local_data de-duplicates
    pidx = jax.process_index()
    mine = sorted({i for i in range(d)
                   if any(dev.process_index == pidx
                          for dev in np.asarray(mesh.devices[i]).flat)})
    if not mine:
        raise ValueError("this process owns no data-axis rows on the mesh; "
                         "feed globally via shard_batch instead")
    if mine != list(range(mine[0], mine[0] + len(mine))):
        raise ValueError("process's data-axis devices are not contiguous; "
                         "feed globally via shard_batch instead")
    return mine[0] * per, (mine[-1] + 1) * per


def predict_mesh(mesh: Mesh) -> Mesh:
    """The mesh a `.scores` predict sweep should run on.

    Single-process: the global mesh unchanged.  Multi-process: a fresh
    all-local-devices data-axis mesh — predict partitions *examples* across
    processes (each host sweeps its own contiguous dataset slice fully
    independently, then process 0 merges the part files; SURVEY §4.2 at
    pod scale, VERDICT r3 missing#2), so the per-host program must touch
    only addressable devices: no collectives, no lockstep dispatch, and a
    host finishing early cannot stall the others.
    """
    if jax.process_count() == 1:
        return mesh
    return build_mesh(None, jax.local_devices())


def sweep_data_axis_size(mesh: Mesh, predict: bool) -> int:
    """Data-axis size this run's batch row counts must divide by.

    Train batches shard on the GLOBAL mesh, so its data-axis size is the
    divisor.  A multi-process predict sweep instead runs on
    :func:`predict_mesh` — ALL local devices on the data axis — whose size
    can exceed the global mesh's data axis (e.g. a ``2x4`` topology across
    2 hosts has data=2 globally but 4 local devices).  Rounding the batch
    to the global size alone would pass train-time validation and then
    crash ``shard_batch`` mid-sweep, stranding the other hosts at the
    part-file merge barrier (r4 review finding).
    """
    if predict and jax.process_count() > 1:
        return data_axis_size(predict_mesh(mesh))
    return data_axis_size(mesh)


def predict_partition(n: int, weights=None) -> tuple[int, int]:
    """Contiguous [lo, hi) slice of n dataset examples owned by THIS process.

    Deterministic balanced split in dataset order — process k's slice
    directly precedes process k+1's, so concatenating the per-process
    `.scores` part files in process order reproduces the single-process
    file's row ORDER exactly (the merge itself is byte-exact; the float
    values agree with a single-host sweep to ~1e-7, since a different
    device count vectorizes per-row reductions differently — within one
    ulp of the %.6f score format).

    ``weights`` (optional, len n): per-example sweep cost.  Relation and
    affinity "examples" are IMAGES whose pair/cell counts vary, so an
    equal-count split can leave one host sweeping far more rows than
    another — and the merge barrier waits on the slowest.  With weights,
    boundary k lands where the cumulative cost crosses k/p of the total
    (every process computes the same boundaries from the same dataset
    order).  Without weights: equal counts, remainder to the lowest ranks.
    """
    p, k = jax.process_count(), jax.process_index()
    if weights is not None and n > 0:
        cum = np.cumsum(np.asarray(weights, np.float64))
        assert cum.shape == (n,), (cum.shape, n)
        if cum[-1] > 0:
            targets = cum[-1] * np.arange(1, p) / p
            # +1: the example whose cumulative cost CROSSES target k joins
            # the earlier slice — a single dominant example then occupies
            # its own slice instead of pushing everything onto the last
            # host.  Boundaries stay monotone (searchsorted is, +1 uniform)
            # and <= n (targets < total), so every slice is a valid,
            # possibly empty, range and each slice's cost < fair + max(w).
            bounds = np.searchsorted(cum, targets, side="left") + 1
            bounds = np.concatenate([[0], bounds, [n]]).astype(int)
            return int(bounds[k]), int(min(bounds[k + 1], n))
    base, rem = divmod(n, p)
    lo = k * base + min(k, rem)
    return lo, lo + base + (1 if k < rem else 0)


def sync_processes(key: str) -> None:
    """Cross-process barrier (no-op single-process).

    Used by the sharded predict writer: every host must have flushed its
    `.scores` part file before process 0 concatenates them.
    """
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(key)


def gather_parts(path: str, tag: str, write_part, merge) -> Any:
    """Part-file scatter/gather for sharded multi-process outputs.

    One copy of the choreography both sharded-output merges share (the
    `.scores` byte merge and the ScoreDict count merge used to hand-roll
    it separately — r4 review finding): every process writes its payload
    to ``<path>.<tag>-<k:05d>`` via ``write_part(part_path)``; after a
    barrier, process 0 calls ``merge(part_paths)`` over all parts in
    process order; a second barrier lets each process delete the part it
    owns (wrote).  Returns ``merge``'s result on process 0, ``None``
    elsewhere.

    ``path`` must live on storage visible to every process (the same
    contract the orbax checkpoint directory carries on a pod) — without
    it, process 0's merge fails loudly with the missing part path.
    FAILURES in either phase are handled so no rank ever stops
    participating in a collective its peers are waiting at (otherwise the
    others hang until the distributed-runtime timeout while only the
    failing rank reports the error — r4 advisor finding):

    * ``write_part`` failure: the parts barrier doubles as a write-outcome
      allgather, so every rank (including rank 0, BEFORE it attempts a
      merge over a missing part) learns that some rank failed; all raise,
      successful ranks KEEP their parts.
    * ``merge`` failure on rank 0: the outcome is broadcast after the
      merge; EVERY rank raises and keeps its part file, so a transient
      rank-0 error (disk full, flaky storage) doesn't silently destroy
      the N-1 other hosts' sweep output — the merge can be retried from
      the parts.

    Multi-process only: single-process callers degrade before calling.
    """
    import os
    import time

    from icl.util.log import LOG

    k, p = jax.process_index(), jax.process_count()
    part = f"{path}.{tag}-{k:05d}"
    t0 = time.perf_counter()
    write_err = None
    try:
        write_part(part)
    except BaseException as e:   # re-raised after the outcome gather
        write_err = e
    t_write = time.perf_counter()
    # the parts barrier doubles as the write-outcome gather: all ranks
    # (and rank 0 in particular, before it merges) agree on whether every
    # part was written — computed identically everywhere, so the early
    # raise below needs no further collective
    if p > 1:
        from jax.experimental import multihost_utils

        all_written = bool(multihost_utils.process_allgather(
            np.int32(write_err is None)).min())
    else:
        all_written = write_err is None
    t_barrier = time.perf_counter()
    if not all_written:
        LOG.info("gather_parts[%s] rank %d/%d: part write FAILED on %s "
                 "rank (write %.2f s, outcome gather %.2f s)", tag, k, p,
                 "this" if write_err is not None else "another",
                 t_write - t0, t_barrier - t_write)
        if write_err is not None:
            raise write_err
        raise RuntimeError(
            f"part write failed on another rank for {path} — this rank's "
            f"part file {part} is kept so the sweep can be retried")
    result = None
    merge_err = None
    if k == 0:
        try:
            result = merge([f"{path}.{tag}-{i:05d}" for i in range(p)])
        except BaseException as e:   # re-raised after the barrier
            merge_err = e
    t_merge = time.perf_counter()
    # the post-merge synchronization doubles as the outcome broadcast:
    # every rank learns whether rank 0's merge succeeded (and the
    # broadcast's own collective is the barrier that kept ranks from
    # deleting parts mid-merge)
    if p > 1:
        from jax.experimental import multihost_utils

        ok = bool(multihost_utils.broadcast_one_to_all(
            np.int32(merge_err is None)))
    else:
        ok = merge_err is None
    # pod operators read these to attribute a slow sharded write: a big
    # barrier wait = straggler host (rebalance predict_partition weights),
    # a big merge = storage bandwidth on rank 0
    LOG.info("gather_parts[%s] rank %d/%d: part write %.2f s, barrier "
             "wait %.2f s, merge %.2f s", tag, k, p, t_write - t0,
             t_barrier - t_write, t_merge - t_barrier if k == 0 else 0.0)
    if merge_err is not None:
        raise merge_err          # rank 0: the original error, part kept
    if not ok:
        raise RuntimeError(
            f"sharded merge failed on rank 0 for {path} — this rank's "
            f"part file {part} is kept so the merge can be retried")
    os.remove(part)   # each process owns (wrote) exactly this file
    return result


def shard_batch_local(local_batch: Any, mesh: Mesh, global_rows: int) -> Any:
    """Assemble a globally-sharded batch from THIS process's local rows.

    ``local_batch`` holds only the [lo, hi) rows from
    :func:`local_data_rows`; every process contributes its slice and the
    result is identical to ``shard_batch`` over the full global arrays —
    without any host ever materializing them (SURVEY §3.4 pod-scale note).
    """
    def put(x):
        x = np.asarray(x)
        spec = P(DATA_AXIS, *([None] * (x.ndim - 1)))
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, spec), x, (global_rows, *x.shape[1:]))

    return jax.tree.map(put, local_batch)
