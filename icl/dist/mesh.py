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
