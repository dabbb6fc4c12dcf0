"""Framework bring-up (SURVEY §4.5) — the reference has no equivalent.

``init()`` is the single entry the CLIs call before any device work:
multi-host bootstrap (no-op single-process), mesh construction, and seeded
rng plumbing (per-host folded so data shuffling differs across hosts while
model init stays identical).
"""

from __future__ import annotations

import dataclasses

import jax

from icl.dist.mesh import build_mesh
from icl.util.log import LOG


@dataclasses.dataclass
class Runtime:
    mesh: "jax.sharding.Mesh"
    seed: int

    @property
    def num_devices(self) -> int:
        return self.mesh.devices.size


def init(topology: str | None = None, seed: int = 0,
         coordinator: str | None = None, num_processes: int | None = None,
         process_id: int | None = None) -> Runtime:
    """Bring up the runtime: distributed bootstrap (if multi-host) + mesh.

    Args mirror ``jax.distributed.initialize``; all-None means single
    process (the only mode testable in this environment — SURVEY §9.3(5)).
    """
    if coordinator is not None:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
    mesh = build_mesh(topology)
    LOG.info("runtime: %d device(s) [%s], mesh %s",
             mesh.devices.size, jax.devices()[0].platform,
             dict(mesh.shape))
    return Runtime(mesh=mesh, seed=seed)
