"""Framework bring-up (SURVEY §4.5) — the reference has no equivalent.

``init()`` is the single entry the CLIs call before any device work:
multi-host bootstrap (no-op single-process) and mesh construction.  Rng
seeding is deliberately IDENTICAL on every host (loop.py seeds schedules
from (seed, epoch) with no process-index fold): the multi-host input
sharding design requires all hosts to agree on the global batch schedule
and slice their own rows from it (icl.dist.mesh.local_data_rows).
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


# coordinator address this process bootstrapped with — jax doesn't expose
# it after initialize(), so idempotent re-entry records it to reject a
# conflicting address (same id/count against a DIFFERENT cluster would
# otherwise silently reuse the old peer group's collectives)
_coordinator: str | None = None


def enable_compilation_cache(path: str) -> None:
    """Point XLA's persistent compilation cache at ``path``.

    Compiled executables are reused across PROCESS RESTARTS (keyed on
    program + jax/XLA version + device kind, so stale entries are misses,
    never wrong results): a serve restart skips its multi-second warm-up
    compiles, and a repeated predict sweep skips its first-run compile
    wall (~47 s at the 50k scale rehearsal).  Entries below jax's default
    thresholds (≥1 s compile) are not written — tiny programs recompile
    faster than they deserialize.  Safe to share between concurrent
    processes (atomic writes; a pod's hosts can point at one directory).
    """
    import os

    from jax.experimental.compilation_cache import compilation_cache

    os.makedirs(path, exist_ok=True)
    # reset + config update: jax's cache handle is a lazily-initialized
    # singleton pinned to the dir current at FIRST use — set_cache_dir
    # alone does NOT re-point it once anything has compiled
    compilation_cache.set_cache_dir(os.path.abspath(path))
    compilation_cache.reset_cache()


def init(topology: str | None = None, seed: int = 0,
         coordinator: str | None = None, num_processes: int | None = None,
         process_id: int | None = None,
         compilation_cache_dir: str | None = None) -> Runtime:
    """Bring up the runtime: distributed bootstrap (if multi-host) + mesh.

    Args mirror ``jax.distributed.initialize``.  The multi-host branch is
    gated on ``process_id`` — each host's launcher passes its own id, so a
    pod config that carries ``hosts: {coordinator, num_processes}`` can
    still be run single-process (scaled down) by simply not passing
    ``--process_id``.  Exercised for real by the 2-process localhost test
    (tests/dist/test_multiprocess.py); the pod itself is unavailable here
    (SURVEY §9.3(5)).
    """
    global _coordinator
    if compilation_cache_dir:
        enable_compilation_cache(compilation_cache_dir)
    if process_id is not None:
        if coordinator is None or num_processes is None:
            raise ValueError("--process_id requires --coordinator and "
                             "--num_processes (directly or via --config)")
        if jax.distributed.is_initialized():
            # idempotent re-entry: icl-joint runs several task mains inside
            # ONE process, so the 2nd+ init must reuse the bootstrap (jax
            # hard-errors on double initialize) — but only if it describes
            # the SAME topology this process already joined
            if (jax.process_count() != num_processes
                    or jax.process_index() != process_id
                    or (_coordinator is not None
                        and coordinator != _coordinator)):
                raise ValueError(
                    f"distributed already initialized as process "
                    f"{jax.process_index()}/{jax.process_count()} via "
                    f"{_coordinator} — conflicting --process_id "
                    f"{process_id}/--num_processes {num_processes}/"
                    f"--coordinator {coordinator}")
            LOG.info("distributed: reusing bootstrap (process %d/%d)",
                     jax.process_index(), jax.process_count())
        else:
            jax.distributed.initialize(coordinator_address=coordinator,
                                       num_processes=num_processes,
                                       process_id=process_id)
            _coordinator = coordinator
            LOG.info("distributed: process %d/%d via %s; %d global "
                     "device(s)", jax.process_index(), jax.process_count(),
                     coordinator, jax.device_count())
    elif coordinator is not None:
        LOG.warning("coordinator %s configured but no --process_id given: "
                    "running single-process (scaled-down mode)", coordinator)
    try:
        mesh = build_mesh(topology)
    except ValueError:
        if not (process_id is None and coordinator is not None):
            raise
        # scaled-down mode: a pod config's mesh (e.g. 256x1) exceeds this
        # host's devices — fall back to all-local-devices data-parallel
        LOG.warning("configured mesh %r needs more devices than the %d "
                    "available; scaled-down mode falls back to local DP",
                    topology, jax.device_count())
        mesh = build_mesh(None)
    if jax.process_count() > 1:
        # every process must own >=1 device of the GLOBAL mesh.  A mesh
        # smaller than the pod (e.g. --mesh 2 with 2 processes x 2 local
        # devices) gives some host only non-addressable arrays: that host
        # crashes at its first host fetch while the others hang at the
        # next collective/orbax barrier until the distributed-runtime
        # timeout (observed: rank 1 died in checkpoint restore, rank 0
        # hung 5 min in orbax's sync).  The check is computed identically
        # on every rank from the same global device list, so ALL ranks
        # raise the same error and exit cleanly instead.
        procs_in_mesh = {d.process_index for d in mesh.devices.flat}
        missing = sorted(set(range(jax.process_count())) - procs_in_mesh)
        if missing:
            m = mesh.shape["model"]
            raise ValueError(
                f"--mesh {topology!r} covers {mesh.devices.size} of "
                f"{jax.device_count()} global devices, leaving "
                f"process(es) {missing} with no mesh devices — size the "
                f"mesh to the full pod (e.g. --mesh "
                f"{jax.device_count() // m}x{m}); a smaller mesh strands "
                f"those hosts at the first collective")
    LOG.info("runtime: %d device(s) [%s], mesh %s",
             mesh.devices.size, jax.devices()[0].platform,
             dict(mesh.shape))
    return Runtime(mesh=mesh, seed=seed)
