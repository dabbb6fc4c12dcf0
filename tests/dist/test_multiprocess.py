"""Real multi-process jax.distributed.initialize over localhost (SURVEY §3.4).

Faked-device tests (test_dp.py) exercise sharding and collectives but not
the process-group bootstrap; this spawns TWO actual processes that rendez-
vous through ``icl.runtime.init`` → ``jax.distributed.initialize``, train
DP over an 8-device global mesh (4 local devices each, gloo cross-process
collectives), and must agree with the single-process 8-device run bit-wise
in structure and numerically in value (VERDICT r1 missing#1/#2).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

WORKER = os.path.join(os.path.dirname(__file__), "_mp_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _single_process_reference(which="nonvisual"):
    """Same math as the worker, on this process's 8 faked devices."""
    sys.path.insert(0, os.path.dirname(WORKER))
    try:
        from _mp_worker import synth_batch, synth_relation
    finally:
        sys.path.pop(0)
    from icl.dist.mesh import build_mesh, replicate, shard_batch
    from icl.models import NonvisualModel, RelationModel
    from icl.models.nonvisual import mean_pool_tokens
    from icl.train import (create_train_state, make_mention_train_step,
                           make_relation_train_step)

    mesh = build_mesh("8x1")
    if which == "relation":
        table_h, batch = synth_relation()
        model = RelationModel(lstm_hidden=6, head_hidden=12)
        st = create_train_state(model, (jnp.asarray(table_h), batch), seed=5)
        st = replicate(st, mesh)
        table = replicate(jnp.asarray(table_h), mesh)
        sbatch = shard_batch(batch, mesh)
        step = make_relation_train_step(class_weights=[0.3, 1, 1, 1],
                                        donate=False)
        for _ in range(3):
            st, _ = step(st, table, sbatch)
    else:
        table_h, tok, ln, lb = synth_batch()
        vd = np.ones(64, bool)
        model = NonvisualModel(hidden=8)
        pooled = mean_pool_tokens(jnp.asarray(table_h), jnp.asarray(tok[:1]),
                                  jnp.asarray(ln[:1]))
        st = create_train_state(model, (pooled,), seed=5)
        st = replicate(st, mesh)
        table = replicate(jnp.asarray(table_h), mesh)
        args = shard_batch((tok, ln, lb, vd), mesh)
        step = make_mention_train_step(donate=False)
        for _ in range(5):
            st, _ = step(st, table, *args)
    return {"/".join(str(k.key) for k in path): np.asarray(v)
            for path, v in
            jax.tree_util.tree_flatten_with_path(st.params)[0]}


@pytest.mark.parametrize("which", ["nonvisual", "relation",
                                   "relation-local"])
def test_two_process_dp_matches_single_process(tmp_path, which):
    port = _free_port()
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)  # device count set in-worker via config API
    # the workers must find icl/ regardless of how pytest itself was
    # launched (python -m pytest puts the cwd on the PARENT's sys.path
    # only; the script-invoked child gets tests/dist instead)
    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen(
        [sys.executable, WORKER, str(pid), "2", str(port), str(tmp_path),
         which],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for pid in range(2)]
    outs = [p.communicate(timeout=300)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out}"

    ref = _single_process_reference(
        "relation" if which.startswith("relation") else which)
    runs = [dict(np.load(tmp_path / f"params_{pid}.npz")) for pid in range(2)]
    # both processes hold identical replicated params...
    for k in ref:
        np.testing.assert_array_equal(runs[0][k], runs[1][k])
        # ...and match the single-process 8-device run (gloo cross-process
        # reductions may reassociate the psum → tight tolerance, not bitwise)
        np.testing.assert_allclose(runs[0][k], ref[k], atol=1e-6, rtol=1e-6)
    assert np.isfinite(runs[0]["loss"])


def test_undersized_global_mesh_fails_fast_on_every_rank(tmp_path):
    """A multi-process --mesh smaller than the pod (here: mesh 2 over
    2 processes x 2 local devices — only process 0's devices in the mesh)
    used to strand the run: the meshless rank crashed at its first host
    fetch ("spans non-addressable devices") while the other hung 5 min in
    the next orbax/collective barrier.  runtime.init now validates that
    every process owns >=1 global-mesh device, computed identically on
    all ranks, so BOTH exit fast with the same actionable error."""
    port = _free_port()
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)
    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    code = (
        "import sys, jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "jax.config.update('jax_num_cpu_devices', 2)\n"
        "from icl import runtime\n"
        "try:\n"
        "    runtime.init(topology='2', seed=0,\n"
        "                 coordinator='localhost:%d',\n"
        "                 num_processes=2, process_id=int(sys.argv[1]))\n"
        "except ValueError as e:\n"
        "    print('MESH-CHECK:', e, flush=True)\n"
        "    sys.exit(7)\n"
        "print('unexpectedly initialized', flush=True)\n" % port)
    procs = [subprocess.Popen([sys.executable, "-c", code, str(pid)],
                              env=env, stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True)
             for pid in range(2)]
    outs = [p.communicate(timeout=120)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 7, out
        assert "MESH-CHECK:" in out and "no mesh devices" in out, out
        assert "--mesh 4x1" in out, out   # the suggested remedy
