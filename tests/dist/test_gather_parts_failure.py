"""gather_parts merge-failure contract across REAL process boundaries.

A transient rank-0 merge error (disk full, flaky shared storage) must not
silently destroy the other hosts' sweep output: before r5, non-zero ranks
could not observe the failure — they deleted their part files and exited 0,
leaving nothing to retry from while only rank 0 reported the error.  The
outcome broadcast in :func:`icl.dist.mesh.gather_parts` makes every rank
raise and keep its part; this pins both directions of the contract.
"""

import os
import socket
import subprocess
import sys

WORKER = os.path.join(os.path.dirname(__file__), "_gather_fail_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_pair(out_dir, mode, timeout=300):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)
    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    port = _free_port()
    procs = [subprocess.Popen(
        [sys.executable, WORKER, str(pid), "2", str(port), out_dir, mode],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for pid in (0, 1)]
    outs = [p.communicate(timeout=timeout)[0] for p in procs]
    return [(p.returncode, out) for p, out in zip(procs, outs)]


def test_merge_failure_raises_on_every_rank_and_keeps_parts(tmp_path):
    d = str(tmp_path / "fail")
    os.makedirs(d)
    (rc0, out0), (rc1, out1) = _run_pair(d, "fail")
    # rank 0 re-raises the ORIGINAL merge error; rank 1 a RuntimeError
    # naming its kept part — neither may exit clean
    assert rc0 == 3, out0
    assert rc1 == 4, out1
    assert "injected merge failure" in out0
    assert "kept" in out1 and "merged.out.part-00001" in out1
    # both part files survive for a retried merge; nothing merged
    assert os.path.exists(os.path.join(d, "merged.out.part-00000")), out0
    assert os.path.exists(os.path.join(d, "merged.out.part-00001")), out1
    assert not os.path.exists(os.path.join(d, "merged.out"))


def test_write_failure_raises_on_every_rank_without_hanging(tmp_path):
    # a rank whose write_part raises must still reach the parts barrier
    # (now a write-outcome allgather) — before r5-cont the other ranks
    # hung there until the distributed-runtime timeout; rank 0 must learn
    # of the failure BEFORE attempting a merge over the missing part
    d = str(tmp_path / "failwrite")
    os.makedirs(d)
    (rc0, out0), (rc1, out1) = _run_pair(d, "failwrite")
    # rank 1 re-raises its own write error; rank 0 a RuntimeError naming
    # its kept part — and no "merge" may have been attempted (the merged
    # file must not exist, not even partially)
    assert rc1 == 3, out1
    assert "injected part-write failure" in out1
    assert rc0 == 4, out0
    assert "part write failed on another rank" in out0
    assert os.path.exists(os.path.join(d, "merged.out.part-00000")), out0
    assert not os.path.exists(os.path.join(d, "merged.out.part-00001"))
    assert not os.path.exists(os.path.join(d, "merged.out"))


def test_merge_success_consumes_parts(tmp_path):
    d = str(tmp_path / "ok")
    os.makedirs(d)
    for rc, out in _run_pair(d, "ok"):
        assert rc == 0, out
    with open(os.path.join(d, "merged.out")) as f:
        assert f.read() == "rank 0 payload\nrank 1 payload\n"
    assert not os.path.exists(os.path.join(d, "merged.out.part-00000"))
    assert not os.path.exists(os.path.join(d, "merged.out.part-00001"))
