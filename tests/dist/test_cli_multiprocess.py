"""Multi-host through the REAL CLI (VERDICT r2 missing#1 / weak#1-#2).

tests/dist/test_multiprocess.py proves the library-level DP math across two
processes; this proves the *production composition*: ``icl.cli.relation.main
--train --coordinator ... --process_id N`` on a shared model dir must

* bootstrap via icl.runtime.init and feed via the input-sharded path,
* write exactly ONE checkpoint tree / metrics stream / config dump
  (process-0 gating — 2 writers would race orbax step dirs and interleave
  the JSONL),
* restore-and-resume across process boundaries exactly like an
  uninterrupted run (the kill-and-relaunch story of SURVEY §5.3 on a pod),
* match the single-process 8-device run numerically,
* evaluate/early-stop in lockstep with identical decisions, and
* shard --predict across processes with a byte-identical merged .scores.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = os.path.join(os.path.dirname(__file__), "_cli_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_workers(specs, timeout=600):
    """specs: list of (num_local_devices, task, cli_args). Parallel spawn."""
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)
    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen(
        [sys.executable, WORKER, str(nd), task, *args],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for nd, task, args in specs]
    outs = [p.communicate(timeout=timeout)[0] for p in procs]
    return [(p.returncode, out) for p, out in zip(procs, outs)]


def _relation_args(data_dir, model_dir, epochs, *, metrics=None, extra=()):
    a = ["--train", "--data_dir", str(data_dir), "--data_split", "train",
         "--epochs", str(epochs), "--images_per_batch", "8",
         "--lstm_hidden_width", "6", "--head_hidden", "12",
         "--dropout", "0.0", "--ckpt_every", "5", "--seed", "7",
         "--mesh", "8x1", "--model_file", str(model_dir)]
    if metrics:
        a += ["--metrics_file", str(metrics)]
    return a + list(extra)


def _dist(port, pid):
    return ["--coordinator", f"localhost:{port}", "--num_processes", "2",
            "--process_id", str(pid)]


def _latest_params(model_dir):
    import orbax.checkpoint as ocp

    with ocp.CheckpointManager(os.path.abspath(model_dir)) as mgr:
        step = mgr.latest_step()
        assert step is not None, f"no checkpoint in {model_dir}"
        restored = mgr.restore(step, args=ocp.args.StandardRestore())
    flat = {}

    def walk(prefix, node):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(f"{prefix}/{k}", v)
        else:
            flat[prefix] = np.asarray(node)

    walk("", restored["params"])
    return step, flat


@pytest.fixture(scope="module")
def cli_data(tmp_path_factory):
    from icl.testing.synth import SynthConfig, generate_dataset

    d = tmp_path_factory.mktemp("cli_mp_data")
    generate_dataset(str(d), "train", SynthConfig(
        num_images=16, captions_per_image=2, vocab_size=40, emb_dim=12,
        max_mentions_per_caption=2, max_boxes_per_image=4, seed=0))
    return d


def test_cli_two_process_train_resume_matches(cli_data, tmp_path):
    # --- single-process 8-device reference, same CLI ---
    res = _run_workers([(8, "relation", _relation_args(
        cli_data, tmp_path / "m_single", 10))])
    assert res[0][0] == 0, res[0][1]
    step_s, params_s = _latest_params(tmp_path / "m_single")

    # --- 2-process straight run on a SHARED model dir ---
    port = _free_port()
    mdir = tmp_path / "m_mp"
    metrics = tmp_path / "mp_metrics.jsonl"
    res = _run_workers([
        (4, "relation", _relation_args(cli_data, mdir, 10, metrics=metrics)
         + _dist(port, pid)) for pid in range(2)])
    for rc, out in res:
        assert rc == 0, out

    # exactly one writer: config dump exists, metrics has exactly the one
    # step-20 line (two uncoordinated writers would double it)
    assert (mdir / "train_config.json").exists()
    assert (mdir / "model_config.json").exists()
    lines = [json.loads(x) for x in metrics.read_text().splitlines()]
    assert [x["step"] for x in lines] == [20]
    step_m, params_m = _latest_params(mdir)
    assert step_m == step_s == 20
    for k in params_s:
        # gloo cross-process psum may reassociate — tight but not bitwise
        np.testing.assert_allclose(params_m[k], params_s[k],
                                   atol=1e-6, rtol=1e-6, err_msg=k)

    # --- kill-and-relaunch: 2-process run stops at epoch 4, processes die
    # (subprocesses exit), a FRESH pair resumes to epoch 10 on the same
    # shared dir and must land exactly where the straight run did ---
    mdir_r = tmp_path / "m_mp_resume"
    port_a = _free_port()   # ONE port per phase — a per-pid _free_port()
    res = _run_workers([    # would point the workers at different services
        (4, "relation", _relation_args(cli_data, mdir_r, 4)
         + _dist(port_a, pid)) for pid in range(2)])
    for rc, out in res:
        assert rc == 0, out
    port_b = _free_port()
    res = _run_workers([
        (4, "relation", _relation_args(cli_data, mdir_r, 10,
                                       extra=["--resume", "auto"])
         + _dist(port_b, pid)) for pid in range(2)])
    for rc, out in res:
        assert rc == 0, out
    assert any("resumed from checkpoint" in out for _, out in res)
    step_r, params_r = _latest_params(mdir_r)
    assert step_r == 20
    for k in params_m:
        np.testing.assert_allclose(params_r[k], params_m[k],
                                   atol=1e-6, rtol=1e-6, err_msg=k)


def _assert_scores_equiv(a, b, atol=2.1e-6):
    """Merged multi-process scores vs the single-process run.

    Byte-identity across TOPOLOGIES is not an XLA guarantee: a 4-device
    local mesh fuses/vectorizes per-row reductions differently than the
    8-device global mesh, reassociating f32 at ~1e-7 - enough to flip the
    6th decimal when a probability sits on a rounding boundary (observed
    on the mention task).  The contract therefore is: identical ids in
    identical order, probabilities within one ulp of the %.6f format, and
    byte-DETERMINISM at fixed topology (asserted separately).  The part
    merge itself is byte-exact by construction."""
    from icl.io.scores import read_scores

    ia, pa = read_scores(str(a))
    ib, pb = read_scores(str(b))
    assert ia == ib
    np.testing.assert_allclose(pa, pb, atol=atol, rtol=0)


def test_cli_two_process_predict_merges_byte_identical(cli_data, tmp_path):
    """2-process --predict sweeps disjoint contiguous image slices on
    per-host LOCAL meshes and merges the per-host part files into a
    `.scores` byte-identical to the single-process run (VERDICT r3
    missing#2: predict used to hard-error on a pod, so the longest
    wall-clock job at scale could not use it)."""
    res = _run_workers([(8, "relation", _relation_args(
        cli_data, tmp_path / "m_pred", 3))])
    assert res[0][0] == 0, res[0][1]
    base = ["--predict", "--eval", "--data_dir", str(cli_data),
            "--data_split",
            "train", "--images_per_batch", "8", "--lstm_hidden_width", "6",
            "--head_hidden", "12", "--mesh", "8x1",
            "--model_file", str(tmp_path / "m_pred")]
    s1, s2 = tmp_path / "single.scores", tmp_path / "multi.scores"
    res = _run_workers([(8, "relation", base + ["--scores_file", str(s1)])])
    assert res[0][0] == 0, res[0][1]
    table_s = _extract_table(res[0][1])
    port = _free_port()
    res = _run_workers([
        (4, "relation", base + ["--scores_file", str(s2)] + _dist(port, pid))
        for pid in range(2)])
    for rc, out in res:
        assert rc == 0, out
    _assert_scores_equiv(s2, s1)
    # sharded --eval: each process counted its image slice; exactly ONE
    # process prints the merged table and it equals the single-process one
    tables = [_extract_table(out) for _, out in res if "Accuracy:" in out]
    assert len(tables) == 1, "exactly one process must print the table"
    assert tables[0] == table_s
    assert not list(tmp_path.glob("*.sdpart-*")), "sd parts not cleaned up"
    assert not list(tmp_path.glob("*.part-*")), "part files not cleaned up"
    meta = json.loads((tmp_path / "multi.scores.meta.json").read_text())
    assert meta["num_examples"] == len(s1.read_text().splitlines())
    # SURVEY 7.3 determinism at fixed topology: a second 2-process sweep
    # must reproduce the merged bytes exactly
    s3 = tmp_path / "multi2.scores"
    port = _free_port()
    res = _run_workers([
        (4, "relation", base + ["--scores_file", str(s3)] + _dist(port, pid))
        for pid in range(2)])
    for rc, out in res:
        assert rc == 0, out
    assert s3.read_bytes() == s2.read_bytes()


def _extract_table(out: str) -> str:
    """The ScoreDict P/R/F1 block printed to stdout, logs stripped."""
    lines = out.splitlines()
    starts = [i for i, l in enumerate(lines) if l.startswith("label ")]
    ends = [i for i, l in enumerate(lines) if l.startswith("Accuracy:")]
    assert starts and ends, f"no ScoreDict table in output:\n{out}"
    return "\n".join(lines[starts[0]:ends[-1] + 1])


def test_cli_two_process_eval_early_stop_matches(cli_data, tmp_path):
    """--eval_every + --early_stop on a 2-process run must evaluate in
    lockstep and stop at the SAME step with the SAME restored best weights
    as the single-process 8-device run (VERDICT r3 missing#1: the eval hook
    used to bail under process_count > 1, leaving pod runs blind)."""
    # learn_rate 0.5 makes the tiny task overshoot: eval loss bottoms out
    # ~step 6 then worsens, so the stop fires mid-run (pilot: stop at 10,
    # best 6) with ~0.07 loss margins — far above gloo's ~1e-6 reassoc
    ex = ["--eval_every", "2", "--eval_split", "train", "--eval_batches",
          "2", "--early_stop", "2", "--learn_rate", "0.5"]
    res = _run_workers([(8, "relation", _relation_args(
        cli_data, tmp_path / "m_es_s", 10, metrics=tmp_path / "s.jsonl",
        extra=ex))])
    assert res[0][0] == 0, res[0][1]
    assert "early stop at step" in res[0][1]
    step_s, params_s = _latest_params(tmp_path / "m_es_s")
    assert step_s < 20   # stopped before the epoch cap, tail pruned

    port = _free_port()
    metrics = tmp_path / "mp.jsonl"
    res = _run_workers([
        (4, "relation", _relation_args(cli_data, tmp_path / "m_es_mp", 10,
                                       metrics=metrics, extra=ex)
         + _dist(port, pid)) for pid in range(2)])
    for rc, out in res:
        assert rc == 0, out
    assert any("early stop at step" in out for _, out in res)
    step_m, params_m = _latest_params(tmp_path / "m_es_mp")
    assert step_m == step_s
    for k in params_s:
        # looser than the straight-run test: lr 0.5 amplifies gloo's psum
        # reassociation to ~2e-5 max abs over the 6 kept steps (measured;
        # the early-stop decision margins are ~0.07, 3 orders above)
        np.testing.assert_allclose(params_m[k], params_s[k],
                                   atol=5e-5, rtol=5e-5, err_msg=k)
    # ONE metrics writer, and its eval points match the single-process run
    def evals(p):
        return [x for x in map(json.loads, p.read_text().splitlines())
                if "eval_loss" in x]
    ev_m, ev_s = evals(metrics), evals(tmp_path / "s.jsonl")
    assert [e["step"] for e in ev_m] == [e["step"] for e in ev_s]
    np.testing.assert_allclose([e["eval_loss"] for e in ev_m],
                               [e["eval_loss"] for e in ev_s], atol=1e-4)


def test_cli_two_process_affinity_predict_with_rank_merges(cli_data,
                                                           tmp_path):
    """Affinity's sharded predict covers a different dataset schema (grid
    cells, box features) AND a second distributed artifact: --rank_file
    goes through write_scores_sharded too, so both merged files must
    match the single-process run (_assert_scores_equiv contract)."""
    train = ["--train", "--data_dir", str(cli_data), "--data_split",
             "train", "--epochs", "2", "--images_per_batch", "8",
             "--lstm_hidden_width", "6", "--head_hidden", "12",
             "--dropout", "0.0", "--seed", "7", "--mesh", "8",
             "--model_file", str(tmp_path / "m_aff")]
    res = _run_workers([(8, "affinity", train)])
    assert res[0][0] == 0, res[0][1]
    base = ["--predict", "--data_dir", str(cli_data), "--data_split",
            "train", "--images_per_batch", "8", "--lstm_hidden_width", "6",
            "--head_hidden", "12", "--mesh", "8x1",
            "--model_file", str(tmp_path / "m_aff")]
    for tag, procs in (("s", None), ("m", 2)):
        sc = tmp_path / f"{tag}.scores"
        rk = tmp_path / f"{tag}.rank"
        argv = base + ["--scores_file", str(sc), "--rank_file", str(rk)]
        if procs is None:
            res = _run_workers([(8, "affinity", argv)])
        else:
            port = _free_port()
            res = _run_workers([(4, "affinity", argv + _dist(port, pid))
                                for pid in range(procs)])
        for rc, out in res:
            assert rc == 0, out
    _assert_scores_equiv(tmp_path / "m.scores", tmp_path / "s.scores")
    _assert_scores_equiv(tmp_path / "m.rank", tmp_path / "s.rank")
    assert not list(tmp_path.glob("*.part-*"))


def test_cli_two_process_mention_predict_merges(cli_data, tmp_path):
    """Nonvisual's sharded predict slices the flat MentionDataset rows
    (a third schema) — merged .scores must equal the single-process run."""
    train = ["--train", "--data_dir", str(cli_data), "--data_split",
             "train", "--epochs", "2", "--batch_size", "16",
             "--hidden_width", "8", "--dropout", "0.0", "--seed", "7",
             "--mesh", "8", "--model_file", str(tmp_path / "m_nv")]
    res = _run_workers([(8, "nonvisual", train)])
    assert res[0][0] == 0, res[0][1]
    base = ["--predict", "--data_dir", str(cli_data), "--data_split",
            "train", "--batch_size", "16", "--hidden_width", "8",
            "--mesh", "8x1", "--model_file", str(tmp_path / "m_nv")]
    s1, s2 = tmp_path / "nv_s.scores", tmp_path / "nv_m.scores"
    res = _run_workers([(8, "nonvisual", base + ["--scores_file", str(s1)])])
    assert res[0][0] == 0, res[0][1]
    port = _free_port()
    res = _run_workers([
        (4, "nonvisual", base + ["--scores_file", str(s2)]
         + _dist(port, pid)) for pid in range(2)])
    for rc, out in res:
        assert rc == 0, out
    _assert_scores_equiv(s2, s1)


def test_cli_two_process_joint_forwards_bootstrap(cli_data, tmp_path):
    """icl-joint on a pod: the wrapper must FORWARD the bootstrap flags so
    each sub-CLI runs its sharded sweep (dropping them would leave every
    process single-process, sweeping the FULL split and racing on the same
    default `.scores` paths), and icl.runtime.init must be idempotent —
    the relation/affinity mains re-enter it in the same process after
    nonvisual already initialized jax.distributed.

    Predict-from-init keeps this cheap: identical seeds give identical
    init params, so no training is needed for the merge contract."""
    import shutil

    data = tmp_path / "data"
    shutil.copytree(cli_data, data)
    base = ["--predict", "--data_dir", str(data), "--data_split", "train",
            "--images_per_batch", "8", "--batch_size", "16",
            "--lstm_hidden_width", "6", "--hidden_width", "8",
            "--seed", "7", "--mesh", "8x1"]
    tasks = ("nonvisual", "relation", "affinity")

    def grab(tag):
        out = {}
        for t in tasks:
            p = data / f"train.{t}.scores"
            assert p.exists(), f"{tag}: {p} missing"
            out[t] = p.read_bytes()
            p.rename(tmp_path / f"{tag}.{t}.scores")
        return out

    res = _run_workers([(8, "joint", list(base))])
    assert res[0][0] == 0, res[0][1]
    single = grab("s")
    port = _free_port()
    res = _run_workers([(4, "joint", base + _dist(port, pid))
                        for pid in range(2)])
    for rc, out in res:
        assert rc == 0, out
        # the sharded path actually ran in every sub-CLI
        assert out.count("sharded predict") >= len(tasks), out
    grab("m")
    for t in tasks:
        _assert_scores_equiv(tmp_path / f"m.{t}.scores",
                             tmp_path / f"s.{t}.scores")
    assert not list(data.glob("*.part-*")), "part files not cleaned up"


def test_cli_four_process_predict_merges(cli_data, tmp_path):
    """4 processes × 2 devices: the weighted predict partition has THREE
    interior boundaries and gather_parts merges FOUR parts in rank order —
    p=2 runs cannot distinguish rank-ordered from reversed merges, never
    produce an interior (0 < k < p-1) slice, and a p=2 ScoreDict merge is
    commutative where a p=4 one exposes ordering bugs.

    Predict-from-init (identical seeds, no training) keeps it cheap."""
    base = ["--predict", "--eval", "--data_dir", str(cli_data),
            "--data_split", "train", "--images_per_batch", "8",
            "--lstm_hidden_width", "6", "--head_hidden", "12",
            "--seed", "7", "--mesh", "8x1",
            "--model_file", str(tmp_path / "m4")]
    s1, s2 = tmp_path / "p4_s.scores", tmp_path / "p4_m.scores"
    res = _run_workers([(8, "relation", base + ["--scores_file", str(s1)])])
    assert res[0][0] == 0, res[0][1]
    table_s = _extract_table(res[0][1])
    port = _free_port()
    res = _run_workers([
        (2, "relation", base + ["--scores_file", str(s2),
                                "--coordinator", f"localhost:{port}",
                                "--num_processes", "4",
                                "--process_id", str(pid)])
        for pid in range(4)])
    for rc, out in res:
        assert rc == 0, out
    # every rank swept its own slice on its 2 local devices
    ranks = sorted(out.split("sharded predict: process ")[1][:3]
                   for _, out in res)
    assert ranks == [f"{k}/4" for k in range(4)], ranks
    _assert_scores_equiv(s2, s1)
    tables = [_extract_table(out) for _, out in res if "Accuracy:" in out]
    assert len(tables) == 1, "exactly one process must print the table"
    assert tables[0] == table_s
    assert not list(tmp_path.glob("*.part-*")), "part files not cleaned up"
    assert not list(tmp_path.glob("*.sdpart-*")), "sd parts not cleaned up"


def test_cli_sharded_predict_batch_divides_local_mesh(cli_data, tmp_path):
    """A multi-process predict sweep runs on the LOCAL all-device mesh,
    whose data axis can be LARGER than the global mesh's: with ``--mesh
    2x4`` across 2 hosts of 4 devices, the global data axis is 2 but the
    predict mesh shards 4 ways.  A batch size rounded only to the global
    size (2) used to crash ``shard_batch`` mid-sweep and strand the other
    host at the merge barrier (r4 review finding — sweep_data_axis_size).

    Predict-from-init keeps it cheap (identical seeds, no training)."""
    base = ["--predict", "--data_dir", str(cli_data), "--data_split",
            "train", "--batch_size", "2", "--hidden_width", "8",
            "--seed", "7", "--mesh", "2x4",
            "--model_file", str(tmp_path / "m_div")]
    s1, s2 = tmp_path / "div_s.scores", tmp_path / "div_m.scores"
    res = _run_workers([(8, "nonvisual", base + ["--scores_file", str(s1)])])
    assert res[0][0] == 0, res[0][1]
    port = _free_port()
    res = _run_workers([
        (4, "nonvisual", base + ["--scores_file", str(s2)]
         + _dist(port, pid)) for pid in range(2)])
    for rc, out in res:
        assert rc == 0, out
        # the round-up must target the 4-device predict mesh, not the
        # global data axis (2, which 2 already divides)
        assert "rounded up to 4" in out, out
    _assert_scores_equiv(s2, s1)
