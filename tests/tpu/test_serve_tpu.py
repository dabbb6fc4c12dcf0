"""Serve-on-TPU smoke: the production HTTP path over the FUSED predict head.

The CPU serve suite (tests/integration/test_serve.py) runs with fused=False
(gather-form oracle); on TPU `_load_task` selects the fused Pallas head, so
kernel-wrapper changes can break serving without failing the CPU tests.
This test makes the manual "serve-on-TPU drive" repeatable: train a tiny
relation checkpoint on the real chip, warm the server up, and require
deterministic, normalized scores over HTTP (SURVEY §5.5 / VERDICT r2
missing#4 overload story is CPU-tested; this covers the device path).
"""

import json
import threading
import urllib.request

import jax
import pytest


def _require_tpu():
    if jax.devices()[0].platform != "tpu":
        pytest.skip("needs a real TPU device")


def _post(url, path, obj):
    req = urllib.request.Request(
        url + path, data=json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    with urllib.request.urlopen(req, timeout=180) as r:
        return r.status, json.loads(r.read())


def test_serve_relation_on_tpu(tmp_path):
    _require_tpu()
    from icl.cli import relation
    from icl.serve import serve
    from icl.testing.synth import SynthConfig, generate_dataset

    d = str(tmp_path)
    generate_dataset(d, "train", SynthConfig(num_images=4, seed=31))
    relation.main(["--train", "--data_dir", d, "--epochs", "1",
                   "--lstm_hidden_width", "8", "--head_hidden", "16",
                   "--images_per_batch", "2"])

    httpd = serve(d, port=0, tasks=["relation"], warmup="basic")
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    url = f"http://127.0.0.1:{httpd.server_port}"
    try:
        with urllib.request.urlopen(url + "/healthz", timeout=30) as r:
            health = json.loads(r.read())
        assert health["status"] == "ok" and health["tasks"] == ["relation"]

        img = {"id": "doc#1",
               "captions": [["w001", "w002", "w003"], ["w004", "w001"]],
               "mentions": [{"caption": 0, "first": 1, "last": 1},
                            {"caption": 1, "first": 1, "last": 1}]}
        status, body = _post(url, "/score/relation", {"images": [img]})
        assert status == 200, body
        pairs = body["images"][0]["pairs"]
        assert pairs[0]["pair"] == [0, 1]
        assert abs(sum(pairs[0]["probs"]) - 1.0) < 1e-4

        # §6.2 determinism contract holds over HTTP on the device path
        status, body2 = _post(url, "/score/relation", {"images": [img]})
        assert status == 200
        assert body2["images"][0]["pairs"] == pairs
    finally:
        httpd.shutdown()
