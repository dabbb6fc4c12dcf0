"""E2E serving: HTTP requests against trained checkpoints (icl.serve)."""

import json
import threading
import urllib.request

import numpy as np
import pytest


@pytest.fixture(scope="module")
def served(tmp_path_factory):
    from icl.testing.synth import SynthConfig, generate_dataset
    from icl.cli import nonvisual, relation
    from icl.serve import serve

    d = str(tmp_path_factory.mktemp("serve"))
    generate_dataset(d, "train", SynthConfig(num_images=4, seed=31))
    nonvisual.main(["--train", "--data_dir", d, "--epochs", "2",
                    "--batch_size", "32", "--hidden_width", "16"])
    relation.main(["--train", "--data_dir", d, "--epochs", "1",
                   "--lstm_hidden_width", "8", "--head_hidden", "16",
                   "--images_per_batch", "2"])
    httpd = serve(d, port=0)          # ephemeral port
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_port}", d
    httpd.shutdown()


def _post(url, path, obj):
    req = urllib.request.Request(
        url + path, data=json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_healthz(served):
    url, _ = served
    with urllib.request.urlopen(url + "/healthz") as r:
        body = json.loads(r.read())
    assert body["status"] == "ok"
    assert "nonvisual" in body["tasks"] and "relation" in body["tasks"]


def test_score_nonvisual(served):
    url, _ = served
    status, body = _post(url, "/score/nonvisual", {
        "mentions": [{"id": "m0", "tokens": ["w001", "w002"]},
                     {"id": "m1", "tokens": ["w050"]}]})
    assert status == 200
    assert body["class_order"] == ["visual", "nonvisual"]
    assert len(body["scores"]) == 2
    for s in body["scores"]:
        assert abs(sum(s["probs"]) - 1.0) < 1e-4


def test_score_relation(served):
    url, _ = served
    status, body = _post(url, "/score/relation", {
        "images": [{
            "id": "img0",
            "captions": [["w001", "w002", "w003"], ["w004", "w001"]],
            "mentions": [{"caption": 0, "first": 0, "last": 1},
                         {"caption": 1, "first": 1, "last": 1}],
        }]})
    assert status == 200
    assert body["class_order"] == ["null", "coref", "subset_ij", "subset_ji"]
    pairs = body["images"][0]["pairs"]
    assert pairs[0]["pair"] == [0, 1]
    assert abs(sum(pairs[0]["probs"]) - 1.0) < 1e-4


def test_bad_requests(served):
    url, _ = served
    status, body = _post(url, "/score/affinity", {"images": []})
    assert status == 404               # affinity not trained in this fixture
    status, body = _post(url, "/score/relation", {"wrong": 1})
    assert status == 400 and "error" in body
    req = urllib.request.Request(url + "/score/nonvisual",
                                 data=b"{not json", method="POST")
    try:
        urllib.request.urlopen(req)
        assert False
    except urllib.error.HTTPError as e:
        assert e.code == 400
