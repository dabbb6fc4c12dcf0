"""Memory-safety harness for the native parsers: build the C++ with
ASAN/UBSAN and drive every parse/fill/free path over normal and
adversarial inputs (ctypes tests can't see an out-of-bounds write that
lands inside a heap slack region — the sanitizer can)."""

import os
import shutil
import subprocess

import pytest

NATIVE = os.path.join(os.path.dirname(__file__), "..", "..", "native")


@pytest.fixture(scope="module")
def harness(tmp_path_factory):
    if shutil.which("g++") is None:
        pytest.skip("no g++ for the sanitizer build")
    r = subprocess.run(["make", "-C", NATIVE, "asan"],
                       capture_output=True, text=True)
    if r.returncode != 0:
        pytest.skip(f"sanitizer build unavailable: {r.stderr[-200:]}")
    return os.path.join(NATIVE, "asan_harness")


def _run(harness, paths):
    r = subprocess.run([harness, *map(str, paths)],
                       capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr[-2000:] or r.stdout[-2000:]
    assert "asan-harness: OK" in r.stdout


def test_sanitizers_clean_on_synth_split(harness, tmp_path):
    from icl.testing import SynthConfig, generate_dataset

    d = tmp_path / "d"
    generate_dataset(str(d), "train", SynthConfig(num_images=3, seed=61))
    _run(harness, [d / "train.relation.feats", d / "train.affinity.feats",
                   d / "train.nonvisual.feats", d / "train.mentions.txt",
                   d / "train.captions.txt"])


def test_sanitizers_clean_on_adversarial_bytes(harness, tmp_path):
    cases = {
        "empty": b"",
        "no_newline": b"1 2:3 # doc:a;caption:0;mention:1",
        "only_newlines": b"\n\r\n\r\r\r\n",
        "nul_bytes": b"1 2:3 # doc:a\x00b;caption:0;mention:1\n\x00\x00\n",
        "huge_line": b"1 " + b"2:3 " * 100_000 + b"# doc:a;m:0\n",
        "hash_storm": b"#" * 5000 + b"\n# # # #\n1 # # #\n",
        "truncated_utf8": b"1 2:3 # doc:caf\xc3\n",
        "high_bytes": bytes(range(1, 256)) + b"\n",
        "tabs_only": b"\t\t\t\n\t1\t2,3\n",
        "deep_fields": b"doc:" + b";caption:1" * 2000 + b"\t1,2\n",
        "long_token": b"a.jpg#1\t" + b"x" * 200_000 + b"\n",
        # truncated/overstated w2v .bin headers (the harness drives
        # w2v_load over every input)
        "w2v_truncated": b"1000000 300\nthe " + b"\x00" * 40,
        "w2v_zero_dim": b"5 0\nthe ",
        "w2v_huge_dim": b"2 2000000000\nthe \x01\x02",
    }
    paths = []
    for name, data in cases.items():
        p = tmp_path / name
        p.write_bytes(data)
        paths.append(p)
    _run(harness, paths)
