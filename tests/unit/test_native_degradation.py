"""Native IO is an optimization layer, never a dependency: a stale or
unloadable libicl_native.so must degrade to the pure-Python paths, not
crash (r3 review finding: the ctypes symbol binding raised AttributeError
through every dataset load when an old .so lacked the featsl_* symbols)."""

import os
import shutil
import subprocess

import numpy as np
import pytest

import icl.native as native
from icl.io.feats import read_feats_labels


@pytest.fixture
def native_globals_restored(monkeypatch):
    monkeypatch.setenv("ICL_NO_NATIVE_BUILD", "1")
    old_lib, old_failed = native._lib, native._load_failed
    yield
    native._lib, native._load_failed = old_lib, old_failed


def _build_symbolless_so(tmp_path):
    if shutil.which("g++") is None:
        pytest.skip("no g++ to build a stale stand-in library")
    src = tmp_path / "stale.cpp"
    src.write_text('extern "C" int unrelated_symbol() { return 1; }\n')
    so = tmp_path / "libstale.so"
    subprocess.run(["g++", "-shared", "-fPIC", "-o", str(so), str(src)],
                   check=True, capture_output=True)
    return so


def test_stale_library_degrades_to_python(tmp_path, monkeypatch,
                                          native_globals_restored):
    so = _build_symbolless_so(tmp_path)
    monkeypatch.setattr(native, "_LIB_PATH", str(so))
    native._lib, native._load_failed = None, False
    assert native._load() is None            # degraded, no AttributeError
    assert native._load_failed               # failure is remembered
    assert native.available() is False

    feats = tmp_path / "t.feats"
    feats.write_text("1 3:0.5 7:1.0 # doc:x;m:0\n0 2:0.25 # doc:x;m:1\n")
    ids, labels = read_feats_labels(str(feats))   # pure-Python fallback
    assert ids == ["doc:x;m:0", "doc:x;m:1"]
    assert np.allclose(labels, [1.0, 0.0])


def test_missing_library_stays_unavailable(tmp_path, monkeypatch,
                                           native_globals_restored):
    monkeypatch.setattr(native, "_LIB_PATH", str(tmp_path / "absent.so"))
    native._lib, native._load_failed = None, False
    assert native._load() is None
    assert native.available() is False
