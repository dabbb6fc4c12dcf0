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


@pytest.fixture
def icl_log_capture():
    """Capture icl's LOG records via a temporary handler.

    The logger doesn't propagate (caplog sees nothing) and its stderr
    StreamHandler binds whatever ``sys.stderr`` existed when the FIRST test
    touched LOG — under capsys that is some earlier test's capture stream,
    so reading this test's capsys is order-dependent (failed in the full
    suite, passed standalone).  A scoped handler is deterministic."""
    import io
    import logging

    buf = io.StringIO()
    h = logging.StreamHandler(buf)
    log = logging.getLogger("icl")
    log.addHandler(h)
    try:
        yield buf
    finally:
        log.removeHandler(h)


def test_demotion_warning_carries_file_and_line(tmp_path, icl_log_capture):
    """A whole-load fallback must say WHICH line triggered it (VERDICT r3
    weak#5): one stray non-ASCII byte in millions of rows demotes the load
    4x and the user needs a route back to the fast path."""
    from icl.native.feats import parse_feats_file, parse_feats_labels

    if not native.available():
        pytest.skip("native library unavailable")
    p = tmp_path / "t.feats"
    # line 3's id is PADDED with a non-breaking space: Python strip()
    # removes it, bytes differ -> needs_python
    p.write_bytes(b"1.0 1:2.0 # doc:a;mention:0\n"
                  b"0.0 2:1.5 # doc:b;mention:1\n"
                  b"1.0 3:0.5 # \xc2\xa0doc:c;mention:2\n")
    assert parse_feats_file(str(p)) is None
    err = icl_log_capture.getvalue()
    assert "line 3" in err and "t.feats" in err and "icl-check" in err, err
    assert parse_feats_labels(str(p)) is None
    assert icl_log_capture.getvalue().count("line 3") >= 2


def test_mentions_demotion_warning_line(tmp_path, icl_log_capture):
    from icl.native.mentions import parse_mentions

    if not native.available():
        pytest.skip("native library unavailable")
    p = tmp_path / "m.txt"
    p.write_text("doc:a.jpg;caption:0;mention:0\t0,1\n"
                 "doc:a.jpg;caption:0;mention:1\t1,2\n"
                 "not-an-id\t0,1\n")
    assert parse_mentions(str(p)) is None
    err = icl_log_capture.getvalue()
    assert "line 3" in err and "m.txt" in err, err


def test_check_counts_nonascii_lines(tmp_path, capsys):
    """icl-check INFO census of fast-path-demoting non-ASCII lines."""
    from icl.cli import check as check_cli
    from icl.testing.synth import SynthConfig, generate_dataset

    d = tmp_path / "data"
    generate_dataset(str(d), "train", SynthConfig(num_images=2, seed=0))
    feats = d / "train.nonvisual.feats"
    raw = feats.read_bytes().splitlines(keepends=True)
    raw[1] = raw[1].rstrip(b"\n") + b"\xc2\xa0\n"
    feats.write_bytes(b"".join(raw))
    try:
        check_cli.main(["--data_dir", str(d), "--data_split", "train"])
    except SystemExit:
        pass  # an NBSP-padded id is legal data — but don't gate exit here
    cap = capsys.readouterr()
    out = cap.out + cap.err
    assert "non-ASCII" in out and "first: line 2" in out, out


def test_check_census_cr_line_numbering(tmp_path, capsys):
    """The census splits physical \\n-chunks on bare \\r so its line
    numbers match the universal-newline parsers' demotion warnings across
    bare-\\r, \\r\\n, and trailing-\\r terminators (r4 advisor finding:
    this CR-aware numbering had no regression test)."""
    from icl.cli import check as check_cli
    from icl.testing.synth import SynthConfig, generate_dataset

    d = tmp_path / "data"
    generate_dataset(str(d), "train", SynthConfig(num_images=2, seed=0))
    feats = d / "train.nonvisual.feats"
    lines = feats.read_bytes().splitlines()
    assert len(lines) >= 5
    # NBSP-pad universal-newline line 3, which hides inside the FIRST
    # physical \n-chunk behind a bare \r and an \r\n — naive \n-based
    # numbering would report line 1; end the file with a trailing bare \r
    blob = (lines[0] + b"\r" + lines[1] + b"\r\n" + lines[2] + b"\xc2\xa0"
            + b"\n" + b"\n".join(lines[3:]) + b"\r")
    feats.write_bytes(blob)
    # the parsers' numbering authority: Python universal-newline text mode
    with open(feats, "r", encoding="utf-8", errors="surrogateescape") as f:
        utext = f.read().splitlines()
    assert len(utext) == len(lines)          # trailing \r adds no line
    expect = next(i + 1 for i, t in enumerate(utext)
                  if any(ord(c) > 127 for c in t))
    assert expect == 3
    try:
        check_cli.main(["--data_dir", str(d), "--data_split", "train"])
    except SystemExit:
        pass  # NBSP-padded ids are legal data — exit code not gated here
    cap = capsys.readouterr()
    out = cap.out + cap.err
    assert "non-ASCII" in out and f"first: line {expect}" in out, out
