"""Native-backed `.feats` parsing and `.scores` writing (ctypes wrappers)."""

from __future__ import annotations

import ctypes

import numpy as np

from icl.native import _load


def _warn_skipped(path: str, skipped: int) -> None:
    """Malformed lines are dropped whole (identically by the native and
    pure-Python parsers — tests/unit/test_feats.py) but never silently."""
    if skipped:
        from icl.util.log import LOG
        LOG.warning("%s: skipped %d malformed line(s)", path, skipped)


def parse_feats_file(path: str):
    """Returns [(id, label, int32 indices, float32 values), ...] or None."""
    lib = _load()
    if lib is None:
        return None
    handle = lib.feats_parse(path.encode())
    if not handle:
        raise FileNotFoundError(path)
    try:
        n = lib.feats_num_examples(handle)
        nnz = lib.feats_num_entries(handle)
        idlen = lib.feats_id_buffer_size(handle)
        _warn_skipped(path, int(lib.feats_num_skipped(handle)))
        labels = np.empty(n, np.float64)
        row_offsets = np.empty(n + 1, np.int32)
        indices = np.empty(max(nnz, 1), np.int32)
        values = np.empty(max(nnz, 1), np.float32)
        id_buffer = ctypes.create_string_buffer(max(int(idlen), 1))
        id_offsets = np.empty(max(n, 1), np.int64)
        lib.feats_fill(
            ctypes.c_void_p(handle),
            labels.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            row_offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            values.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            id_buffer,
            id_offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        )
    finally:
        lib.feats_free(ctypes.c_void_p(handle))
    raw = id_buffer.raw
    out = []
    for i in range(n):
        off = int(id_offsets[i])
        eid = "" if off < 0 else raw[off:raw.index(b"\0", off)].decode("utf-8")
        s, e = int(row_offsets[i]), int(row_offsets[i + 1])
        out.append((eid, float(labels[i]), indices[s:e].copy(),
                    values[s:e].copy()))
    return out


def parse_feats_labels(path: str):
    """Labels-only parse: returns (ids list, labels float64 array) or None.

    The dataset loaders consume only (id, label); skipping the sparse
    feature columns keeps MSCOCO-scale loads fast and bounded
    (native/icl_native.cpp feats_parse_labels)."""
    lib = _load()
    if lib is None:
        return None
    handle = lib.feats_parse_labels(path.encode())
    if not handle:
        raise FileNotFoundError(path)
    try:
        n = int(lib.featsl_num(handle))
        idlen = int(lib.featsl_id_buffer_size(handle))
        _warn_skipped(path, int(lib.featsl_num_skipped(handle)))
        labels = np.empty(max(n, 1), np.float64)
        id_offsets = np.empty(max(n, 1), np.int64)
        id_buffer = ctypes.create_string_buffer(max(idlen, 1))
        lib.featsl_fill(
            ctypes.c_void_p(handle),
            labels.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            id_buffer,
            id_offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        )
    finally:
        lib.featsl_free(ctypes.c_void_p(handle))
    raw = id_buffer.raw[:idlen]
    if n and (id_offsets[:n] >= 0).all():
        # common case (every line carries an id): one C-speed split
        ids = raw.decode("utf-8").split("\0")[:n]
    else:
        ids = []
        for i in range(n):
            off = int(id_offsets[i])
            ids.append("" if off < 0
                       else raw[off:raw.index(b"\0", off)].decode("utf-8"))
    return ids, labels[:n]


def write_scores_native(path: str, ids: list[str], probs: np.ndarray) -> bool:
    """C++ fast path for .scores; returns False if native is unavailable."""
    lib = _load()
    if lib is None:
        return False
    probs = np.ascontiguousarray(probs, dtype=np.float64)
    n, c = probs.shape
    arr = (ctypes.c_char_p * n)(*[s.encode() for s in ids])
    rc = lib.scores_write(
        path.encode(), arr,
        probs.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_int64(n), ctypes.c_int32(c))
    return rc == 0
