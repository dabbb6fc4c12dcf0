"""icl-export — dump a checkpoint's weights to a portable ``.npz``.

The reference's model artifact was a Keras ``.h5`` weights file any HDF5
reader could open (SURVEY §2.1); this rebuild checkpoints the full train
state as orbax directories (docs/MIGRATION.md "Model files").  For
consumers that want the old grab-the-weights workflow — the Java side, a
notebook, a different framework — this exports the parameters of any
checkpoint step as one flat ``numpy.savez`` archive:

* one entry per parameter leaf, keyed by its param-tree path with ``/``
  separators (``bilstm/fwd/kernel``, ``head_dense/bias``, ...) — the
  SAME pinned paths the checkpoint/oracle layout contract uses
  (CLAUDE.md conventions), so keys are stable across versions;
* a ``<out>.manifest.json`` sidecar with the step, per-leaf
  shapes/dtypes, and the model_config.json / train_config.json contents
  (task, dims, class-order-defining config) so the archive is
  self-describing.

Round-trip fidelity is regression-tested: every exported leaf is
byte-identical to the checkpoint's (tests/integration/test_export.py).

Usage::

    icl-export --model_file runs/rel.model --out rel_weights.npz [--step N]
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

from icl.util.log import LOG


def flatten_params(params) -> dict[str, np.ndarray]:
    """Flatten a param pytree to ``path/like/this`` → numpy leaf."""
    import jax

    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        key = "/".join(
            str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def export_checkpoint(model_dir: str, out: str,
                      step: int | None = None) -> dict:
    """Write ``out`` (.npz) + ``out``.manifest.json; returns the manifest."""
    import orbax.checkpoint as ocp

    model_dir = os.path.abspath(model_dir)
    import logging

    with ocp.CheckpointManager(model_dir) as mgr:
        steps = mgr.all_steps()
        if not steps:
            raise FileNotFoundError(f"no checkpoint steps under {model_dir}")
        if step is None:
            step = mgr.latest_step()
        elif step not in steps:
            raise ValueError(f"step {step} not in checkpoints {sorted(steps)}"
                             f" under {model_dir}")
        # template-free restore: orbax warns UNSAFE for device arrays, but
        # these checkpoints hold self-describing numpy payloads (the saver
        # pulls to host first — icl.train.checkpoint), so scoped-silence
        # the warning rather than alarm every icl-export user
        absl_logger = logging.getLogger("absl")
        prev = absl_logger.level
        absl_logger.setLevel(logging.ERROR)
        try:
            restored = mgr.restore(step, args=ocp.args.StandardRestore())
        finally:
            absl_logger.setLevel(prev)
    flat = flatten_params(restored["params"])
    if not flat:
        raise ValueError(f"checkpoint step {step} has no parameters")
    # deterministic member order (np.savez writes in dict order)
    flat = dict(sorted(flat.items()))
    np.savez(out, **flat)
    manifest: dict = {
        "step": int(step),
        "params": {k: {"shape": list(v.shape), "dtype": str(v.dtype)}
                   for k, v in flat.items()},
        "total_parameters": int(sum(v.size for v in flat.values())),
    }
    for name in ("model_config.json", "train_config.json"):
        p = os.path.join(model_dir, name)
        if os.path.exists(p):
            with open(p) as f:
                manifest[name.removesuffix(".json")] = json.load(f)
    with open(out + ".manifest.json", "w", encoding="utf-8") as f:
        json.dump(manifest, f, indent=2, sort_keys=True)
        f.write("\n")
    LOG.info("exported step %d: %d tensors / %s parameters -> %s (+ "
             "manifest)", step, len(flat),
             f"{manifest['total_parameters']:,}", out)
    return manifest


def main(argv=None) -> None:
    p = argparse.ArgumentParser(
        prog="icl-export", allow_abbrev=False,
        description="Export checkpoint weights to a flat .npz archive "
                    "(+ self-describing .manifest.json)")
    p.add_argument("--model_file", required=True,
                   help="checkpoint directory (the CLIs' --model_file)")
    p.add_argument("--out", required=True, help="output .npz path")
    p.add_argument("--step", type=int, default=None,
                   help="checkpoint step to export (default: latest)")
    args = p.parse_args(argv)
    export_checkpoint(args.model_file, args.out, args.step)


if __name__ == "__main__":
    main()
