"""icl-import — rebuild a loadable checkpoint from an ``icl-export`` .npz.

The reference's weights workflow was two-way: Keras ``save_weights`` to an
``.h5`` AND ``load_weights`` back for prediction (SURVEY §2.1) — any tool
that could write the archive could feed the predictor.  ``icl-export``
covers the dump direction; this CLI is the converse: it takes the flat
``.npz`` (+ its ``.manifest.json`` sidecar) and writes a fresh model
directory that ``--predict`` / ``icl-serve`` load exactly like one produced
by ``--train``:

* params are unflattened from the ``path/like/this`` keys back into the
  pinned param-tree layout (CLAUDE.md conventions — the same contract the
  checkpoint/oracle compat rides on);
* a fresh Adam optimizer state is initialized over them (zeros — the same
  structure ``create_train_state`` builds, so the predict CLIs' template
  restore matches; resumed TRAINING from an import restarts Adam moments,
  which the import logs),
* the manifest's ``model_config.json`` / ``train_config.json`` are
  re-materialized so predict picks up the architecture dims without flags.

Round-trip contract (tests/integration/test_export.py): train → export →
import → predict produces a ``.scores`` file byte-identical to predicting
from the original checkpoint directory.

Usage::

    icl-import --npz rel_weights.npz --model_file runs/rel_imported.model
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

from icl.util.log import LOG


def unflatten_params(flat: dict[str, np.ndarray]) -> dict:
    """Invert :func:`icl.cli.export.flatten_params` for dict param trees."""
    tree: dict = {}
    for key in sorted(flat):
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            nxt = node.setdefault(p, {})
            if not isinstance(nxt, dict):
                raise ValueError(
                    f"key {key!r} nests under {p!r}, which is already a "
                    f"parameter leaf — the archive's keys do not form a tree")
            node = nxt
        if parts[-1] in node:
            raise ValueError(
                f"key {key!r} collides with an existing subtree — the "
                f"archive's keys do not form a tree")
        node[parts[-1]] = flat[key]
    return tree


def import_checkpoint(npz: str, model_dir: str | None,
                      step: int | None = None, seed: int = 0,
                      validate_only: bool = False) -> int:
    """Write ``model_dir`` as a restorable checkpoint; returns the step.

    With ``validate_only`` the archive/manifest consistency checks run
    (keys form a tree, every leaf matches the manifest's shape/dtype) but
    nothing is written — the `icl-check` role for weight archives.
    """
    import jax
    import optax
    import orbax.checkpoint as ocp

    manifest = None
    man_path = npz + ".manifest.json"
    if os.path.exists(man_path):
        with open(man_path) as f:
            manifest = json.load(f)
    else:
        LOG.warning("no manifest sidecar at %s — importing as step %s with "
                    "no model_config.json (predict will need explicit "
                    "dimension flags)", man_path,
                    step if step is not None else 0)

    with np.load(npz) as z:
        flat = {k: np.asarray(z[k]) for k in z.files}
    if not flat:
        raise ValueError(f"{npz} contains no arrays")
    if manifest is not None:
        # the manifest is the export's self-description — a mismatch means
        # the archive was edited inconsistently; fail before writing
        want = manifest.get("params", {})
        missing = sorted(set(want) - set(flat))
        extra = sorted(set(flat) - set(want))
        if missing or extra:
            raise ValueError(
                f"archive does not match its manifest (missing {missing}, "
                f"unlisted {extra}) — regenerate the manifest or remove it "
                f"to import as-is")
        for k, spec in want.items():
            got = flat[k]
            if list(got.shape) != spec["shape"] or str(got.dtype) != \
                    spec["dtype"]:
                raise ValueError(
                    f"{k}: archive has {got.dtype}{list(got.shape)}, "
                    f"manifest says {spec['dtype']}{spec['shape']}")
    params = unflatten_params(flat)

    if step is None:
        step = int(manifest["step"]) if manifest else 0
    if validate_only:
        LOG.info("validate: %s OK — %d tensors / %s parameters, step %d, "
                 "%s manifest", npz, len(flat),
                 f"{sum(v.size for v in flat.values()):,}", step,
                 "consistent" if manifest else "NO")
        return step
    if model_dir is None:
        raise ValueError("model_dir is required unless validate_only")
    # the exact payload Checkpointer.save writes (icl/train/checkpoint.py):
    # the predict CLIs restore it into a create_train_state skeleton, so
    # the optimizer state must have Adam's structure — fresh zeros (the lr
    # lives in the transformation, not the state, so any lr matches)
    opt_state = jax.device_get(optax.adam(1e-3).init(params))
    rng = np.asarray(jax.random.split(jax.random.PRNGKey(seed))[1])
    payload = {"params": params, "opt_state": opt_state, "step": step,
               "rng": rng, "epoch": 0, "batch_in_epoch": 0}

    model_dir = os.path.abspath(model_dir)
    os.makedirs(model_dir, exist_ok=True)
    with ocp.CheckpointManager(
            model_dir,
            options=ocp.CheckpointManagerOptions(create=True)) as mgr:
        if mgr.all_steps():
            raise ValueError(
                f"{model_dir} already holds checkpoint steps "
                f"{sorted(mgr.all_steps())} — import into a fresh directory")
        mgr.save(step, args=ocp.args.StandardSave(payload))
        mgr.wait_until_finished()

    wrote_cfg = []
    if manifest:
        for name in ("model_config", "train_config"):
            if name in manifest:
                with open(os.path.join(model_dir, name + ".json"), "w") as f:
                    json.dump(manifest[name], f)
                wrote_cfg.append(name + ".json")
    LOG.info("imported %d tensors as step %d -> %s (%s; optimizer state is "
             "fresh — resumed training restarts Adam moments)",
             len(flat), step, model_dir,
             ", ".join(wrote_cfg) if wrote_cfg else "no configs in manifest")
    return step


def main(argv=None) -> None:
    p = argparse.ArgumentParser(
        prog="icl-import", allow_abbrev=False,
        description="Rebuild a predict/serve-loadable model directory from "
                    "an icl-export .npz (+ .manifest.json)")
    p.add_argument("--npz", required=True, help="icl-export archive")
    p.add_argument("--model_file", default=None,
                   help="output checkpoint directory (must be fresh)")
    p.add_argument("--step", type=int, default=None,
                   help="step number to import as (default: manifest step)")
    p.add_argument("--validate_only", action="store_true",
                   help="check archive/manifest consistency, write nothing")
    args = p.parse_args(argv)
    if not args.validate_only and args.model_file is None:
        p.error("--model_file is required unless --validate_only")
    import_checkpoint(args.npz, args.model_file, args.step,
                      validate_only=args.validate_only)


if __name__ == "__main__":
    main()
