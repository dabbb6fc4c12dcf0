"""icl-serve — HTTP scoring service over trained checkpoints (layer L6+).

The reference had no serving story (files were its only interface, SURVEY
§1); this daemon closes the production-serving gap: it loads the embedding
table once, restores per-task checkpoints, and scores JSON requests with
the same jit programs and class orders as the batch CLIs, padding each
request into the bucket inventory so the compile cache stays warm across
requests.

Endpoints (JSON in/out):

    GET  /healthz                    → {"status": "ok", "tasks": [...]}
    POST /score/nonvisual            {"mentions": [{"id", "tokens": [...]}]}
    POST /score/cardinality          same shape as nonvisual
    POST /score/relation             {"images": [{"id", "captions": [[tok]],
                                       "mentions": [{"caption", "first",
                                       "last"}], "pairs": [[i, j], ...]}]}
    POST /score/affinity             {"images": [{"id", "phrases": [[tok]],
                                       "boxes": [[f32 × D]]}]}

Responses carry ``class_order`` and per-item ``probs`` in §6.3–6.5 order,
so a downstream consumer sees exactly the `.scores` semantics over HTTP.
"""

from __future__ import annotations

import argparse
import json
import os
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

import jax.numpy as jnp

from icl.data.buckets import BucketSpec
from icl.data.embeddings import EmbeddingStore
from icl.data.pairs import RELATION_CLASSES
from icl.models import (AFFINITY_CLASSES, CARDINALITY_CLASSES, NONVIS_CLASSES,
                        AffinityModel, CardinalityModel, NonvisualModel,
                        RelationModel)
from icl.train import create_train_state
from icl.train.checkpoint import Checkpointer
from icl.train.steps import (make_affinity_predict, make_mention_predict,
                             make_relation_predict)
from icl.util.log import LOG

_LEN_SPEC = BucketSpec((8, 16, 32, 48))
_CNT_SPEC = BucketSpec((4, 8, 16, 32))


class Scorer:
    """Loads embeddings + available task checkpoints; scores dict payloads."""

    def __init__(self, data_dir: str, embeddings_file: str | None = None,
                 tasks: list[str] | None = None):
        emb_path = embeddings_file or os.path.join(data_dir, "embeddings.txt")
        self.emb = EmbeddingStore.load(emb_path)
        self.table = jnp.asarray(self.emb.table)
        self.tasks: dict[str, dict] = {}
        wanted = tasks or ["nonvisual", "cardinality", "relation", "affinity"]
        for task in wanted:
            model_dir = os.path.join(data_dir, f"{task}.model")
            cfg_path = os.path.join(model_dir, "model_config.json")
            if not os.path.exists(cfg_path):
                continue
            cfg = json.load(open(cfg_path))
            self.tasks[task] = self._load_task(task, model_dir, cfg)
            LOG.info("serve: loaded %s from %s", task, model_dir)
        if not self.tasks:
            raise FileNotFoundError(
                f"no trained <task>.model/model_config.json under {data_dir}")

    def _load_task(self, task: str, model_dir: str, cfg: dict) -> dict:
        if task in ("nonvisual", "cardinality"):
            cls = NonvisualModel if task == "nonvisual" else CardinalityModel
            classes = NONVIS_CLASSES if task == "nonvisual" else CARDINALITY_CLASSES
            model = cls(hidden=cfg.get("hidden", 300), dropout=0.0,
                        num_classes=len(classes))
            pooled0 = jnp.zeros((1, self.emb.dim), jnp.float32)
            state = create_train_state(model, (pooled0,))
            state = Checkpointer(model_dir).restore(state)
            return {"classes": classes, "params": state.params,
                    "predict": make_mention_predict(model.apply)}
        if task == "relation":
            model = RelationModel(lstm_hidden=cfg.get("lstm_hidden", 200),
                                  head_hidden=cfg.get("head_hidden", 800),
                                  dropout=0.0)
            batch = _empty_relation_batch(2, 2, 8, 4)
            state = create_train_state(model, (self.table, batch))
            state = Checkpointer(model_dir).restore(state)
            return {"classes": RELATION_CLASSES, "params": state.params,
                    "predict": make_relation_predict(model.apply)}
        if task == "affinity":
            model = AffinityModel(lstm_hidden=cfg.get("lstm_hidden", 200),
                                  head_hidden=cfg.get("head_hidden", 1024),
                                  dropout=0.0,
                                  phrase_enc=cfg.get("phrase_enc", "lstm"))
            batch = _empty_affinity_batch(2, 8, 4, 4, 64)
            state = create_train_state(model, (self.table, batch))
            state = Checkpointer(model_dir).restore(state)
            return {"classes": AFFINITY_CLASSES, "params": state.params,
                    "predict": make_affinity_predict(model.apply)}
        raise ValueError(task)

    # -- task scorers ----------------------------------------------------
    def score_mentions(self, task: str, payload: dict) -> dict:
        t = self.tasks[task]
        mentions = payload["mentions"]
        L = _LEN_SPEC.bucket_of(max((len(m["tokens"]) for m in mentions),
                                    default=1))
        n = len(mentions)
        np_ = _CNT_SPEC.bucket_of(max(n, 1))
        tok = np.zeros((np_, L), np.int32)
        ln = np.zeros(np_, np.int32)
        for r, m in enumerate(mentions):
            tok[r], ln[r] = self.emb.encode_tokens(m["tokens"], L)
        probs = np.asarray(t["predict"](t["params"], self.table,
                                        jnp.asarray(tok), jnp.asarray(ln)))
        return {
            "class_order": list(t["classes"]),
            "scores": [{"id": m.get("id", str(r)),
                        "probs": [round(float(p), 6) for p in probs[r]]}
                       for r, m in enumerate(mentions)],
        }

    def score_relation(self, payload: dict) -> dict:
        t = self.tasks["relation"]
        out = []
        for img in payload["images"]:
            captions = img["captions"]
            ments = img["mentions"]
            pairs = img.get("pairs") or [
                [i, j] for i in range(len(ments))
                for j in range(i + 1, len(ments))]
            C = max(len(captions), 1)
            L = _LEN_SPEC.bucket_of(max((len(c) for c in captions), default=1))
            M = _CNT_SPEC.bucket_of(max(len(ments), 1))
            P = max(M * (M - 1) // 2, 1)
            batch = _empty_relation_batch(1, C, L, M, P)
            tok = np.zeros((1, C, L), np.int32)
            tl = np.zeros((1, C), np.int32)
            for c, toks in enumerate(captions):
                tok[0, c], tl[0, c] = self.emb.encode_tokens(toks, L)
            batch["tokens"], batch["tok_len"] = jnp.asarray(tok), jnp.asarray(tl)
            mc = np.zeros((1, M), np.int32)
            mf = np.zeros((1, M), np.int32)
            ml = np.zeros((1, M), np.int32)
            mv = np.zeros((1, M), bool)
            for r, m in enumerate(ments):
                cap = int(m["caption"])
                if not 0 <= cap < len(captions):
                    raise ValueError(f"mention caption {cap} out of range "
                                     f"for {len(captions)} captions")
                if int(m["first"]) < 0 or int(m["last"]) < int(m["first"]):
                    raise ValueError(f"bad mention span "
                                     f"[{m['first']}, {m['last']}]")
                cap_len = max(int(tl[0, cap]), 1)
                mc[0, r] = cap
                mf[0, r] = min(int(m["first"]), cap_len - 1)
                ml[0, r] = min(int(m["last"]), cap_len - 1)
                mv[0, r] = True
            pij = np.zeros((1, P, 2), np.int32)
            pv = np.zeros((1, P), bool)
            for k, (i, j) in enumerate(pairs):
                if not (0 <= i < len(ments) and 0 <= j < len(ments)):
                    raise ValueError(
                        f"pair [{i}, {j}] out of range for "
                        f"{len(ments)} mentions")
                pij[0, k] = (i, j)
                pv[0, k] = True
            batch.update(m_cap=jnp.asarray(mc), m_first=jnp.asarray(mf),
                         m_last=jnp.asarray(ml), m_valid=jnp.asarray(mv),
                         pair_ij=jnp.asarray(pij), pair_valid=jnp.asarray(pv),
                         img_valid=jnp.ones((1,), bool))
            probs = np.asarray(t["predict"](t["params"], self.table, batch))
            out.append({
                "id": img.get("id", ""),
                "pairs": [{"pair": [int(i), int(j)],
                           "probs": [round(float(p), 6)
                                     for p in probs[0, k]]}
                          for k, (i, j) in enumerate(pairs)],
            })
        return {"class_order": list(t["classes"]), "images": out}

    def score_affinity(self, payload: dict) -> dict:
        t = self.tasks["affinity"]
        out = []
        for img in payload["images"]:
            phrases = img["phrases"]
            boxes = np.asarray(img["boxes"], np.float32)
            M = _CNT_SPEC.bucket_of(max(len(phrases), 1))
            B = _CNT_SPEC.bucket_of(max(boxes.shape[0], 1))
            L = _LEN_SPEC.bucket_of(max((len(p) for p in phrases), default=1))
            D = boxes.shape[1]
            pt = np.zeros((1, M, L), np.int32)
            pl = np.zeros((1, M), np.int32)
            for r, toks in enumerate(phrases):
                pt[0, r], pl[0, r] = self.emb.encode_tokens(toks, L)
            bf = np.zeros((1, B, D), np.float32)
            bf[0, :boxes.shape[0]] = boxes
            batch = {
                "phrase_tokens": jnp.asarray(pt), "phrase_len": jnp.asarray(pl),
                "box_feats": jnp.asarray(bf),
                "box_valid": jnp.asarray(
                    np.arange(B)[None] < boxes.shape[0]),
                "grid_label": jnp.zeros((1, M, B), jnp.int32),
                "grid_valid": jnp.ones((1, M, B), bool),
                "img_valid": jnp.ones((1,), bool),
            }
            probs = np.asarray(t["predict"](t["params"], self.table, batch))
            out.append({
                "id": img.get("id", ""),
                "grid": [[[round(float(x), 6) for x in probs[0, r, c]]
                          for c in range(boxes.shape[0])]
                         for r in range(len(phrases))],
            })
        return {"class_order": list(t["classes"]), "images": out}


def _empty_relation_batch(I, C, L, M, P=None):
    P = P or max(M * (M - 1) // 2, 1)
    return {
        "tokens": jnp.zeros((I, C, L), jnp.int32),
        "tok_len": jnp.ones((I, C), jnp.int32),
        "m_cap": jnp.zeros((I, M), jnp.int32),
        "m_first": jnp.zeros((I, M), jnp.int32),
        "m_last": jnp.zeros((I, M), jnp.int32),
        "m_valid": jnp.zeros((I, M), bool),
        "pair_ij": jnp.zeros((I, P, 2), jnp.int32),
        "pair_label": jnp.zeros((I, P), jnp.int32),
        "pair_valid": jnp.zeros((I, P), bool),
        "img_valid": jnp.zeros((I,), bool),
    }


def _empty_affinity_batch(I, L, M, B, D):
    return {
        "phrase_tokens": jnp.zeros((I, M, L), jnp.int32),
        "phrase_len": jnp.ones((I, M), jnp.int32),
        "box_feats": jnp.zeros((I, B, D), jnp.float32),
        "box_valid": jnp.zeros((I, B), bool),
        "grid_label": jnp.zeros((I, M, B), jnp.int32),
        "grid_valid": jnp.zeros((I, M, B), bool),
        "img_valid": jnp.zeros((I,), bool),
    }


class _Handler(BaseHTTPRequestHandler):
    scorer: Scorer = None  # set by serve()

    def log_message(self, fmt, *args):  # route through LogUtil
        LOG.debug("serve: " + fmt, *args)

    def _reply(self, code: int, obj: dict) -> None:
        body = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        if self.path == "/healthz":
            self._reply(200, {"status": "ok",
                              "tasks": sorted(self.scorer.tasks)})
        else:
            self._reply(404, {"error": f"unknown path {self.path}"})

    def do_POST(self):
        try:
            n = int(self.headers.get("Content-Length", 0))
            payload = json.loads(self.rfile.read(n) or b"{}")
        except json.JSONDecodeError as e:
            self._reply(400, {"error": f"bad json: {e}"})
            return
        task = self.path.rsplit("/", 1)[-1]
        if not self.path.startswith("/score/") or task not in self.scorer.tasks:
            self._reply(404, {"error": f"unknown or unloaded task {task!r}",
                              "tasks": sorted(self.scorer.tasks)})
            return
        try:
            if task in ("nonvisual", "cardinality"):
                out = self.scorer.score_mentions(task, payload)
            elif task == "relation":
                out = self.scorer.score_relation(payload)
            else:
                out = self.scorer.score_affinity(payload)
            self._reply(200, out)
        except (KeyError, IndexError, ValueError, TypeError) as e:
            self._reply(400, {"error": f"{type(e).__name__}: {e}"})


def serve(data_dir: str, port: int, embeddings_file: str | None = None,
          tasks: list[str] | None = None) -> ThreadingHTTPServer:
    """Build the server (caller decides serve_forever vs background)."""
    import jax

    # scoring service is parity-grade: true-f32 matmuls (see
    # icl.cli._common.apply_precision for the TPU rationale)
    jax.config.update("jax_default_matmul_precision", "high")
    scorer = Scorer(data_dir, embeddings_file, tasks)
    handler = type("Handler", (_Handler,), {"scorer": scorer})
    httpd = ThreadingHTTPServer(("127.0.0.1", port), handler)
    LOG.info("serve: listening on 127.0.0.1:%d (tasks: %s)", httpd.server_port,
             ", ".join(sorted(scorer.tasks)))
    return httpd


def main(argv=None) -> None:
    p = argparse.ArgumentParser(
        prog="icl-serve",
        description="HTTP scoring service over trained icl checkpoints")
    p.add_argument("--data_dir", required=True,
                   help="directory with <task>.model checkpoints + embeddings")
    p.add_argument("--embeddings_file", default=None)
    p.add_argument("--port", type=int, default=8414)
    p.add_argument("--tasks", default=None,
                   help="comma-separated subset (default: all trained)")
    args = p.parse_args(argv)
    httpd = serve(args.data_dir, args.port, args.embeddings_file,
                  args.tasks.split(",") if args.tasks else None)
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        httpd.shutdown()


if __name__ == "__main__":
    main()
