"""Image-centric padded batching for the relation and affinity tasks.

Reference parity: replaces the reference's per-image / per-pair Python loops
(SURVEY §4.1–4.3) with fixed-shape batches over *images*.  Each batch dim is
quantized to a bucket inventory (SURVEY §9.3 item 2) so the number of XLA
compilations is bounded by |L-buckets| × |M-buckets| (× |B-buckets|):

relation batch arrays (I images per batch)::

    tokens     int32[I, C, L]    caption token ids (PAD=0)
    tok_len    int32[I, C]       true caption lengths (0 ⇒ caption absent)
    m_cap      int32[I, M]       caption row of each mention
    m_first    int32[I, M]       mention span start (token idx)
    m_last     int32[I, M]       mention span end (inclusive)
    m_valid    bool [I, M]
    pair_ij    int32[I, P, 2]    mention-row index pairs
    pair_label int32[I, P]
    pair_valid bool [I, P]
    grid_label int32[I, M, M]    pair labels in grid form (train grid-loss)
    grid_valid bool [I, M, M]
    img_valid  bool [I]

affinity batch arrays::

    phrase_tokens int32[I, M, L]   phrase_len int32[I, M]
    box_feats     f32  [I, B, D]   grid_label int32[I, M, B]
    grid_valid    bool [I, M, B]   img_valid  bool[I]

Padded slots index row 0 and are masked everywhere downstream.
"""

from __future__ import annotations

import dataclasses
from typing import Iterator

import numpy as np

from icl.data.buckets import BucketSpec
from icl.data.pipeline import AffinityDataset, AffinityImage, RelationDataset, RelationImage


@dataclasses.dataclass
class ImageBatch:
    arrays: dict[str, np.ndarray]
    # (image_slot, item_slot, example_id) for every real example in the batch
    id_index: list[tuple[int, int, str]]
    shape_key: tuple


class RelationBatcher:
    """Buckets relation images by (L, M) and pads to fixed shapes."""

    def __init__(self, images_per_batch: int = 8,
                 len_spec: BucketSpec = BucketSpec((16, 32, 48)),
                 mention_spec: BucketSpec = BucketSpec((8, 16, 32)),
                 captions_per_image: int = 5,
                 build_grid: bool = True):
        self.ipb = images_per_batch
        self.len_spec = len_spec
        self.mention_spec = mention_spec
        self.C = captions_per_image
        # grid_label/grid_valid feed only the grid-loss TRAIN step; the
        # relation CLI turns this off for predict (dead [I,M,M] arrays)
        self.build_grid = build_grid

    def shape_of(self, im: RelationImage) -> tuple[int, int, int, int]:
        L = self.len_spec.bucket_of(im.tokens.shape[1])
        M = self.mention_spec.bucket_of(len(im.m_cap))
        P = M * (M - 1) // 2
        # caption count joins the key so >C-caption images (MSCOCO has 5–7)
        # are padded up, never silently truncated/mis-gathered
        C = max(self.C, im.tokens.shape[0])
        return L, M, P, C

    def batches(self, ds: RelationDataset,
                rng: np.random.Generator | None = None,
                skip: int = 0,
                host_rows: tuple[int, int] | None = None) -> Iterator[ImageBatch]:
        """Yield padded batches; ``skip`` drops the first N batches of the
        (rng-deterministic) schedule WITHOUT building them — resume never
        redoes the host-side padding work for already-trained batches.

        ``host_rows=(lo, hi)``: multi-host input sharding — build only the
        batch rows this process's devices hold (icl.dist.mesh.local_data_rows)
        and feed them via shard_batch_local; the schedule itself stays
        global and rng-deterministic, so every host agrees on it."""
        by_shape: dict[tuple, list[RelationImage]] = {}
        for im in ds.images:
            by_shape.setdefault(self.shape_of(im), []).append(im)
        schedule: list[tuple[tuple, list[RelationImage]]] = []
        for key in sorted(by_shape):
            group = by_shape[key]
            if rng is not None:
                rng.shuffle(group)
            for s in range(0, len(group), self.ipb):
                schedule.append((key, group[s:s + self.ipb]))
        if rng is not None:
            rng.shuffle(schedule)
        for key, group in schedule[skip:]:
            yield self._pad(key, group, host_rows)

    def _pad(self, key: tuple, group: list[RelationImage],
             host_rows: tuple[int, int] | None = None) -> ImageBatch:
        L, M, P, C = key
        lo, hi = host_rows if host_rows is not None else (0, self.ipb)
        group = group[lo:hi]
        I = hi - lo
        a = {
            "tokens": np.zeros((I, C, L), np.int32),
            "tok_len": np.zeros((I, C), np.int32),
            "m_cap": np.zeros((I, M), np.int32),
            "m_first": np.zeros((I, M), np.int32),
            "m_last": np.zeros((I, M), np.int32),
            "m_valid": np.zeros((I, M), bool),
            "pair_ij": np.zeros((I, P, 2), np.int32),
            "pair_label": np.zeros((I, P), np.int32),
            "pair_valid": np.zeros((I, P), bool),
            "img_valid": np.zeros((I,), bool),
        }
        if self.build_grid:
            # pair labels in M×M grid form, built here (free on the host)
            # so the grid-loss train step needs no device scatter; cells
            # not covered by a valid pair stay (label 0, valid False).
            # Predict/eval batches skip these dead arrays entirely.
            a["grid_label"] = np.zeros((I, M, M), np.int32)
            a["grid_valid"] = np.zeros((I, M, M), bool)
        id_index: list[tuple[int, int, str]] = []
        for s, im in enumerate(group):
            c, l = im.tokens.shape
            c, l = min(c, C), min(l, L)
            a["tokens"][s, :c, :l] = im.tokens[:c, :l]
            a["tok_len"][s, :c] = np.minimum(im.tok_len[:c], l)
            m = min(len(im.m_cap), M)
            a["m_cap"][s, :m] = im.m_cap[:m]
            a["m_first"][s, :m] = np.minimum(im.m_first[:m], l - 1)
            a["m_last"][s, :m] = np.minimum(im.m_last[:m], l - 1)
            a["m_valid"][s, :m] = True
            p = min(len(im.pair_label), P)
            a["pair_ij"][s, :p] = im.pair_ij[:p]
            a["pair_label"][s, :p] = im.pair_label[:p]
            a["pair_valid"][s, :p] = True
            if self.build_grid:
                # bucket_of never truncates (M >= the image's mention
                # count), so every pair index is in range
                ij = np.asarray(im.pair_ij[:p], np.int32)
                a["grid_label"][s, ij[:, 0], ij[:, 1]] = im.pair_label[:p]
                a["grid_valid"][s, ij[:, 0], ij[:, 1]] = True
            a["img_valid"][s] = True
            id_index.extend((s, k, pid) for k, pid in enumerate(im.pair_ids[:p]))
        return ImageBatch(arrays=a, id_index=id_index, shape_key=key)


class AffinityBatcher:
    """Buckets affinity images by (M, B) and pads to fixed grid shapes."""

    def __init__(self, images_per_batch: int = 8,
                 mention_spec: BucketSpec = BucketSpec((8, 16, 32)),
                 box_spec: BucketSpec = BucketSpec((8, 16, 32)),
                 phrase_len: int = 16,
                 box_dtype=np.float32):
        self.ipb = images_per_batch
        self.mention_spec = mention_spec
        self.box_spec = box_spec
        self.L = phrase_len
        # bf16 training ships fc7 features to the device half-width: the
        # [I,B,4096] box block is the largest host->device stream of the
        # whole framework (ml_dtypes.bfloat16 here; numpy converts on
        # assignment, jnp.asarray transfers the 2-byte rows unchanged)
        self.box_dtype = box_dtype

    def shape_of(self, im: AffinityImage) -> tuple[int, int]:
        M = self.mention_spec.bucket_of(im.phrase_tokens.shape[0])
        B = self.box_spec.bucket_of(im.box_feats.shape[0])
        return M, B

    def batches(self, ds: AffinityDataset,
                rng: np.random.Generator | None = None,
                skip: int = 0,
                host_rows: tuple[int, int] | None = None) -> Iterator[ImageBatch]:
        """Like RelationBatcher.batches: ``skip`` drops already-trained
        batches without building them (and, with lazy mmap box views,
        without touching their feature bytes at all); ``host_rows`` builds
        only this process's slice (see RelationBatcher)."""
        by_shape: dict[tuple, list[AffinityImage]] = {}
        for im in ds.images:
            by_shape.setdefault(self.shape_of(im), []).append(im)
        schedule: list[tuple[tuple, list[AffinityImage]]] = []
        for key in sorted(by_shape):
            group = by_shape[key]
            if rng is not None:
                rng.shuffle(group)
            for s in range(0, len(group), self.ipb):
                schedule.append((key, group[s:s + self.ipb]))
        if rng is not None:
            rng.shuffle(schedule)
        D = ds.box_dim
        for key, group in schedule[skip:]:
            yield self._pad(key, group, D, host_rows)

    def _pad(self, key: tuple, group: list[AffinityImage], D: int,
             host_rows: tuple[int, int] | None = None) -> ImageBatch:
        M, B = key
        lo, hi = host_rows if host_rows is not None else (0, self.ipb)
        group = group[lo:hi]
        I, L = hi - lo, self.L
        a = {
            "phrase_tokens": np.zeros((I, M, L), np.int32),
            "phrase_len": np.zeros((I, M), np.int32),
            "box_feats": np.zeros((I, B, D), self.box_dtype),
            "box_valid": np.zeros((I, B), bool),
            "grid_label": np.zeros((I, M, B), np.int32),
            "grid_valid": np.zeros((I, M, B), bool),
            "img_valid": np.zeros((I,), bool),
        }
        id_index: list[tuple[int, int, str]] = []
        from icl.data.pipeline import make_affinity_id
        from icl.io.captions import parse_mention_id
        for s, im in enumerate(group):
            m = min(im.phrase_tokens.shape[0], M)
            b = min(im.box_feats.shape[0], B)
            a["phrase_tokens"][s, :m] = im.phrase_tokens[:m, :L]
            a["phrase_len"][s, :m] = np.minimum(im.phrase_len[:m], L)
            a["box_feats"][s, :b] = im.box_feats[:b]
            a["box_valid"][s, :b] = True
            a["grid_label"][s, :m, :b] = im.grid_label[:m, :b]
            a["grid_valid"][s, :m, :b] = im.grid_valid[:m, :b]
            a["img_valid"][s] = True
            for r in range(m):
                img, ci, mi = parse_mention_id(im.mention_ids[r])
                for c in range(b):
                    if im.grid_valid[r, c]:
                        id_index.append((s, r * B + c,
                                         make_affinity_id(img, ci, mi, im.box_idx[c])))
        return ImageBatch(arrays=a, id_index=id_index, shape_key=key)
