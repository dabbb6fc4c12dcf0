"""Nonvisual-mention detector (component C6) — FFNN over mean-pooled w2v.

Reference parity: SURVEY.md §6.3 / BASELINE.json config[0] — binary
visual/nonvisual classifier: ``mean_w2v(mention tokens) ∈ R^300 →
Dense(300, relu) → Dropout(0.5) → Dense(2) → softmax``; class order
``[visual=0, nonvisual=1]``; Adam 1e-3, batch 512, CE loss.

TPU-native notes: the mean-pool happens on device from padded token ids
(``jnp.take`` gather + masked mean — the embedding table is an input, not a
baked-in constant, so XLA keeps one HBM copy), and train/predict run over
fixed-shape batches under jit.  The reference looped ``model.predict`` per
example (SURVEY §4.4).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

NONVIS_CLASSES = ("visual", "nonvisual")


def mean_pool_tokens(emb_table: jnp.ndarray, token_ids: jnp.ndarray,
                     lengths: jnp.ndarray) -> jnp.ndarray:
    """[B, L] padded ids → [B, D] masked mean (PAD/OOV row 0 is zeros).

    DECISION (SURVEY §6.3): OOV tokens contribute zero vectors but still
    count in the denominator; the denominator is the true token count.

    PERF (BENCHMARKS.md ledger [r4], traced on v5e): this is the whole
    mention-task step cost, and it is bound by the gather's ROW RATE
    (~3.1 ns/row, dtype-invariant), not bytes.  Do not retry: a
    multiply+sum form of the einsum is bitwise-identical and equally
    fast (XLA lowers a 65k-row gather as its own DMA fusion either way),
    and one-hot MXU / VMEM-resident-table kernels lose by arithmetic
    (negative result #6).
    """
    vecs = jnp.take(emb_table, token_ids, axis=0)        # [B, L, D]
    mask = (jnp.arange(token_ids.shape[1]) < lengths[:, None]).astype(vecs.dtype)
    summed = jnp.einsum("bld,bl->bd", vecs, mask)
    return summed / jnp.maximum(lengths[:, None].astype(vecs.dtype), 1.0)


class NonvisualModel(nn.Module):
    """Dense(hidden, relu) → Dropout → Dense(2); logits out (softmax at use)."""

    hidden: int = 300
    dropout: float = 0.5
    num_classes: int = 2

    @nn.compact
    def __call__(self, pooled: jnp.ndarray, deterministic: bool = True):
        h = nn.Dense(self.hidden, name="dense_1")(pooled)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        return nn.Dense(self.num_classes, name="dense_out")(h)

    def probs_from_tokens(self, emb_table, token_ids, lengths):
        pooled = mean_pool_tokens(emb_table, token_ids, lengths)
        return nn.softmax(self(pooled, deterministic=True), axis=-1)
