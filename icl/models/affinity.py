"""Phrase↔box affinity scorer (component C8).

Reference parity: SURVEY.md §6.5 / BASELINE.json config[2] — per
(mention, box): ``x = [LSTM-200 phrase emb ; VGG fc7 4096] → Dense(1024,
relu) → Dropout(0.5) → Dense(2) → softmax``, class order
``[no_affinity=0, affinity=1]``; plus a per-image softmax over candidate
boxes for ranking at inference.

TPU-native design (SURVEY §4.3): the reference concatenated [phrase;fc7] per
pair in a Python loop over O(M·B) pairs.  Concatenation into a dense layer
distributes over the weight: with ``W = [W_p; W_b]``,

    concat(p, b) @ W  ==  p @ W_p + b @ W_b

so the grid activations are two small GEMMs — phrases [I·M,200]@[200,1024]
and boxes [I·B,4096]@[4096,1024] (each row touched **once**, not B or M
times) — plus a broadcast add over the [I,M,B,1024] grid.  That grid fusion
(add+relu+head GEMM+masked per-image softmax) is Pallas kernel K2's target
(icl.ops.affinity_kernel); this XLA formulation is its correctness oracle.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from icl.models.rnn import LSTM

AFFINITY_CLASSES = ("no_affinity", "affinity")


class AffinityModel(nn.Module):
    """Image-grid affinity model; returns logits [I, M, B, 2].

    phrase_enc: "lstm" (reference default) or "mean_w2v" (reference option
    ``--phrase_enc mean_w2v``, SURVEY §6.5).
    """

    lstm_hidden: int = 200
    head_hidden: int = 1024
    dropout: float = 0.5
    num_classes: int = 2
    phrase_enc: str = "lstm"
    compute_dtype: jnp.dtype = jnp.float32
    fused: bool = False

    @nn.compact
    def __call__(self, emb_table: jnp.ndarray, batch: dict,
                 deterministic: bool = True, loss_grid: tuple | None = None):
        toks = batch["phrase_tokens"]       # [I, M, L]
        plen = batch["phrase_len"]          # [I, M]
        boxes = batch["box_feats"]          # [I, B, D]
        I, M, L = toks.shape
        x = jnp.take(emb_table, toks.reshape(I * M, L), axis=0)
        if self.phrase_enc == "lstm":
            _, ph = LSTM(self.lstm_hidden, compute_dtype=self.compute_dtype,
                         name="phrase_lstm")(x, plen.reshape(I * M))
        elif self.phrase_enc == "mean_w2v":
            mask = (jnp.arange(L) < plen.reshape(I * M)[:, None]).astype(x.dtype)
            ph = jnp.einsum("bld,bl->bd", x, mask) / jnp.maximum(
                plen.reshape(I * M, 1).astype(x.dtype), 1.0)
        else:
            raise ValueError(f"unknown phrase_enc {self.phrase_enc!r}")
        phrase = ph.reshape(I, M, -1)

        # split Dense(head_hidden) over the concat: one GEMM per side
        from icl.models._dense import DenseParams
        from icl.ops.grid_head import fused_grid_head

        Dp, Db = phrase.shape[-1], boxes.shape[-1]
        Wp, bp = DenseParams(Dp, self.head_hidden,
                             name="head_dense_phrase")()
        Wb, _ = DenseParams(Db, self.head_hidden, use_bias=False,
                            name="head_dense_box")()
        W2, b2 = DenseParams(self.head_hidden, self.num_classes,
                             name="head_out")()
        p_proj = phrase @ Wp                                      # [I,M,K]
        b_proj = boxes @ Wb                                       # [I,B,K]

        import jax

        if self.fused:
            # K2: grid add+relu+head GEMM in VMEM — the [I,M,B,K] activation
            # never reaches HBM; in training the custom-VJP kernel applies
            # dropout via the in-kernel Mosaic PRNG (per-image seeds → DP
            # reproduces single-device masks) and recomputes on backward
            if deterministic:
                # bf16 throughput mode: one-pass bf16 kernel dot (f32 mode
                # keeps the pinned-'highest' parity-grade dot)
                grid = fused_grid_head(
                    p_proj, b_proj, bp, W2, b2,
                    fast_dot=self.compute_dtype == jnp.bfloat16)
                if loss_grid is not None:
                    from icl.ops.grid_head_train import grid_ce_sums
                    labels, weights = loss_grid
                    return grid_ce_sums(grid, labels,
                                        jax.lax.stop_gradient(weights))
                return grid
            from icl.ops.grid_head_train import (grid_head_train,
                                                 grid_head_train_loss)
            seeds = jax.random.randint(
                self.make_rng("dropout"), (I,), 0,
                jnp.iinfo(jnp.int32).max, dtype=jnp.int32)
            exact = jax.config.jax_default_matmul_precision == "highest"
            if loss_grid is not None:
                # training-loss mode: CE fused into the kernel (scalars out)
                labels, weights = loss_grid
                return grid_head_train_loss(
                    p_proj, b_proj, bp, W2, b2, seeds, labels,
                    jax.lax.stop_gradient(weights), float(self.dropout),
                    exact)
            return grid_head_train(p_proj, b_proj, bp, W2, b2, seeds,
                                   float(self.dropout), exact)   # [I,M,B,O]

        h = nn.relu(p_proj[:, :, None, :] + b_proj[:, None, :, :] + bp)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        logits = h @ W2 + b2                                      # [I,M,B,2]
        if loss_grid is not None:
            from icl.ops.grid_head_train import grid_ce_sums
            labels, weights = loss_grid
            return grid_ce_sums(logits, labels,
                                jax.lax.stop_gradient(weights))
        return logits


def rank_boxes(logits: jnp.ndarray, box_valid: jnp.ndarray,
               affinity_col: int = 1) -> jnp.ndarray:
    """Per-image ranking distribution over candidate boxes (SURVEY §6.5).

    softmax over the box axis of the affinity-class logit, masked to valid
    boxes: [I,M,B,2] logits + [I,B] validity → [I,M,B] probabilities.
    This is the ONE source of the masking convention — the fused-kernel
    oracle (icl.ops.affinity_rank.affinity_rank_reference) composes it.
    """
    aff = logits[..., affinity_col]                       # [I,M,B]
    neg = jnp.finfo(aff.dtype).min
    masked = jnp.where(box_valid[:, None, :], aff, neg)
    probs = nn.softmax(masked, axis=-1)
    # rows with zero valid boxes (padded image slots) → all-zeros, not NaN
    any_valid = box_valid.any(axis=-1)[:, None, None]
    return jnp.where(any_valid, probs * box_valid[:, None, :], 0.0)
