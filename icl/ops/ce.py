"""One-hot max-shift cross-entropy — THE shared per-cell CE definition.

Both the pair-form loss (icl.train.steps.masked_weighted_ce) and the grid
losses (icl.ops.grid_head_train.grid_ce_sums, and the in-kernel CE which
mirrors this math in VMEM) import this single helper, so the documented
loss-parity contract between pair and grid training paths cannot drift
across hand-synchronized copies.

TPU note: formulated through a one-hot product rather than
``take_along_axis`` — label gathers lower to TPU gather ops that cost more
than the whole CE (measured 0.16 ms/step on the relation train trace);
``one_hot`` over a 2–12 class axis fuses to an iota-compare.  Math is
identical to ``optax.softmax_cross_entropy_with_integer_labels`` (same
max-shift stabilization); out-of-range labels at padded positions produce
a zero one-hot row and are masked by the caller's validity weights.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def onehot_ce(logits: jnp.ndarray, labels: jnp.ndarray):
    """Per-cell CE over the minor class axis; returns ``(ce, onehot)``."""
    lmax = jax.lax.stop_gradient(jnp.max(logits, axis=-1, keepdims=True))
    sh = logits - lmax
    logz = jnp.log(jnp.sum(jnp.exp(sh), axis=-1))
    onehot = jax.nn.one_hot(labels, logits.shape[-1], dtype=logits.dtype)
    return logz - jnp.sum(sh * onehot, axis=-1), onehot
