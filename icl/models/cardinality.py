"""Box-cardinality predictor (component C9, optional stretch per SURVEY §1).

Reference parity: SURVEY §3.1 C9 [U-med] — softmax over box-count bins
{0,1,…,10,11+} per mention, used by the downstream ILP as a constraint
signal.  Architecture mirrors the nonvisual FFNN (mean-w2v input) with a
12-way head (DECISION — reference checkout empty, SURVEY §0).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

CARDINALITY_CLASSES = tuple(str(i) for i in range(11)) + ("11+",)


class CardinalityModel(nn.Module):
    hidden: int = 300
    dropout: float = 0.5
    num_classes: int = 12

    @nn.compact
    def __call__(self, pooled: jnp.ndarray, deterministic: bool = True):
        h = nn.Dense(self.hidden, name="dense_1")(pooled)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        return nn.Dense(self.num_classes, name="dense_out")(h)
