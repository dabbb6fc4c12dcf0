"""Param-only Dense declaration shared by XLA and fused-kernel paths.

Declares ``kernel``/``bias`` with nn.Dense's exact tree layout and default
initializers, but returns the raw arrays so callers can either apply them as
``x @ kernel + bias`` (XLA path) or hand them to a Pallas kernel (fused
path) — one parameter set, two execution strategies.
"""

from __future__ import annotations

import flax.linen as nn


class DenseParams(nn.Module):
    in_features: int
    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (self.in_features, self.features))
        bias = (self.param("bias", nn.initializers.zeros, (self.features,))
                if self.use_bias else None)
        return kernel, bias
