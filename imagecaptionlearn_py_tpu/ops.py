"""Kernel/op re-exports (implementation: icl.ops)."""

from icl.ops import fused_grid_head, grid_head_pallas, grid_head_reference

__all__ = ["fused_grid_head", "grid_head_pallas", "grid_head_reference"]
