from icl.ops.grid_head import fused_grid_head, grid_head_reference, grid_head_pallas

__all__ = ["fused_grid_head", "grid_head_reference", "grid_head_pallas"]
