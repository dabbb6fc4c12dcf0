from icl.ops.grid_head import fused_grid_head, grid_head_reference, grid_head_pallas
from icl.ops.affinity_rank import (affinity_rank_pallas,
                                   affinity_rank_reference, rank_boxes_fused)

__all__ = ["fused_grid_head", "grid_head_reference", "grid_head_pallas",
           "affinity_rank_pallas", "affinity_rank_reference",
           "rank_boxes_fused"]
