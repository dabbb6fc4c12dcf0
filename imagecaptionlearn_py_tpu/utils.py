"""Utility re-exports (implementation: icl.util / icl.io / icl.eval)."""

from icl.eval import ScoreDict
from icl.io import (read_box_feats, read_captions, read_feats, read_mentions,
                    read_scores, write_feats, write_scores)
from icl.util import LogUtil

__all__ = ["ScoreDict", "LogUtil", "read_feats", "write_feats",
           "read_scores", "write_scores", "read_captions", "read_mentions",
           "read_box_feats"]
