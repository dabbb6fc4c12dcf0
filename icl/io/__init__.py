"""icl.io — file-format layer (the Java-facing compatibility surface).

Implements the frozen contracts of SURVEY.md §6.1–§6.2 for the `.feats`
(LibSVM-style sparse features, trailing ``# id`` comment) and `.scores`
(comma-separated per-class probabilities) formats, plus caption-token and
VGG-fc7 box-feature loaders.  These formats are how the reference's Python
half exchanged data with the Java ILP solver (BASELINE.json north_star), and
they are preserved byte-compatibly here.
"""

from icl.io.feats import FeatsExample, read_feats, write_feats, parse_sparse_line
from icl.io.scores import (read_scores, write_scores,
                           write_scores_sharded)
from icl.io.captions import Caption, Mention, read_captions, read_mentions
from icl.io.boxes import read_box_feats, write_box_feats

__all__ = [
    "FeatsExample", "read_feats", "write_feats", "parse_sparse_line",
    "read_scores", "write_scores", "write_scores_sharded",
    "Caption", "Mention", "read_captions", "read_mentions",
    "read_box_feats", "write_box_feats",
]
