from icl.eval.scoredict import ScoreDict

__all__ = ["ScoreDict"]
