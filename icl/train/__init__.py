from icl.train.state import TrainState, create_train_state
from icl.train.steps import (make_mention_train_step, make_relation_train_step,
                             make_affinity_train_step, masked_weighted_ce)

__all__ = [
    "TrainState", "create_train_state",
    "make_mention_train_step", "make_relation_train_step",
    "make_affinity_train_step", "masked_weighted_ce",
]
