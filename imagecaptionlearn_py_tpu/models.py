"""Model family re-exports (implementation: icl.models)."""

from icl.models import (AFFINITY_CLASSES, CARDINALITY_CLASSES, NONVIS_CLASSES,
                        AffinityModel, CardinalityModel, NonvisualModel,
                        RelationModel)
from icl.data.pairs import RELATION_CLASSES
from icl.models.rnn import LSTM, BiLSTM

__all__ = ["AffinityModel", "CardinalityModel", "NonvisualModel",
           "RelationModel", "LSTM", "BiLSTM", "AFFINITY_CLASSES",
           "CARDINALITY_CLASSES", "NONVIS_CLASSES", "RELATION_CLASSES"]
