from icl.models.nonvisual import NonvisualModel, NONVIS_CLASSES
from icl.models.relation import RelationModel
from icl.models.affinity import AffinityModel, AFFINITY_CLASSES
from icl.models.cardinality import CardinalityModel, CARDINALITY_CLASSES

__all__ = [
    "NonvisualModel", "NONVIS_CLASSES",
    "RelationModel",
    "AffinityModel", "AFFINITY_CLASSES",
    "CardinalityModel", "CARDINALITY_CLASSES",
]
