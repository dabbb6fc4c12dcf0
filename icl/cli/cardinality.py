"""icl-cardinality — box-count bin predictor CLI (component C9, stretch)."""

from __future__ import annotations

from icl.cli._common import base_parser, parse_task_args
from icl.cli._mention_task import run
from icl.models.cardinality import CARDINALITY_CLASSES, CardinalityModel


def main(argv=None) -> None:
    p = base_parser(
        "cardinality",
        "Softmax over box-count bins {0..10,11+} per mention "
        "(ILP constraint signal).")
    run(parse_task_args(p, argv, "cardinality"),
        "cardinality", CardinalityModel, CARDINALITY_CLASSES)


if __name__ == "__main__":
    main()
