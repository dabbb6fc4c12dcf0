"""icl-nonvisual — visual/nonvisual mention detector CLI (SURVEY §4.4, §6.6).

Reference parity: mirrors the reference's ``icl_nonvisual.py`` entry point
(BASELINE.json: CLI surface preserved).  Minimum end-to-end slice §9.2.
"""

from __future__ import annotations

from icl.cli._common import base_parser, parse_task_args
from icl.cli._mention_task import run
from icl.models.nonvisual import NONVIS_CLASSES, NonvisualModel


def main(argv=None) -> None:
    p = base_parser(
        "nonvisual",
        "Binary visual/nonvisual mention classifier over mean-pooled "
        "word2vec mention embeddings (FFNN).")
    run(parse_task_args(p, argv, "nonvisual"),
        "nonvisual", NonvisualModel, NONVIS_CLASSES)


if __name__ == "__main__":
    main()
