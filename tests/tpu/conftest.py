"""TPU-only tests: opt-in via ICL_TPU_TESTS=1 (SURVEY §7.4).

This conftest intentionally does NOT force the CPU platform — it must run
before tests/conftest.py's override would... it cannot: tests/conftest.py
runs first for the whole suite.  TPU tests therefore run in a SEPARATE
pytest invocation: ``ICL_TPU_TESTS=1 pytest tests/tpu -p no:cacheprovider``
with the default axon platform env, and skip themselves when the platform
is not TPU.
"""

import os

import pytest


def pytest_collection_modifyitems(config, items):
    # NOTE: this hook is global once the conftest loads — restrict to items
    # under tests/tpu or it would skip the whole suite.
    if os.environ.get("ICL_TPU_TESTS") != "1":
        skip = pytest.mark.skip(reason="TPU tests opt-in: set ICL_TPU_TESTS=1")
        here = os.path.dirname(os.path.abspath(__file__))
        for item in items:
            if str(item.fspath).startswith(here):
                item.add_marker(skip)
