"""imagecaptionlearn_py_tpu — alias namespace for the icl framework.

The implementation package is ``icl`` (layout bound by SURVEY.md §2.2/§3.1
build-target paths); this package re-exports it under the conventional
``models / ops / parallel / utils`` structure.
"""

from icl import __version__
from imagecaptionlearn_py_tpu import models, ops, parallel, utils

__all__ = ["models", "ops", "parallel", "utils", "__version__"]
