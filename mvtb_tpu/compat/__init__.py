"""Reference import-path shims.

Add this directory to ``sys.path`` (or call :func:`install`) and reference
experiment scripts' local imports — ``filters_and_operators``,
``stylization_layers``, ``utils`` — resolve against this framework.
"""

import os
import sys


def install() -> None:
    """Make the reference's bare module names importable."""
    here = os.path.dirname(__file__)
    if here not in sys.path:
        sys.path.insert(0, here)
