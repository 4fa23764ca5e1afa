"""Shared sys.path bootstrap for the ``scripts/`` directory.

Every script here must be runnable from any cwd without installing the
package (``python scripts/foo.py``).  Python puts the *script's* directory
on ``sys.path[0]`` — so ``import _bootstrap`` always resolves — and this
module then prepends the repo root so ``musicgan_tpu`` imports.
"""

import os as _os
import sys as _sys

_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _ROOT not in _sys.path:
    _sys.path.insert(0, _ROOT)
