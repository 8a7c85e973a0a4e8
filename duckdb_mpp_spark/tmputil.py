"""Session-lifetime temp directories, shared by every gate surface.

One copy of the mkdtemp+atexit recipe (review r7: ``queries/mpp_layer.py``,
``streaming/__init__.py`` and ``operators/dedup.py`` each re-implemented
it): gates return LAZY DataFrames that scan these dirs, so they must
outlive the call — but the driver re-runs the gates every round, and
without exit-time cleanup /tmp accumulates fixture copies per gate per
round until writes start failing (review r4).
"""

from __future__ import annotations

import atexit
import shutil
import tempfile


def session_tmpdir(prefix: str = "mpp_gate_") -> str:
    """Temp dir (warehouse / checkpoint / sink / index) reclaimed at
    process exit, not before — lazy readers planned over it stay valid
    for the whole session."""
    d = tempfile.mkdtemp(prefix=prefix)
    atexit.register(shutil.rmtree, d, ignore_errors=True)
    return d
