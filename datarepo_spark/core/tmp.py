"""One process-scoped tmp root for every gate/bench fixture.

The oracle-gated queries materialize Delta tables, bucketed tables,
ANN/dedup indexes, and CSV/JSON/stream copies under /tmp. Allocating
each with a bare ``tempfile.mkdtemp`` leaks one directory per fixture
per process — a machine that runs the gate + bench + the test suite a
few times accumulates hundreds of ``datarepo_*`` dirs (r13 census: 914
on the build host; the r12 verdict flagged the two sources.py sites,
but the same pattern lived at 20 call sites). Every fixture now
allocates under ONE ``datarepo_session_tmp_*`` root that an atexit
hook removes, so a full run leaves zero residue while preserving the
old semantics: dirs persist for the PROCESS lifetime (memoized
fixtures stay valid; a caller may lazily re-collect an earlier query's
DataFrame until exit).
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

_ROOT: list[str] = []


def session_tmp(prefix: str) -> str:
    """A fresh directory under the process-scoped session root."""
    if not _ROOT:
        root = tempfile.mkdtemp(prefix="datarepo_session_tmp_")
        atexit.register(shutil.rmtree, root, ignore_errors=True)
        _ROOT.append(root)
    return tempfile.mkdtemp(prefix=prefix, dir=_ROOT[0])


def session_root_for_tests() -> str | None:
    """The current root (None before first use) — test hook only."""
    return _ROOT[0] if _ROOT else None


__all__ = ["session_tmp", "session_root_for_tests"]
