#!/usr/bin/env python
"""Run every doctest in the package (and repo-root scripts) standalone.

The reference drives its doctests through a custom AST-reducing harness
because its top-level scripts have import side effects
(reference pre_commit_hooks/run_doctests.py:117-237).  This package keeps
every module import-safe (CLI entry points guard ``main`` behind
``__name__``), so the harness is simpler: discover modules, import them,
and run ``doctest`` over each, skipping files that contain no ``>>>``
before importing anything.

Usage: ``python pre_commit_hooks/run_doctests.py [paths...]`` -- with no
arguments, checks the whole package plus repo-root ``*.py`` scripts.
Exits nonzero on any failure.  Also exercised by ``tests/test_doctests.py``.
"""

from __future__ import annotations

import doctest
import importlib
import importlib.util
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
PACKAGE = "configurable_spectrograms_tpu"


def iter_default_files() -> list[Path]:
    files = sorted((REPO_ROOT / PACKAGE).rglob("*.py"))
    files += sorted(p for p in REPO_ROOT.glob("*.py") if p.name not in {"bench.py", "__graft_entry__.py"})
    return files


def module_name_for(path: Path) -> str:
    rel = path.resolve().relative_to(REPO_ROOT)
    if rel.parts[0] == PACKAGE:
        parts = list(rel.parts)
        parts[-1] = parts[-1][:-3]
        if parts[-1] == "__init__":
            parts.pop()
        return ".".join(parts)
    return rel.stem


def run_file(path: Path) -> tuple[int, int]:
    """Return (failures, tests) for one file; (0, 0) when it has no doctests."""
    text = path.read_text()
    if ">>>" not in text:
        return 0, 0
    sys.path.insert(0, str(REPO_ROOT))
    try:
        module = importlib.import_module(module_name_for(path))
    finally:
        sys.path.pop(0)
    results = doctest.testmod(module, verbose=False)
    return results.failed, results.attempted


def main(argv: list[str]) -> int:
    # resolve() so relative CLI paths survive the relative_to(REPO_ROOT)
    # status print below.
    paths = [Path(a).resolve() for a in argv] if argv else iter_default_files()
    total_failed = total_run = 0
    for path in paths:
        if path.suffix != ".py":
            continue
        try:
            failed, attempted = run_file(path)
        except Exception as exc:
            print(f"[DOCTEST] {path}: import/run error: {exc}", file=sys.stderr)
            total_failed += 1
            continue
        if attempted:
            status = "FAIL" if failed else "ok"
            print(f"[DOCTEST] {path.relative_to(REPO_ROOT)}: {attempted} tests, {failed} failed ({status})")
        total_failed += failed
        total_run += attempted
    print(f"[DOCTEST] total: {total_run} tests, {total_failed} failed")
    return 1 if total_failed else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
