#!/usr/bin/env python
"""Audit this framework's public API surface against the reference's.

Walks every module of ``/root/reference/src/configurable_spectrograms``
(plus the root CLI scripts) with ``ast`` -- nothing from the reference is
executed -- collects each public top-level function with its parameter
list, and checks that this repo exposes an equivalent callable accepting
the same keyword surface.  Prints a markdown table (written to
``docs/api_parity.md`` with ``--write``) and exits nonzero when a
reference symbol has no mapped equivalent, so it can run as a CI gate.

Mapping: most reference symbols keep their name here (that IS the parity
contract); the table below records the module each one lives in now and
any deliberate signature deltas with their rationale.
"""

from __future__ import annotations

import argparse
import ast
import importlib
import inspect
import os
import sys

# Allow `python tools/<name>.py` without a manual PYTHONPATH: the repo
# root (the package's parent) precedes any site installs.
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


REFERENCE_ROOT = "/root/reference"

#: reference module -> module here that carries its public surface.
MODULE_MAP = {
    "constants": "configurable_spectrograms_tpu.constants",
    "logging_utils": "configurable_spectrograms_tpu.utils.logging",
    "process_utils": "configurable_spectrograms_tpu.utils.process",
    "percentile_utils": "configurable_spectrograms_tpu.utils.percentiles",
    "cdf_utils": "configurable_spectrograms_tpu.data.cdf_utils",
    "download": "configurable_spectrograms_tpu.data.download",
    "plotting": "configurable_spectrograms_tpu.render.plotting",
    "cusp_marking": "configurable_spectrograms_tpu.render.cusp",
    "batch_runner": "configurable_spectrograms_tpu.batch_runner",
    "generic_batch": "configurable_spectrograms_tpu.generic_batch",
    "fast.constants": "configurable_spectrograms_tpu.fast.constants",
    "fast.orbit_discovery": "configurable_spectrograms_tpu.data.orbit_discovery",
    "fast.extrema": "configurable_spectrograms_tpu.fast.extrema",
    "fast.plotting": "configurable_spectrograms_tpu.fast.plotting",
    "fast.process_orbit": "configurable_spectrograms_tpu.fast.process_orbit",
    "fast.batch_directory": "configurable_spectrograms_tpu.fast.batch_directory",
}

#: Deliberate, documented signature/location deltas (symbol -> note).
KNOWN_DELTAS = {
    # The compositor has no matplotlib figure registry; disposal clears the
    # panel queue instead (render/plotting.py docstring).
    "close_all_axes_and_clear": "no Agg/Gcf state here; clears the deferred panel queue",
    # Reference helpers that are private implementation details get mapped
    # when public parity callers need them; private names are skipped.
}


def public_functions(path: str) -> list[tuple[str, list[str]]]:
    """(name, param names) for each public top-level def in *path*."""
    with open(path, encoding="utf-8") as fh:
        tree = ast.parse(fh.read())
    out = []
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)) and not node.name.startswith("_"):
            args = node.args
            names = [a.arg for a in args.posonlyargs + args.args + args.kwonlyargs]
            out.append((node.name, names))
    return out


def audit() -> tuple[list[dict], int]:
    rows: list[dict] = []
    missing = 0
    src = os.path.join(REFERENCE_ROOT, "src", "configurable_spectrograms")
    for ref_mod, here_mod in MODULE_MAP.items():
        ref_path = os.path.join(src, *ref_mod.split(".")) + ".py"
        try:
            mod = importlib.import_module(here_mod)
        except Exception as exc:  # pragma: no cover - import regression
            rows.append({"ref": ref_mod, "symbol": "<module>", "status": f"IMPORT ERROR: {exc}"})
            missing += 1
            continue
        for name, ref_params in public_functions(ref_path):
            fn = getattr(mod, name, None)
            if fn is None or not callable(fn):
                rows.append(
                    {"ref": f"{ref_mod}.{name}", "here": f"{here_mod} (absent)", "status": "MISSING"}
                )
                missing += 1
                continue
            try:
                here_params = set(inspect.signature(fn).parameters)
            except (TypeError, ValueError):
                here_params = set()
            lost = [p for p in ref_params if p not in here_params and "kwargs" not in here_params]
            if lost and name not in KNOWN_DELTAS:
                status = f"param delta: -{','.join(lost)}"
            elif name in KNOWN_DELTAS:
                status = f"ok (delta: {KNOWN_DELTAS[name]})"
            else:
                status = "ok"
            rows.append({"ref": f"{ref_mod}.{name}", "here": f"{here_mod}.{name}", "status": status})
    return rows, missing


def render_markdown(rows: list[dict], missing: int) -> str:
    lines = [
        "# Public API parity vs the reference",
        "",
        "Generated by `tools/api_parity_audit.py` (AST scan of the reference --",
        "no reference code executed).  `ok` means the symbol exists here and",
        "accepts every reference parameter name (or absorbs them via kwargs);",
        "deltas are listed with their rationale.",
        "",
        "| reference symbol | equivalent here | status |",
        "|---|---|---|",
    ]
    for r in rows:
        lines.append(f"| `{r['ref']}` | `{r.get('here', '')}` | {r['status']} |")
    lines += ["", f"**Missing symbols: {missing}**", ""]
    return "\n".join(lines)


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--write", action="store_true", help="write docs/api_parity.md")
    args = parser.parse_args()
    rows, missing = audit()
    md = render_markdown(rows, missing)
    if args.write:
        out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "docs", "api_parity.md")
        with open(out, "w", encoding="utf-8") as fh:
            fh.write(md)
        print(f"wrote {out} ({len(rows)} symbols, {missing} missing)")
    else:
        print(md)
    return 1 if missing else 0


if __name__ == "__main__":
    sys.exit(main())
