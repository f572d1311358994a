#!/usr/bin/env python
"""Zero-dependency docs builder: Markdown sources -> static HTML site.

The real docs pipeline is Sphinx+MyST (docs/conf.py, docs/Makefile,
.readthedocs.yml, .github/workflows/gh-pages.yml — the counterpart of
the reference's Sphinx setup, reference docs/conf.py:1).  This fallback
renders the same ``docs/*.md`` sources with a small stdlib Markdown
subset (headings, fenced code, inline code, lists, tables, links, bold/
italic) so offline images without Sphinx still produce a browsable site:

    python tools/build_docs.py [--out docs/_build/html]

It is deliberately NOT a full Markdown implementation — anything it
cannot parse passes through as escaped text, never breaking the build.
"""

from __future__ import annotations

import argparse
import html
import os
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
DOCS = REPO / "docs"

_PAGE = """<!DOCTYPE html>
<html lang="en"><head><meta charset="utf-8">
<title>{title}</title>
<style>
body {{ font: 16px/1.55 system-ui, sans-serif; max-width: 60rem; margin: 2rem auto; padding: 0 1rem; color: #222; }}
pre {{ background: #f6f8fa; padding: .8rem; overflow-x: auto; border-radius: 6px; }}
code {{ background: #f6f8fa; padding: .1em .3em; border-radius: 4px; font-size: .92em; }}
pre code {{ padding: 0; background: none; }}
table {{ border-collapse: collapse; margin: 1em 0; }}
th, td {{ border: 1px solid #ccc; padding: .3em .6em; text-align: left; }}
nav {{ border-bottom: 1px solid #ddd; padding-bottom: .5rem; margin-bottom: 1.5rem; }}
nav a {{ margin-right: 1rem; }}
h1, h2, h3 {{ line-height: 1.25; }}
</style></head><body>
<nav><a href="index.html">index</a>{nav}</nav>
{body}
</body></html>
"""


def _inline(text: str) -> str:
    """Inline markdown -> HTML (code, links, bold, italic), escaped first."""
    out = html.escape(text, quote=False)
    out = re.sub(r"`([^`]+)`", r"<code>\1</code>", out)
    out = re.sub(r"\[([^\]]+)\]\(([^)\s]+)\)",
                 lambda m: f'<a href="{_fix_link(m.group(2))}">{m.group(1)}</a>', out)
    out = re.sub(r"\*\*([^*]+)\*\*", r"<strong>\1</strong>", out)
    out = re.sub(r"(?<!\*)\*([^*\s][^*]*)\*(?!\*)", r"<em>\1</em>", out)
    return out


def _fix_link(href: str) -> str:
    if href.endswith(".md") and "://" not in href:
        return href[:-3] + ".html"
    return href


def _render(md: str) -> tuple[str, str]:
    """Markdown text -> (title, HTML body)."""
    lines = md.splitlines()
    out: list[str] = []
    title = ""
    i = 0
    in_list: str | None = None

    def close_list() -> None:
        nonlocal in_list
        if in_list:
            out.append(f"</{in_list}>")
            in_list = None

    while i < len(lines):
        line = lines[i]
        if line.startswith("```"):
            close_list()
            block: list[str] = []
            i += 1
            while i < len(lines) and not lines[i].startswith("```"):
                block.append(lines[i])
                i += 1
            out.append("<pre><code>" + html.escape("\n".join(block)) + "</code></pre>")
            i += 1
            continue
        m = re.match(r"^(#{1,6})\s+(.*)$", line)
        if m:
            close_list()
            level = len(m.group(1))
            text = m.group(2)
            if level == 1 and not title:
                title = text
            out.append(f"<h{level}>{_inline(text)}</h{level}>")
            i += 1
            continue
        if re.match(r"^\s*\|.*\|\s*$", line):
            close_list()
            rows: list[str] = []
            while i < len(lines) and re.match(r"^\s*\|.*\|\s*$", lines[i]):
                rows.append(lines[i].strip().strip("|"))
                i += 1
            out.append("<table>")
            for r_i, row in enumerate(rows):
                if re.match(r"^[\s:|-]+$", row):
                    continue
                tag = "th" if r_i == 0 else "td"
                cells = [c.strip() for c in row.split("|")]
                out.append(
                    "<tr>" + "".join(f"<{tag}>{_inline(c)}</{tag}>" for c in cells) + "</tr>"
                )
            out.append("</table>")
            continue
        m = re.match(r"^(\s*)([-*]|\d+\.)\s+(.*)$", line)
        if m:
            want = "ol" if m.group(2)[0].isdigit() else "ul"
            if in_list != want:
                close_list()
                out.append(f"<{want}>")
                in_list = want
            # Continuation lines (indented, non-list) fold into the item.
            item = [m.group(3)]
            while (
                i + 1 < len(lines)
                and lines[i + 1].startswith("  ")
                and not re.match(r"^\s*([-*]|\d+\.)\s+", lines[i + 1])
            ):
                item.append(lines[i + 1].strip())
                i += 1
            out.append(f"<li>{_inline(' '.join(item))}</li>")
            i += 1
            continue
        if not line.strip():
            close_list()
            i += 1
            continue
        close_list()
        para = [line]
        while i + 1 < len(lines) and lines[i + 1].strip() and not re.match(
            r"^(#{1,6}\s|```|\s*\|.*\|\s*$|\s*([-*]|\d+\.)\s)", lines[i + 1]
        ):
            para.append(lines[i + 1])
            i += 1
        out.append(f"<p>{_inline(' '.join(para))}</p>")
        i += 1
    close_list()
    return title, "\n".join(out)


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default=str(DOCS / "_build" / "html"))
    args = parser.parse_args()
    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)

    sources = sorted(DOCS.glob("*.md"))
    nav = "".join(
        f'<a href="{p.stem}.html">{p.stem.replace("_", " ")}</a>'
        for p in sources
        if p.stem != "index"
    )
    for src in sources:
        title, body = _render(src.read_text(encoding="utf-8"))
        page = _PAGE.format(title=html.escape(title or src.stem), nav=nav, body=body)
        (out_dir / f"{src.stem}.html").write_text(page, encoding="utf-8")
    print(f"[build-docs] wrote {len(sources)} page(s) to {out_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
