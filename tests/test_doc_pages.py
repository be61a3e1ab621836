"""Executable documentation, part 2: every ```python block in
docs/library/*.md — and in MIGRATION.md, which documents migration
recipes (e.g. the StatefulHandler -> TraceHandler port) — runs (parity
with the reference's mkdocs `exec="yes"` code blocks, which its docs CI
executes)."""

import pathlib
import re
import textwrap

import pytest

_ROOT = pathlib.Path(__file__).parents[1]
PAGES = sorted((_ROOT / "docs" / "library").glob("*.md")) + [
    _ROOT / "MIGRATION.md"
]

_BLOCK = re.compile(r"```python\n(.*?)```", re.DOTALL)


def _blocks(page: pathlib.Path):
    # Markdown list items indent their code fences; dedent before exec.
    return [textwrap.dedent(b) for b in _BLOCK.findall(page.read_text())]


@pytest.mark.parametrize("page", PAGES, ids=lambda p: p.stem)
def test_page_blocks_execute(page):
    blocks = _blocks(page)
    assert blocks, f"{page} has no executable blocks"
    # Blocks on one page share a namespace (like a notebook session).
    namespace: dict = {}
    for i, src in enumerate(blocks):
        try:
            exec(compile(src, f"{page.name}[block {i}]", "exec"), namespace)
        except Exception as e:
            pytest.fail(f"{page.name} block {i} failed: {e!r}")


def test_pages_exist():
    names = {p.stem for p in PAGES}
    assert {"core", "generative_functions", "combinators", "inference"} <= names
