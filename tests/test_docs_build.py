"""The documentation site must build and stay internally consistent.

Reference parity: genjax ships an mkdocs site with strict CI
(`/root/reference/mkdocs.yml` + the test_docs workflow). This build's
site generator is tools/build_docs.py (mkdocs is not installable in the
zero-egress image); this test is the strict-docs gate: the site builds,
every documentation source gets a page, and every nav link resolves.
"""

import pathlib
import re
import sys

import pytest

ROOT = pathlib.Path(__file__).parents[1]
sys.path.insert(0, str(ROOT / "tools"))

import build_docs  # noqa: E402


@pytest.fixture(scope="module")
def site(tmp_path_factory):
    out = tmp_path_factory.mktemp("site")
    written = build_docs.build(out)
    return out, written


def test_every_source_has_a_page(site):
    out, written = site
    names = {p.name for p in written}
    assert "index.html" in names
    assert "api.html" in names
    for src in (ROOT / "docs/library").glob("*.md"):
        assert f"library_{src.stem}.html" in names, src
    for src in (ROOT / "docs/cookbook").glob("*.py"):
        assert f"cookbook_{src.stem}.html" in names, src
    # All 28 cookbook chapters present.
    assert sum(n.startswith("cookbook_") for n in names) >= 28


def test_nav_links_resolve(site):
    out, written = site
    names = {p.name for p in written}
    for page in written:
        for href in re.findall(r'href="([^"#]+)"', page.read_text()):
            if href.startswith(("http:", "https:", "mailto:")):
                continue
            assert href in names, f"{page.name} links to missing {href}"


def test_pages_carry_content(site):
    out, written = site
    for page in written:
        text = page.read_text()
        assert "<main>" in text and len(text) > 2000, (
            f"{page.name} looks empty"
        )
    api = (out / "api.html").read_text()
    # Spot-check that the rendered API index kept its content.
    assert "ChoiceMap" in api and "Selection" in api
