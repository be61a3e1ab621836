"""Doc-as-test: every cookbook example executes end to end (the
reference runs its docs as tests; same policy here)."""

import pathlib
import runpy

import pytest

COOKBOOK = sorted(
    (pathlib.Path(__file__).parents[2] / "docs" / "cookbook").glob("*.py")
)


@pytest.mark.parametrize("script", COOKBOOK, ids=lambda p: p.stem)
def test_cookbook_runs(script):
    module = runpy.run_path(str(script))
    module["main"]()
