#!/bin/bash
# Fast proof set: the export-surface tests that keep a snapshot from
# going red the way round 3's did (docs/API.md drifting from __all__).
# Run before any commit that touches exports, docs, or facades —
# installed as .git/hooks/pre-commit by tools/install_hooks.sh.
#
# Scope: seconds, not minutes. The full correctness story is
# `python -m pytest tests/ -q` (~30 min) and `pytest -m smoke` (<5 min).
set -e
cd "$(dirname "$0")/.."
python -m pytest \
  tests/core/test_api_index.py \
  tests/core/test_typecheck.py \
  tests/test_export_parity.py \
  -q -p no:cacheprovider "$@"
