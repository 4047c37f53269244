#!/usr/bin/env bash
# Slow test lane: deep-model torch parity (res15/res26, deep CNN variants)
# and the all-16-ConfigType sweep. These are deselected from the default
# gate (pytest.ini: -m "not slow") because XLA:CPU compiles of 24-conv
# stacks take minutes; run this lane before releases / at round end.
#
#   ./scripts/run_slow_tests.sh [extra pytest args]
set -euo pipefail
cd "$(dirname "$0")/.."
exec python -m pytest tests/ -m slow -q "$@"
