#!/usr/bin/env bash
# All local gates in one shot: unit/golden suite, driver-contract oracle
# parity, and a bench smoke. Usage: tools/run_gates.sh [--bench]
set -euo pipefail
cd "$(dirname "$0")/.."
python -m pytest tests/ -x -q
python tools/check_oracles.py
if [[ "${1:-}" == "--bench" ]]; then
  python bench.py
fi
echo "ALL GATES GREEN"
