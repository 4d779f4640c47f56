#!/usr/bin/env bash
# One-command verification gate: unit/plan/property tests, the full
# virgin-session DuckDB oracle sweep, then the headline bench.
# Usage: scripts/ci.sh [--fast]   (--fast skips the bench)
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== pytest =="
python -m pytest tests/ -q

echo "== oracle sweep (virgin session, sf0.01) =="
python scripts/driver_sim.py

if [[ "${1:-}" != "--fast" ]]; then
    echo "== bench (sf0.1) =="
    python bench.py
fi
echo "CI GREEN"
