#!/bin/bash
# Produce the full-suite evidence file (docs/suite_runs_rN.txt): two
# consecutive `pytest tests/` runs on the virtual 8-device CPU mesh with
# timestamps, pass counts and return codes.  Run SOLO on an idle host —
# the suite is compile-heavy on the single CPU core (~35 min/run solo;
# see CLAUDE.md) and anything else running (TPU compiles, another pytest)
# stretches it badly.
#
# Usage: bash scripts/run_suite_evidence.sh [out_file]   (default: stdout)
set -u
cd "$(dirname "$0")/.."
out="${1:-/dev/stdout}"
{
  echo "host: $(hostname) / $(nproc) cpu / $(python -c 'import jax; print("jax", jax.__version__)')"
  for run in 1 2; do
    echo "run ${run}: start $(date -u +'%Y-%m-%d %H:%M:%S UTC')"
    python -m pytest tests/ -q 2>&1
    echo "run ${run} rc=$?"
    echo "run ${run}: end   $(date -u +'%Y-%m-%d %H:%M:%S UTC')"
    echo
  done
} > "$out" 2>&1
