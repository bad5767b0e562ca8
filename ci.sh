#!/usr/bin/env bash
# Two-tier test gate (reference: .github/workflows/main.yml gates every
# push with compile+assembly; full solver suites run nightly on a Slurm
# cluster via Testing/tests1_all.sh — here: quick on every change, full
# nightly).
#
#   ./ci.sh        quick tier: bytecode check + unit/golden tests (<5 min)
#   ./ci.sh full   everything, including the slow golden/sharded suites
set -euo pipefail
cd "$(dirname "$0")"

python -m compileall -q exastencils_tpu bench.py __graft_entry__.py

if [[ "${1:-quick}" == "full" ]]; then
    python -m pytest tests -q
else
    python -m pytest tests -q -m "not slow"
fi
