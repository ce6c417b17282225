#!/bin/bash
# Round-5 second evidence queue: CPU tests, HAT x8 re-measure under the
# new nt default, then the quality chain on corpus v2 (VERDICT r4 weak #6).
# One hardware job at a time, 30 s pauses between chip clients, every job
# timeout-bounded (CLAUDE.md relay hygiene).
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo

echo "=== pytest (CPU mesh) ==="
timeout 1800 python -m pytest tests/ -q 2>&1 | tail -4
echo "pytest rc=${PIPESTATUS[0]}"

sleep 30
echo "=== zoo_bench hat:8 (nt default) ==="
timeout 1800 python scripts/zoo_bench.py hat:8 2>&1 | grep -v WARNING
echo "hat8 rc=${PIPESTATUS[0]}"

sleep 30
echo "=== chain v2 (1500 steps/scale) ==="
timeout 12000 python scripts/chain_v2_run.py 1500 2>&1 | grep -v WARNING
echo "chainv2 rc=${PIPESTATUS[0]}"
