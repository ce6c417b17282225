#!/bin/bash
# Round-5 evidence queue — run AFTER scripts/corpus21_learning_run.py
# releases the chip (CLAUDE.md: one hardware job at a time, 35 s pauses
# between processes, retry a first-dispatch FAILED_PRECONDITION once).
set -u
export PYTHONPATH=/root/.axon_site:/root/repo
cd /root/repo
log() { echo "=== $(date +%T) $1 ==="; }

log "validate-by-class from the 3000-step corpus21 checkpoint (ledger 4)"
timeout 2400 python scripts/by_class_evidence.py \
    /tmp/sradsgan_c21v2/SRADSGAN_x4/ckpt_epoch_0 4 2>&1 | grep -v WARNING
echo "byclass rc=${PIPESTATUS[0]}"; sleep 35

log "HAT x4 device trace (ledger 6)"
timeout 3600 python scripts/trace_step.py /tmp/sradsgan_trace_hat4 \
    --model=hat:4 2>&1 | grep -v WARNING
echo "hattrace rc=${PIPESTATUS[0]}"; sleep 35

log "zoo re-measure with the fixed timing window (ledger 5)"
timeout 9000 python scripts/zoo_bench.py edsr:4 srgan:4 dssr:4 amssrn:4 \
    sragan:4 drcan:4 ndsrgan:4 sradsgan:8 hat:8 2>&1 | grep -v WARNING
echo "zoo rc=${PIPESTATUS[0]}"; sleep 35

log "HAT x4: baseline re-measure, then the two round-5 candidates (ledger 6)"
timeout 3600 python scripts/zoo_bench.py hat:4 2>&1 | grep -v WARNING
echo "hat4base rc=${PIPESTATUS[0]}"; sleep 35
SRADSGAN_TPU_HAT_ATTN=nt timeout 3600 python scripts/zoo_bench.py hat:4 \
    2>&1 | grep -v WARNING
echo "hat4nt rc=${PIPESTATUS[0]}"; sleep 35
SRADSGAN_TPU_HAT_ATTN=nt SRADSGAN_TPU_HAT_SOFTMAX=bf16 timeout 3600 \
    python scripts/zoo_bench.py hat:4 2>&1 | grep -v WARNING
echo "hat4ntbf rc=${PIPESTATUS[0]}"
