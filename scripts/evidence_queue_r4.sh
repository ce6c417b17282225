#!/bin/bash
# Round-4 evidence queue: runs the remaining hardware-evidence jobs
# SEQUENTIALLY (one hardware job at a time, CLAUDE.md hygiene), each
# bounded with timeout so a dead tunnel surfaces as exit 124 instead of a
# hang.  Launched after scripts/chain_training_run.py finishes (its x3/x4/
# x9 checkpoints feed the tif + by-class jobs).
set -u
export PYTHONPATH=/root/.axon_site:/root/repo
CHAIN=/tmp/sradsgan_chain
log() { echo "=== $(date -u +%H:%M:%S) $1 ==="; }

log "tif inference (GF-2 x3, Sentinel-2 x9; VERDICT item 5)"
timeout 2400 python scripts/tif_inference_run.py \
    --x3 "$CHAIN/x3/SRADSGAN_x3/ckpt_epoch_0" \
    --x9 "$CHAIN/x9/SRADSGAN_x9/ckpt_epoch_0" \
    --outdir /tmp/sradsgan_tif 2>&1 | grep -v WARNING
echo "tif rc=${PIPESTATUS[0]}"

log "per-class validate-by-class table (VERDICT item 6)"
timeout 2400 python scripts/by_class_evidence.py \
    "$CHAIN/x4/SRADSGAN_x4/ckpt_epoch_0" 4 2>&1 | grep -v WARNING
echo "byclass rc=${PIPESTATUS[0]}"

log "HAT x4 zoo row (VERDICT item 7 / BASELINE configs[4])"
timeout 2400 python scripts/zoo_bench.py hat:4 2>&1 | grep -v WARNING
echo "hat4 rc=${PIPESTATUS[0]}"

log "scene classification rerun with the VGG16 trunk (VERDICT item 8)"
timeout 2400 python scripts/scene_evidence.py 2>&1 | grep -v WARNING
echo "scene rc=${PIPESTATUS[0]}"

log "second-seed bf16-D twin, seed=1, 2000 steps, 5-metric sweeps (item 9)"
timeout 3600 python scripts/flagship_learning_run.py 2000 seed=1 lpips \
    2>&1 | grep -v WARNING
echo "twin-f32d rc=${PIPESTATUS[0]}"
timeout 3600 python scripts/flagship_learning_run.py 2000 bf16d seed=1 lpips \
    2>&1 | grep -v WARNING
echo "twin-bf16d rc=${PIPESTATUS[0]}"

log "queue done"
