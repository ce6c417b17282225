#!/bin/bash
# Retry of the round-4 tif inference after the x3 run died with
# FAILED_PRECONDITION at the result fetch (evidence_r4.log).  Full
# tracebacks on; if the default (flash-SGAM) path fails again, retry with
# the dense bf16-energy SGAM to bisect kernel-vs-elsewhere.
set -u
export PYTHONPATH=/root/.axon_site:/root/repo
export JAX_TRACEBACK_FILTERING=off
CHAIN=/tmp/sradsgan_chain

echo "=== attempt 1: defaults (flash SGAM, bias mask) ==="
timeout 2400 python scripts/tif_inference_run.py \
    --x3 "$CHAIN/x3/SRADSGAN_x3/ckpt_epoch_0" \
    --x9 "$CHAIN/x9/SRADSGAN_x9/ckpt_epoch_0" \
    --outdir /tmp/sradsgan_tif 2>&1 | grep -v WARNING
rc=${PIPESTATUS[0]}
echo "attempt1 rc=$rc"
if [ "$rc" != "0" ]; then
  echo "=== attempt 2: SRADSGAN_TPU_SGAM_IMPL=dense ==="
  SRADSGAN_TPU_SGAM_IMPL=dense timeout 2400 python scripts/tif_inference_run.py \
      --x3 "$CHAIN/x3/SRADSGAN_x3/ckpt_epoch_0" \
      --x9 "$CHAIN/x9/SRADSGAN_x9/ckpt_epoch_0" \
      --outdir /tmp/sradsgan_tif 2>&1 | grep -v WARNING
  echo "attempt2 rc=${PIPESTATUS[0]}"
fi
