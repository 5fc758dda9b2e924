#!/bin/bash
# Round-3 TPU measurement session: run serially (single-tenant TPU).
set -u
cd /root/repo
mkdir -p /tmp/r3_tpu
log() { echo "[$(date +%H:%M:%S)] $*" | tee -a /tmp/r3_tpu/session.log; }

log "=== 1. quick accuracy eval (16 pages)"
timeout 1200 python -m synapta_tpu.eval --pages 16 --seed 3 > /tmp/r3_tpu/eval16.txt 2>&1
log "eval16 rc=$? tail: $(tail -1 /tmp/r3_tpu/eval16.txt)"

log "=== 2. scanned eval (4 pages) with wall metrics"
timeout 1800 python -m synapta_tpu.eval --scanned --pages 4 > /tmp/r3_tpu/scanned.txt 2>&1
log "scanned rc=$? tail: $(tail -1 /tmp/r3_tpu/scanned.txt)"

log "=== 3. throughput sweep: base config, 2 reps (stage breakdown)"
timeout 3000 python scripts/sweep_r3.py 2 base > /tmp/r3_tpu/sweep_base.txt 2>&1
log "sweep rc=$? tail: $(tail -2 /tmp/r3_tpu/sweep_base.txt)"

log "=== 4. Pallas CC A/B"
SYNAPTA_PALLAS_CC=1 timeout 2000 python scripts/sweep_r3.py 1 base > /tmp/r3_tpu/sweep_pallas.txt 2>&1
log "pallas rc=$? tail: $(tail -2 /tmp/r3_tpu/sweep_pallas.txt)"

log "=== 5. LLM at 1000 pages"
timeout 3000 python scripts/llm_at_scale.py --pages 1000 > /tmp/r3_tpu/llmscale.txt 2>&1
log "llmscale rc=$? tail: $(tail -1 /tmp/r3_tpu/llmscale.txt)"

log "=== 6. bench best-of-3"
timeout 3000 python bench.py > /tmp/r3_tpu/bench.txt 2>&1
log "bench rc=$? tail: $(tail -1 /tmp/r3_tpu/bench.txt)"

log "=== session complete"
