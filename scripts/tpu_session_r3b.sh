#!/bin/bash
# Round-3 TPU measurement session, reordered for a fresh machine:
# bench.py first (generates/uses the cached book + pays compile),
# then sweeps/A-Bs/evals. Run serially (single-tenant TPU).
set -u
cd /root/repo
mkdir -p /tmp/r3_tpu
log() { echo "[$(date +%H:%M:%S)] $*" | tee -a /tmp/r3_tpu/session.log; }

log "=== 1. bench best-of-3 (warmup pays compile)"
timeout 4000 python bench.py > /tmp/r3_tpu/bench.txt 2>&1
log "bench rc=$? tail: $(tail -1 /tmp/r3_tpu/bench.txt)"

log "=== 2. throughput sweep: base config, 2 reps (stage breakdown)"
timeout 3000 python scripts/sweep_r3.py 2 base > /tmp/r3_tpu/sweep_base.txt 2>&1
log "sweep rc=$? tail: $(tail -2 /tmp/r3_tpu/sweep_base.txt)"

log "=== 3. Pallas CC A/B"
SYNAPTA_PALLAS_CC=1 timeout 2500 python scripts/sweep_r3.py 1 base > /tmp/r3_tpu/sweep_pallas.txt 2>&1
log "pallas rc=$? tail: $(tail -2 /tmp/r3_tpu/sweep_pallas.txt)"

log "=== 4. quick accuracy eval (16 pages)"
timeout 1800 python -m synapta_tpu.eval --pages 16 --seed 3 > /tmp/r3_tpu/eval16.txt 2>&1
log "eval16 rc=$? tail: $(tail -1 /tmp/r3_tpu/eval16.txt)"

log "=== 5. scanned eval (4 pages) with wall metrics"
timeout 2400 python -m synapta_tpu.eval --scanned --pages 4 > /tmp/r3_tpu/scanned.txt 2>&1
log "scanned rc=$? tail: $(tail -1 /tmp/r3_tpu/scanned.txt)"

log "=== 6. LLM at 1000 pages"
timeout 3000 python scripts/llm_at_scale.py --pages 1000 > /tmp/r3_tpu/llmscale.txt 2>&1
log "llmscale rc=$? tail: $(tail -1 /tmp/r3_tpu/llmscale.txt)"

log "=== session complete"
