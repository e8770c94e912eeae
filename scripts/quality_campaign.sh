#!/bin/bash
# The per-round QAT quality-regression campaign: produces QUALITY_r{N}.json
# (one JSON row per line, via scripts/qat_quality_check.py) on the real TPU
# chip. Each row is a three-way float / vanilla-8bit-I/O / FQSS comparison
# with the representational ceilings that frame it (BASELINE.md acceptance
# shape: FQSS-8bit within 0.3 dB of float where the model, not the 8-bit
# I/O grid, is the binding constraint; FQSS above vanilla where the grid
# binds).
#
# Usage: bash scripts/quality_campaign.sh QUALITY_rNN.json
set -u
OUT=${1:-QUALITY.json}
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/jaxcache_tpu}
: > "$OUT"

row() {
  echo "=== $(date +%H:%M:%S) qat_quality_check $* ===" >&2
  timeout 14400 python scripts/qat_quality_check.py "$@" | grep '^{' | tail -1 >> "$OUT"
}

# Speech family (SI-SDR): the ceiling experiment needs long QAT so the
# vanilla arm actually reaches its 8-bit output ceiling (~39.5 dB).
row --model convtasnet --task band --steps-qat 30000
row --model convtasnet --task hard --internal-bits 8

# Music family (NSDR, stereo 4-stem, music KD loss — weighted-L1 with
# pow10/exp NSDR weights, the train_tasnet_music / train_htdemucs step).
row --model convtasnet_music --task band --steps-float 12000 --steps-qat 8000
row --model convtasnet_music --task hard --steps-float 12000 --steps-qat 8000
row --model htdemucs --task band --steps-float 3600 --steps-qat 2500
row --model htdemucs --task hard --steps-float 3600 --steps-qat 2500

cat "$OUT" >&2
