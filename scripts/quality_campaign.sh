#!/bin/bash
# The per-round QAT quality-regression campaign: produces QUALITY_r{N}.json
# (one JSON row per line, via scripts/qat_quality_check.py) on the real TPU
# chip. Each row is a three-way float / vanilla-8bit-I/O / FQSS comparison
# with the representational ceilings that frame it (BASELINE.md acceptance
# shape: converged float >= both QAT arms on every row; FQSS-8bit within
# 0.3 dB of float where the model, not the 8-bit I/O grid, is the binding
# constraint; FQSS above vanilla where the grid binds).
#
# Step counts are convergence-oriented (VERDICT r4 items 1-2): the QAT arms
# continue FROM the float weights, so an unconverged float arm loses to its
# own students — every float budget below is sized so the arm plateaus
# (trajectory eval prints every 2000 steps make that checkable in the log),
# and the speech-band QAT budget is long enough for the vanilla arm to
# actually reach its ~39.5 dB 8-bit output ceiling.
#
# Usage: bash scripts/quality_campaign.sh QUALITY_rNN.json
set -u
OUT=${1:-QUALITY.json}
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/jaxcache_tpu}
: > "$OUT"

LOGDIR=${LOGDIR:-/tmp/quality_campaign_logs}
mkdir -p "$LOGDIR"

row() {
  echo "=== $(date +%H:%M:%S) qat_quality_check $* ===" >&2
  local tag
  tag=$(echo "$*" | tr ' /-' '___')
  # tee the full trajectory log so a running campaign is observable
  timeout 14400 python scripts/qat_quality_check.py "$@" \
    | tee "$LOGDIR/$tag.log" | grep '^{' | tail -1 >> "$OUT"
}

# Speech family (SI-SDR): the ceiling experiment needs long QAT so the
# vanilla arm actually reaches its 8-bit output ceiling (~39.5 dB).
row --model convtasnet --task band --steps-float 6000 --steps-qat 30000
row --model convtasnet --task hard --internal-bits 8 --steps-float 10000 --steps-qat 2500

# Music family (NSDR, stereo multi-stem, music KD loss — weighted-L1 with
# pow10/exp NSDR weights, the train_tasnet_music / train_htdemucs step).
# band = 4 band-disjoint stems (8-bit I/O ceiling regime); hard = 2
# timbre-distinct wideband stems (model-limited regime; 2 stems so the
# float arm is non-trivial — see qat_quality_check.N_STEMS_HARD).
row --model convtasnet_music --task band --steps-float 28000 --steps-qat 16000
row --model convtasnet_music --task hard --steps-float 24000 --steps-qat 12000
row --model htdemucs --task band --steps-float 8000 --steps-qat 2500
row --model htdemucs --task hard --steps-float 8000 --steps-qat 2500

cat "$OUT" >&2
