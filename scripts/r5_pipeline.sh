#!/bin/bash
# Round-5 reference-scale pipeline: full regeneration recipe for every
# committed results/ artifact (data/ is wiped between rounds). Chains the
# TPU phases so the chip never idles; every phase is resumable (block/run
# checkpoints) and IDEMPOTENT (skipped when its output exists), so rerunning
# the script after a tunnel wedge only costs the interrupted phase.
#   nohup bash scripts/r5_pipeline.sh > logs/pipeline.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
mkdir -p data logs results

log() { echo "[pipeline $(date +%H:%M:%S)] $*"; }

# retry <n> <logfile> <ok-marker> cmd...
# ADVICE r4 #2: each attempt's output goes to its own temp file and ONLY
# that attempt is grepped for the marker (logs/ persists across rounds, so
# grepping the accumulated log could hit a stale marker); the temp file is
# then appended to the phase log for the permanent record.
retry() {
    local n=$1 lf=$2 ok=$3; shift 3
    local tmp
    for i in $(seq 1 "$n"); do
        tmp=$(mktemp)
        log "attempt $i/$n: $* (-> $lf)"
        "$@" > "$tmp" 2>&1
        cat "$tmp" >> "$lf"
        if grep -q "$ok" "$tmp"; then rm -f "$tmp"; log "OK: $ok"; return 0; fi
        log "attempt $i failed (no '$ok'); tail:"; tail -3 "$tmp"
        rm -f "$tmp"
        sleep 30
    done
    return 1
}

# phase <output-that-marks-done> <n> <logfile> <ok-marker> cmd...
phase() {
    local done_file=$1; shift
    if [ -e "$done_file" ]; then log "skip (exists): $done_file"; return 0; fi
    retry "$@"
}

# run_watched <logfile> <ok-marker> cmd...
# ADVICE r4 #3: the long data phases are watched by PID (no pgrep pattern
# matching that could catch unrelated processes), and restarts are
# backgrounded so the watchdog keeps watching.
run_watched() {
    local lf=$1 ok=$2; shift 2
    : > "$lf"                      # fresh log: no stale markers
    "$@" >> "$lf" 2>&1 &
    local pid=$!
    while true; do
        if grep -q "$ok" "$lf"; then log "OK: $ok"; return 0; fi
        if ! kill -0 "$pid" 2>/dev/null; then
            if grep -q "$ok" "$lf"; then log "OK: $ok"; return 0; fi
            log "phase died; restarting (resumes from cache/checkpoints)"
            "$@" >> "$lf" 2>&1 &
            pid=$!
        fi
        sleep 60
    done
}

# ---- climatological-truth line (configs 1-4 + hybrid-only climate) ------
if [ ! -e data/refscale.npz ]; then
    run_watched logs/data_phase.log "DATA PHASE OK" \
        python scripts/reference_scale.py data --samples 16184 \
        --cache data/refscale.npz
fi

phase data/refscale_weights.nc 3 logs/train_phase.log "TRAIN PHASE OK" \
    python scripts/reference_scale.py train --cache data/refscale.npz \
    || exit 1

phase data/refscale.npz.ocean_ckpt/ocean_block_0000.npz 3 \
    logs/ocean_train.log "OCEAN TRAIN OK" \
    python scripts/reference_scale.py coupled --ocean-train-only \
    --ocean-m 500 --ocean-beta 3e-3 || exit 1

phase data/coupled_results.json 3 logs/coupled.log "COUPLED PHASE OK" \
    python scripts/reference_scale.py coupled --ocean-m 500 \
    --ocean-beta 3e-3 --fc-steps 1456 || exit 1
[ -e data/coupled_climate.json ] || python scripts/score_run.py \
    --nc data/coupled_run.nc --out data/coupled_climate.json \
    >> logs/coupled.log 2>&1

phase data/refscale_ml_results.json 2 logs/predict_ml.log \
    "PREDICT PHASE OK" \
    python scripts/reference_scale.py predict --ml-only \
    --weights data/refscale_weights_ml.nc \
    --results data/refscale_ml_results.json --fast-loop || exit 1

phase data/refscale_results.json 2 logs/predict_hybrid.log \
    "PREDICT PHASE OK" \
    python scripts/reference_scale.py predict \
    --results data/refscale_results.json --fast-loop || exit 1

# config-3 climate free runs (90 d = the r4 headline; 98 d = the committed
# hybrid98_* artifacts — ADVICE r4 #4: 392 steps, scored the same way)
phase data/hybrid90_results.json 2 logs/hybrid90.log "COUPLED PHASE OK" \
    python scripts/reference_scale.py coupled --hybrid-only --fc-steps 360 \
    --out data/hybrid90_run.nc --results data/hybrid90_results.json || exit 1
[ -e data/hybrid90_climate.json ] || python scripts/score_run.py \
    --nc data/hybrid90_run.nc --out data/hybrid90_climate.json \
    >> logs/hybrid90.log 2>&1
phase data/hybrid98_results.json 2 logs/hybrid98.log "COUPLED PHASE OK" \
    python scripts/reference_scale.py coupled --hybrid-only --fc-steps 392 \
    --out data/hybrid98_run.nc --results data/hybrid98_results.json || exit 1
[ -e data/hybrid98_climate.json ] || python scripts/score_run.py \
    --nc data/hybrid98_run.nc --out data/hybrid98_climate.json \
    >> logs/hybrid98.log 2>&1

# ---- precip MOS calibration (host) + decade run (streamed) --------------
phase data/precip_bias.npz 2 logs/make_debias.log "PRECIP DEBIAS OK" \
    python scripts/make_precip_debias.py || exit 1
phase data/coupled10y_results.json 5 logs/coupled10y.log \
    "COUPLED PHASE OK" \
    python scripts/reference_scale.py coupled --ocean-m 500 \
    --ocean-beta 3e-3 --fc-steps 14560 --out data/coupled10y_run.nc \
    --results data/coupled10y_results.json \
    --precip-debias data/precip_bias.npz || exit 1
[ -e data/coupled10y_climate.json ] || python scripts/score_run.py \
    --nc data/coupled10y_run.nc --out data/coupled10y_climate.json \
    >> logs/coupled10y.log 2>&1
[ -e data/coupled10y_table.json ] || python scripts/decade_table.py \
    --nc data/coupled10y_run.nc --out data/coupled10y_table.json \
    >> logs/coupled10y.log 2>&1

# ---- synthetic-ENSO line (VERDICT r4 Next #2: coupled VARIABILITY) ------
if [ ! -e data/refscale_enso.npz ]; then
    run_watched logs/enso_data.log "DATA PHASE OK" \
        python scripts/reference_scale.py data --samples 16184 \
        --cache data/refscale_enso.npz --enso-amp 1.2
fi

phase data/refscale_enso_weights.nc 3 logs/enso_train.log \
    "TRAIN PHASE OK" \
    python scripts/reference_scale.py train --cache data/refscale_enso.npz \
    --weights data/refscale_enso_weights.nc \
    --ml-weights data/refscale_enso_weights_ml.nc || exit 1

phase data/refscale_enso.npz.ocean_ckpt/ocean_block_0000.npz 3 \
    logs/enso_ocean.log "OCEAN TRAIN OK" \
    python scripts/reference_scale.py coupled --ocean-train-only \
    --cache data/refscale_enso.npz --ocean-m 500 --ocean-beta 3e-3 || exit 1

phase data/enso_results.json 3 logs/enso_coupled.log "COUPLED PHASE OK" \
    python scripts/reference_scale.py coupled \
    --cache data/refscale_enso.npz --weights data/refscale_enso_weights.nc \
    --ocean-m 500 --ocean-beta 3e-3 --fc-steps 2912 \
    --out data/enso_run.nc --results data/enso_results.json || exit 1
[ -e data/enso_climate.json ] || python scripts/score_run.py \
    --nc data/enso_run.nc --out data/enso_climate.json \
    >> logs/enso_coupled.log 2>&1
[ -e data/enso_eval.json ] || python scripts/enso_eval.py \
    --nc data/enso_run.nc --cache data/refscale_enso.npz \
    --out data/enso_eval.json >> logs/enso_coupled.log 2>&1

# evidence that survives data/ wipes: small JSONs -> results/ (committed)
cp -f data/refscale_results.json data/refscale_ml_results.json \
      data/coupled_results.json data/coupled_climate.json \
      data/hybrid90_results.json data/hybrid90_climate.json \
      data/hybrid98_results.json data/hybrid98_climate.json \
      data/coupled10y_results.json data/coupled10y_climate.json \
      data/enso_results.json data/enso_climate.json data/enso_eval.json \
      results/ 2>/dev/null
log "PIPELINE DONE"
