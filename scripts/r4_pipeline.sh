#!/bin/bash
# Round-4 reference-scale pipeline: chains the TPU phases so the chip never
# idles between them. Every phase is resumable (block/run checkpoints), so
# a tunnel wedge only costs the retry. Run from the repo root:
#   nohup bash scripts/r4_pipeline.sh > logs/pipeline.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
mkdir -p data logs results

log() { echo "[pipeline $(date +%H:%M:%S)] $*"; }

retry() {  # retry <n> <logfile> <ok-marker> cmd...
    local n=$1 lf=$2 ok=$3; shift 3
    for i in $(seq 1 "$n"); do
        log "attempt $i/$n: $* (-> $lf)"
        "$@" >> "$lf" 2>&1
        if grep -q "$ok" "$lf"; then log "OK: $ok"; return 0; fi
        log "attempt $i failed (no '$ok' in $lf); tail:"; tail -3 "$lf"
        sleep 30
    done
    return 1
}

# 0. wait for the data phase started by the session
while ! grep -q "DATA PHASE OK" logs/data_phase.log 2>/dev/null; do
    if ! pgrep -f reference_scale.py > /dev/null && \
       ! grep -q "DATA PHASE OK" logs/data_phase.log; then
        log "data phase died; restarting"
        nohup python scripts/reference_scale.py data --samples 16184 \
            --cache data/refscale.npz >> logs/data_phase.log 2>&1
    fi
    sleep 60
done
log "data phase complete"

# 1. train (x64 process) with the inline ML-only solve
retry 3 logs/train_phase.log "TRAIN PHASE OK" \
    python scripts/reference_scale.py train --cache data/refscale.npz \
    || exit 1

# 2. ocean reservoir training (x64 process)
retry 3 logs/ocean_train.log "OCEAN TRAIN OK" \
    python scripts/reference_scale.py coupled --ocean-train-only \
    --ocean-m 500 --ocean-beta 3e-3 || exit 1

# 3. THE config-5 coupled 1-year run (f32 process, chunked fast loop)
retry 3 logs/coupled.log "COUPLED PHASE OK" \
    python scripts/reference_scale.py coupled --ocean-m 500 \
    --ocean-beta 3e-3 --fc-steps 1456 || exit 1
python scripts/score_run.py --nc data/coupled_run.nc \
    --out data/coupled_climate.json >> logs/coupled.log 2>&1

# 4. ML-only held-out skill (config 2) from the inline-trained weights
retry 2 logs/predict_ml.log "PREDICT PHASE OK" \
    python scripts/reference_scale.py predict --ml-only \
    --weights data/refscale_weights_ml.nc \
    --results data/refscale_ml_results.json --fast-loop || exit 1

# 5. hybrid held-out skill (config 4; regenerates refscale_results.json)
retry 2 logs/predict_hybrid.log "PREDICT PHASE OK" \
    python scripts/reference_scale.py predict \
    --results data/refscale_results.json --fast-loop || exit 1

# 6. hybrid-only >=90-day free run on climatological SST (config 3) + score
retry 2 logs/hybrid90.log "COUPLED PHASE OK" \
    python scripts/reference_scale.py coupled --hybrid-only --fc-steps 360 \
    --out data/hybrid90_run.nc --results data/hybrid90_results.json || exit 1
python scripts/score_run.py --nc data/hybrid90_run.nc \
    --out data/hybrid90_climate.json >> logs/hybrid90.log 2>&1

# evidence that survives data/ wipes: small JSONs -> results/ (committed)
cp -f data/refscale_results.json data/refscale_ml_results.json \
      data/coupled_results.json data/coupled_climate.json \
      data/hybrid90_results.json data/hybrid90_climate.json results/ \
      2>/dev/null
log "PIPELINE DONE"
