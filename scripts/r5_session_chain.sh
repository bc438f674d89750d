#!/bin/bash
# Round-5 session chip chain: serializes this round's TPU jobs behind the
# ENSO data phase (the tunnel chip must run ONE job at a time). The
# canonical reproduction recipe is scripts/r5_pipeline.sh; this chain adds
# the round-5 session ordering: bench early (perf-record insurance), the
# debias validation, the ENSO line, the decade run, bench again.
set -u
cd "$(dirname "$0")/.."
mkdir -p data logs results

log() { echo "[chain $(date +%H:%M:%S)] $*"; }

retry() {  # retry <n> <logfile> <ok-marker> cmd...  (per-attempt marker)
    local n=$1 lf=$2 ok=$3; shift 3
    local tmp
    for i in $(seq 1 "$n"); do
        tmp=$(mktemp)
        log "attempt $i/$n: $* (-> $lf)"
        "$@" > "$tmp" 2>&1
        cat "$tmp" >> "$lf"
        if grep -q "$ok" "$tmp"; then rm -f "$tmp"; log "OK: $ok"; return 0; fi
        log "attempt $i failed; tail:"; tail -3 "$tmp"; rm -f "$tmp"
        sleep 30
    done
    return 1
}

# 0. wait for the ENSO data phase launched by the session
while ! grep -q "DATA PHASE OK" logs/enso_data.log 2>/dev/null; do
    sleep 60
done
log "ENSO data phase complete"

# 1. precip-bias diagnosis (open-loop sigma for the debias field)
retry 2 logs/diag_precip.log "PRECIP BIAS DIAG OK" \
    python scripts/diag_precip_bias.py --out data/precip_bias.json \
    || log "diag_precip FAILED (continuing without debias)"

# 2. bench #1 (early perf-record insurance; crash-proof staged architecture)
log "bench #1"
python bench.py > logs/bench_r5a.json 2> logs/bench_r5a.log
log "bench #1 rc=$? (json in logs/bench_r5a.json)"

# 3. debias validation: 98-day hybrid-only free run with the corrected
#    output, scored against the unchanged bands
if [ -e data/precip_bias.npz ]; then
    retry 2 logs/hybrid98d.log "COUPLED PHASE OK" \
        python scripts/reference_scale.py coupled --hybrid-only \
        --fc-steps 392 --precip-debias data/precip_bias.npz \
        --out data/hybrid98d_run.nc --results data/hybrid98d_results.json
    python scripts/score_run.py --nc data/hybrid98d_run.nc \
        --out data/hybrid98d_climate.json >> logs/hybrid98d.log 2>&1
fi

# 4. ENSO atmosphere training (x64 process; ~95 min)
retry 3 logs/enso_train.log "TRAIN PHASE OK" \
    python scripts/reference_scale.py train --cache data/refscale_enso.npz \
    --weights data/refscale_enso_weights.nc \
    --ml-weights data/refscale_enso_weights_ml.nc || exit 1

# 5. ENSO ocean training (x64 process)
retry 3 logs/enso_ocean.log "OCEAN TRAIN OK" \
    python scripts/reference_scale.py coupled --ocean-train-only \
    --cache data/refscale_enso.npz --ocean-m 500 --ocean-beta 3e-3 \
    || exit 1

# 6. THE ENSO coupled 2-year run (f32 process) + scores + eval
retry 3 logs/enso_coupled.log "COUPLED PHASE OK" \
    python scripts/reference_scale.py coupled \
    --cache data/refscale_enso.npz --weights data/refscale_enso_weights.nc \
    --ocean-m 500 --ocean-beta 3e-3 --fc-steps 2912 \
    --out data/enso_run.nc --results data/enso_results.json || exit 1
python scripts/score_run.py --nc data/enso_run.nc \
    --out data/enso_climate.json >> logs/enso_coupled.log 2>&1
python scripts/enso_eval.py --nc data/enso_run.nc \
    --cache data/refscale_enso.npz --out data/enso_eval.json \
    >> logs/enso_coupled.log 2>&1

# 7. the 10-year coupled run (streamed; clim-truth weights + r4 ocean)
DEBIAS_ARG=""
[ -e data/precip_bias.npz ] && DEBIAS_ARG="--precip-debias data/precip_bias.npz"
retry 5 logs/coupled10y.log "COUPLED PHASE OK" \
    python scripts/reference_scale.py coupled --ocean-m 500 \
    --ocean-beta 3e-3 --fc-steps 14560 --out data/coupled10y_run.nc \
    --results data/coupled10y_results.json $DEBIAS_ARG || exit 1
python scripts/score_run.py --nc data/coupled10y_run.nc \
    --out data/coupled10y_climate.json >> logs/coupled10y.log 2>&1

# 8. bench #2 (+#3 back-to-back; the round's pass/fail line)
log "bench #2"
python bench.py > logs/bench_r5b.json 2> logs/bench_r5b.log
log "bench #2 rc=$?"
log "bench #3"
python bench.py > logs/bench_r5c.json 2> logs/bench_r5c.log
log "bench #3 rc=$?"

# evidence that survives data/ wipes
cp -f data/hybrid98d_results.json data/hybrid98d_climate.json \
      data/enso_results.json data/enso_climate.json data/enso_eval.json \
      data/coupled10y_results.json data/coupled10y_climate.json \
      data/precip_bias.json data/wetbias_diag.json \
      results/ 2>/dev/null
log "CHAIN DONE"
