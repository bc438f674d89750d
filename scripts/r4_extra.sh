#!/bin/bash
# Post-pipeline extras: full-scale worker-file export (host CPU only) and
# extension of the coupled run to 2 simulated years via checkpoint resume.
# Strictly sequenced after scripts/r4_pipeline.sh (only 2 host CPUs — the
# 39 GB export must not contend with the TPU phases' host loops).
#   nohup bash scripts/r4_extra.sh > logs/extra.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
log() { echo "[extra $(date +%H:%M:%S)] $*"; }

while ! grep -q "PIPELINE DONE" logs/pipeline.log 2>/dev/null; do
    sleep 60
done

# year-2 extension FIRST (TPU): resume the finished 1-year coupled run
# from its checkpoint and integrate a second year (writer -> .resume.nc)
log "extending coupled run to 2 years"
python scripts/reference_scale.py coupled --ocean-m 500 --ocean-beta 3e-3 \
    --fc-steps 2912 --resume \
    --results data/coupled2y_results.json > logs/coupled_y2.log 2>&1
python scripts/score_run.py --nc data/coupled_run.nc.resume.nc \
    --out data/coupled2y_climate.json >> logs/coupled_y2.log 2>&1
cp -f data/coupled2y_results.json data/coupled2y_climate.json results/ \
    2>/dev/null
log "year-2 extension done"

log "exporting worker files"
python scripts/export_workers.py --weights data/refscale_weights.nc \
    > logs/export_workers.log 2>&1 \
    && cp -f data/worker_export.json results/ 2>/dev/null
log "EXTRA DONE"
