#!/bin/bash
# Round-4 TPU work queue (VERDICT r3 tasks 4/5/7), tunnel-outage-hardened
# ordering: the reference-scale dense 300k first (the long pole), then the
# missing FPS rows (NDC, tscene), then the fine leg + its export/bench —
# so an end-of-session cutoff costs the least-critical tail, not the rows.
#
# Training legs run host-paced (--dispatchSleepMs: bounded dispatch backlog
# with ZERO device->host syncs — robust to the tunnel's slow-readback moods
# measured in DEVNOTES round 4) under tools/supervise_train.py.
set -x
cd "$(dirname "$0")/.."

D300_ARGS=(-c configs/dense_training.ini -data demo/mscene -log demo/m300logs
    -Er 300000 -Ev 300000 -Eckpt 50000 --nonVerbose --dispatchSleepMs 14
    --bf16 --performEvaluation)
F300_ARGS=(-c configs/fine_training.ini -data demo/mscene -log demo/m300logs
    -e 40001 --numRaymarchSamples 8 --numRaymarchSamples 8
    --adaptiveSamplingThreshold 0.2
    --lossBlendingStart 10000 --lossBlendingDuration 30000
    --preTrained demo/m300logs/mscene --preTrained demo/m300logs/mscene
    -Er 40000 -Ev 40000 -Eckpt 20000 --nonVerbose --dispatchSleepMs 10
    --bf16 --performEvaluation)

# ---- 1) reference-scale 300k dense (the cited config, verbatim) ----------
python tools/supervise_train.py --log demo/m300dense_train.log --stall-min 20 \
    -- python train.py "${D300_ARGS[@]}" || exit 1

# ---- 2) FPS rows for existing exports ------------------------------------
python bench.py --export-dir demo/trained_ndc_export 2>&1 \
    | tee demo/ndc_bench.log
python bench.py --export-dir demo/trained_tscene_export 2>&1 \
    | tee demo/tscene_bench.log

# ---- 3) fine leg from the 300k dense teacher + export + bench ------------
python tools/supervise_train.py --log demo/m300fine_train.log --stall-min 20 \
    -- python train.py "${F300_ARGS[@]}" || exit 1

python export.py "${F300_ARGS[@]}" || exit 1
F300_DIR=$(ls -d demo/m300logs/mscene/*'(0.2)'*/ | head -1)
rm -rf demo/trained_mscene300_export
cp -r "${F300_DIR}exported_model" demo/trained_mscene300_export
python bench.py --export-dir demo/trained_mscene300_export 2>&1 \
    | tee demo/mscene300_bench.log
echo "QUEUE DONE"
