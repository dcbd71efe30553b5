#!/bin/bash
# Round-5 TPU work queue (VERDICT r4 tasks 1 and 4), outage-hardened order:
#
#   A) fine thr-0.01 S=8 from the EXISTING round-4 100k dense teacher
#      (demo/mlogs) -> evaluate -> export -> the >=2 smp/px DONeRF row.
#      Short (~20 min) and independent of the 300k leg's fate.
#   B) the reference-scale dense 300k (failed 3x in round 4 at the bulk
#      checkpoint pull; now: sliced params-only saves w/ progress lines,
#      train_state.py::save_tree).
#   C) fine thr-0.2 S=8 from the 300k teacher -> evaluate -> export ->
#      bench (the mscene300 row).
#
# Training legs run host-paced (--dispatchSleepMs, zero device->host syncs)
# under tools/supervise_train.py; mid-run checkpoints are params-only
# (--checkpointParamsOnly) pulled in <=2 MB groups (--checkpointGroupMB).
set -x
cd "$(dirname "$0")/.."

F001_ARGS=(-c configs/fine_training.ini -data demo/mscene -log demo/mlogs
    -e 40001 --numRaymarchSamples 8 --numRaymarchSamples 8
    --adaptiveSamplingThreshold 0.01
    --lossBlendingStart 10000 --lossBlendingDuration 30000
    --preTrained demo/mlogs/mscene --preTrained demo/mlogs/mscene
    -Er 40000 -Ev 40000 -Eckpt 10000 --nonVerbose --dispatchSleepMs 10
    --bf16 --performEvaluation --checkpointParamsOnly 1)

D300_ARGS=(-c configs/dense_training.ini -data demo/mscene -log demo/m300logs
    -Er 300000 -Ev 300000 -Eckpt 25000 --nonVerbose --dispatchSleepMs 14
    --bf16 --performEvaluation --checkpointParamsOnly 1)

F300_ARGS=(-c configs/fine_training.ini -data demo/mscene -log demo/m300logs
    -e 40001 --numRaymarchSamples 8 --numRaymarchSamples 8
    --adaptiveSamplingThreshold 0.2
    --lossBlendingStart 10000 --lossBlendingDuration 30000
    --preTrained demo/m300logs/mscene --preTrained demo/m300logs/mscene
    -Er 40000 -Ev 40000 -Eckpt 10000 --nonVerbose --dispatchSleepMs 10
    --bf16 --performEvaluation --checkpointParamsOnly 1)

# ---- A) the >=2 smp/px DONeRF-space row (VERDICT r4 task 4) --------------
python tools/supervise_train.py --log demo/mfine001_train.log --stall-min 15 \
    -- python train.py "${F001_ARGS[@]}" || exit 1
python export.py "${F001_ARGS[@]}" || exit 1
F001_DIR=$(ls -d demo/mlogs/mscene/*'(0.01)'*/ | head -1)
rm -rf demo/trained_mscene_thr001_export
cp -r "${F001_DIR}exported_model" demo/trained_mscene_thr001_export
python bench.py --export-dir demo/trained_mscene_thr001_export 2>&1 \
    | tee demo/mscene_thr001_bench.log

# ---- B) reference-scale 300k dense (VERDICT r4 task 1) -------------------
python tools/supervise_train.py --log demo/m300dense_train.log --stall-min 20 \
    -- python train.py "${D300_ARGS[@]}" || exit 1

# ---- C) fine leg from the 300k dense teacher + export + bench ------------
python tools/supervise_train.py --log demo/m300fine_train.log --stall-min 15 \
    -- python train.py "${F300_ARGS[@]}" || exit 1
python export.py "${F300_ARGS[@]}" || exit 1
F300_DIR=$(ls -d demo/m300logs/mscene/*'(0.2)'*/ | head -1)
rm -rf demo/trained_mscene300_export
cp -r "${F300_DIR}exported_model" demo/trained_mscene300_export
python bench.py --export-dir demo/trained_mscene300_export 2>&1 \
    | tee demo/mscene300_bench.log
echo "QUEUE DONE"
