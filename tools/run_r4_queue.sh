#!/bin/bash
# Round-4 TPU work queue (VERDICT r3 tasks 4/5/7):
#   1) FPS rows for the existing NDC and tscene exports (bench.py)
#   2) mscene fine retrain at thr 0.01 -> the >=2 samples/px DONeRF-style
#      trained workload (probe_threshold.py: oracle keeps 2.05 smp/px there)
#   3) the reference-scale 300k-epoch schedule (configs/dense_training.ini +
#      fine_training.ini verbatim: blending 25k-75k, oracle lock at 80k,
#      lrate decay 0.1@300k) end-to-end: dense -> fine -> evaluate -> export
# Every training leg runs under tools/supervise_train.py so axon-tunnel
# hangs/drops recover via checkpoint auto-resume.
set -x
cd "$(dirname "$0")/.."

# ---- 1) reference-scale 300k schedule (the long pole — run FIRST) --------
D300_ARGS=(-c configs/dense_training.ini -data demo/mscene -log demo/m300logs
    -Er 300000 -Ev 300000 -Eckpt 100000 --nonVerbose --dispatchSleepMs 14 --bf16 --performEvaluation)
F300_ARGS=(-c configs/fine_training.ini -data demo/mscene -log demo/m300logs
    -e 40001 --numRaymarchSamples 8 --numRaymarchSamples 8
    --adaptiveSamplingThreshold 0.2
    --lossBlendingStart 10000 --lossBlendingDuration 30000
    --preTrained demo/m300logs/mscene --preTrained demo/m300logs/mscene
    -Er 40000 -Ev 40000 -Eckpt 20000 --nonVerbose --dispatchSleepMs 10 --bf16 --performEvaluation)

python tools/supervise_train.py --log demo/m300dense_train.log --stall-min 20 \
    -- python train.py "${D300_ARGS[@]}" || exit 1
python tools/supervise_train.py --log demo/m300fine_train.log --stall-min 20 \
    -- python train.py "${F300_ARGS[@]}" || exit 1

python export.py "${F300_ARGS[@]}" || exit 1
F300_DIR=$(ls -d demo/m300logs/mscene/*'(0.2)'*/ | head -1)
rm -rf demo/trained_mscene300_export
cp -r "${F300_DIR}exported_model" demo/trained_mscene300_export
python bench.py --export-dir demo/trained_mscene300_export 2>&1 \
    | tee demo/mscene300_bench.log

# ---- 2) FPS rows for existing exports ------------------------------------
python bench.py --export-dir demo/trained_ndc_export 2>&1 \
    | tee demo/ndc_bench.log
python bench.py --export-dir demo/trained_tscene_export 2>&1 \
    | tee demo/tscene_bench.log

# ---- 3) mscene fine @ thr 0.01 (>=2 smp/px regime; bonus leg) ------------
FINE01_ARGS=(-c configs/fine_training.ini -data demo/mscene -log demo/mlogs
    -e 40001 --numRaymarchSamples 8 --numRaymarchSamples 8
    --adaptiveSamplingThreshold 0.01
    --lossBlendingStart 10000 --lossBlendingDuration 30000
    --preTrained demo/mlogs/mscene --preTrained demo/mlogs/mscene
    -Er 20000 -Ev 10000 -Eckpt 10000 --bf16 --performEvaluation)
python tools/supervise_train.py --log demo/mfine01_train.log --stall-min 12 -- \
    python train.py "${FINE01_ARGS[@]}" || exit 1
python export.py "${FINE01_ARGS[@]}" || exit 1
FINE01_DIR=$(ls -d demo/mlogs/mscene/*'(0.01)'*/ | head -1)
rm -rf demo/trained_mscene_lowthr_export
cp -r "${FINE01_DIR}exported_model" demo/trained_mscene_lowthr_export
python bench.py --export-dir demo/trained_mscene_lowthr_export 2>&1 \
    | tee demo/mscene_lowthr_bench.log
echo "QUEUE DONE"
