#!/bin/bash
# Unattended translucent-scene demo pipeline (VERDICT r2 item 6: a trained
# export whose oracle keeps >= 2 samples/px — glass shells + enclosing room
# put 2-4 surfaces with weight > 0.15 on EVERY ray, see scene_utils):
#   dense 100k -> fine 40k (S=8 thr 0.2) -> export -> megakernel eval -> bench
# Every training leg runs under tools/supervise_train.py so axon-tunnel
# hangs/drops (DEVNOTES) recover via checkpoint auto-resume.
set -x
cd "$(dirname "$0")/.."

DENSE_ARGS=(-c configs/dense_training.ini -data demo/tscene -log demo/tlogs
    -e 100001 --lossBlendingStart 10000 --lossBlendingDuration 30000
    --epochsLockWeightsBefore -1 --epochsLockWeightsBefore 1001
    --epochsLockWeightsAfter 90000 --epochsLockWeightsAfter -1
    -Er 50000 -Ev 25000 -Eckpt 20000 --bf16)
FINE_ARGS=(-c configs/fine_training.ini -data demo/tscene -log demo/tlogs
    -e 40001 --numRaymarchSamples 8 --numRaymarchSamples 8
    --adaptiveSamplingThreshold 0.2
    --lossBlendingStart 10000 --lossBlendingDuration 30000
    --preTrained demo/tlogs/tscene --preTrained demo/tlogs/tscene
    -Er 20000 -Ev 10000 -Eckpt 10000 --bf16)

python tools/supervise_train.py --log demo/tdense_train.log --stall-min 12 -- \
    python train.py "${DENSE_ARGS[@]}" || exit 1
python tools/supervise_train.py --log demo/tfine_train.log --stall-min 12 -- \
    python train.py "${FINE_ARGS[@]}" || exit 1

python export.py "${FINE_ARGS[@]}" || exit 1
FINE_DIR=$(ls -d demo/tlogs/tscene/*'(0.2)'*/ | head -1)
rm -rf demo/trained_tscene_export
cp -r "${FINE_DIR}exported_model" demo/trained_tscene_export

python evaluate.py -data demo/tscene -log demo/tlogs 2>&1 \
    | tee demo/tscene_quality.log
python tools/eval_megakernel.py demo/trained_tscene_export demo/tscene \
    --fp32-delta 2>&1 | tee demo/tscene_eval.log
python bench.py --export-dir demo/trained_tscene_export 2>&1 \
    | tee demo/tscene_bench.log
echo "PIPELINE DONE"
