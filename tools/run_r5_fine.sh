#!/bin/bash
# Round-5 fine leg from the 300k dense teacher (VERDICT r4 task 1, leg C).
#
# The first attempt overrode --lossBlendingStart/--lossBlendingDuration,
# which renamed the experiment to [10k_30k] and broke the regex-derived
# teacher lookup (BENCH.md "Fine-leg bootstrap postmortem"); this leg uses
# the ini blending verbatim ([25k_50k], fine_training.ini:47-48) so the
# derived teacher name matches demo/m300logs, and runs 75001 epochs so the
# blend COMPLETES (25k start + 50k duration) instead of stopping mid-ramp
# at 40k.  thr 0.2 matches the round-4 mscene fine row for a like-for-like
# 100k-vs-300k teacher comparison.
set -x
cd "$(dirname "$0")/.."

F300_ARGS=(-c configs/fine_training.ini -data demo/mscene -log demo/m300logs
    -e 75001 --numRaymarchSamples 8 --numRaymarchSamples 8
    --adaptiveSamplingThreshold 0.2
    --preTrained demo/m300logs/mscene --preTrained demo/m300logs/mscene
    -Er 75000 -Ev 75000 -Eckpt 25000 --nonVerbose --dispatchSleepMs 10
    --bf16 --performEvaluation --checkpointParamsOnly 1)

python tools/supervise_train.py --log demo/m300fine_train.log --stall-min 15 \
    -- python train.py "${F300_ARGS[@]}" || exit 1
python export.py "${F300_ARGS[@]}" || exit 1
F300_DIR=$(ls -d demo/m300logs/mscene/*'(0.2)'*/ | head -1)
rm -rf demo/trained_mscene300_export
cp -r "${F300_DIR}exported_model" demo/trained_mscene300_export
python bench.py --export-dir demo/trained_mscene300_export 2>&1 \
    | tee demo/mscene300_bench.log
echo "FINE LEG DONE"
