#!/bin/bash
# Unattended NDC end-to-end demo (VERDICT r2 item 4): the synthetic
# forward-facing LLFF scene (tools/make_synthetic_scene.py --llff ->
# convert_llff.py, already converted in demo/llff_scene) through
#   NDC dense 60k -> NDC fine 25k (S=16 thr 0.15) -> export -> eval -> bench
# Schedule compressed from the sphere demo's 100k/40k: blending 5k-25k,
# oracle lock at 50k keeps the proven lock-after-saturation margin
# (BENCH.md training-schedule lesson) at 60% of the epochs.
set -x
cd "$(dirname "$0")/.."

DENSE_ARGS=(-c configs/dense_training_ndc.ini -data demo/llff_scene
    -log demo/ndclogs -e 60001
    --lossBlendingStart 5000 --lossBlendingDuration 20000
    --epochsLockWeightsBefore -1 --epochsLockWeightsBefore 1001
    --epochsLockWeightsAfter 50000 --epochsLockWeightsAfter -1
    -Er 30000 -Ev 15000 -Eckpt 10000)
FINE_ARGS=(-c configs/fine_training_ndc.ini -data demo/llff_scene
    -log demo/ndclogs -e 25001
    --lossBlendingStart 5000 --lossBlendingDuration 20000
    --preTrained demo/ndclogs/llff_scene --preTrained demo/ndclogs/llff_scene
    -Er 12000 -Ev 6000 -Eckpt 6000)

python tools/supervise_train.py --log demo/ndc_dense_train.log --stall-min 12 -- \
    python train.py "${DENSE_ARGS[@]}" || exit 1
python tools/supervise_train.py --log demo/ndc_fine_train.log --stall-min 12 -- \
    python train.py "${FINE_ARGS[@]}" || exit 1

python export.py "${FINE_ARGS[@]}" || exit 1
FINE_DIR=$(ls -d demo/ndclogs/llff_scene/*'(0.15)'*/ | head -1)
rm -rf demo/trained_ndc_export
cp -r "${FINE_DIR}exported_model" demo/trained_ndc_export

python tools/eval_megakernel.py demo/trained_ndc_export demo/llff_scene \
    --fp32-delta 2>&1 | tee demo/ndc_eval.log
python bench.py --export-dir demo/trained_ndc_export 2>&1 \
    | tee demo/ndc_bench.log
echo "NDC PIPELINE DONE"
