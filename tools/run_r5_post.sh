#!/bin/bash
# Round-5 post-queue TPU measurements (run AFTER tools/run_r5_queue.sh has
# freed the chip). Order: cheapest/most-informative first.
#
#   1) Barbershop S=4 at-cap ladder with the pair-harvested v3
#      (stop_after=oracle/select/geom/encode) + headline -> the r4-task-3
#      30 FPS attempt, measured stage by stage.
#   2) Pavillon S=16 at-cap headline with the new v3.
#   3) bench.py TPU leg on the default mscene export (verify recipe leg +
#      v3-variant plumbing check).
#   4) Clean re-run of the thr-0.01 row (its queue bench was
#      contention-flagged).
#   5) bench.py --mesh 1 sharded-path overhead row (r4 task 2 "within ~5%").
#   6) Training batch-scaling sweep through the fused kernel (r4 task 6).
#   7) bench_all.py full machine-recorded artifact (r4 task 8).
set -x
cd "$(dirname "$0")/.."

python tools/convert_reference_onnx.py \
    /root/reference/adanerf_real_time_viewer/sample /tmp/ref_barbershop_export
python tools/convert_reference_onnx.py \
    /root/reference/adanerf_real_time_viewer/sample_pavillon_16 /tmp/ref_pavillon_export

python tools/bench_megakernel.py --export-dir /tmp/ref_barbershop_export \
    v3:tile=512 v3:tile=512,stop_after=oracle v3:tile=512,stop_after=select \
    v3:tile=512,stop_after=geom v3:tile=512,stop_after=encode \
    2>&1 | tee demo/barbershop_ladder_r5.log

python tools/bench_megakernel.py --export-dir /tmp/ref_pavillon_export \
    v3:tile=512 2>&1 | tee demo/pavillon_r5.log

python bench.py 2>&1 | tee demo/mscene_bench_r5.log
python bench.py --export-dir demo/trained_mscene_thr001_export 2>&1 \
    | tee demo/mscene_thr001_bench_clean.log
python bench.py --mesh 1 2>&1 | tee demo/mscene_bench_mesh1.log

# kernel-vs-fp32-pipeline quality agreement on the real chip (the pair-
# harvest/planar/composite rewrites are bit-identical by construction and
# interpret-tested; this is the on-device confirmation on a trained model)
python tools/eval_megakernel.py demo/trained_mscene_export demo/mscene \
    2>&1 | tee demo/eval_megakernel_r5.log

python tools/bench_train.py 2>&1 | tee demo/bench_train_sweep_r5.log

python tools/bench_all.py 2>&1 | tee demo/bench_all_r5.log
echo "POST QUEUE DONE"
