#!/usr/bin/env python
"""Exercise checkpoint resume from a surviving mid-run checkpoint.

VERDICT r4 task 1 asks for ">=1 mid-run checkpoint that survived + a
resume exercised from it". This stages a REAL mid-run params-only
checkpoint pair from the completed 300k dense run into a scratch log dir,
relaunches train.py for a few hundred more epochs, and asserts that

  * train_state resumes from the staged epoch (not from scratch and not
    from the dense->fine bootstrap path), and
  * training steps past it to the requested end epoch.

Reference semantics: epoch-in-name checkpoints + newest-complete-epoch
resume (reference models.py:87-181, train_data.py:339-346; ours
train_state.py::_try_resume_common_epoch).

Usage: python tools/exercise_resume.py [--src-log demo/m300logs]
           [--epoch 275000] [--extra 200]
"""
import argparse
import glob
import os
import re
import shutil
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src-log", default="demo/m300logs")
    ap.add_argument("--scene", default="demo/mscene")
    ap.add_argument("--epoch", type=int, default=275000)
    ap.add_argument("--extra", type=int, default=200)
    ap.add_argument("--work", default="/tmp/resume_exercise")
    args = ap.parse_args()

    src = glob.glob(os.path.join(ROOT, args.src_log, "*", "*LSfCDA_(0.0)*"))
    if not src:
        print("no dense experiment dir found", file=sys.stderr)
        return 1
    src_dir = src[0]
    exp_name = os.path.basename(src_dir)

    work_log = os.path.join(args.work, "logs")
    dst_dir = os.path.join(work_log, os.path.basename(os.path.dirname(src_dir)),
                           exp_name)
    shutil.rmtree(args.work, ignore_errors=True)
    os.makedirs(dst_dir)

    tag = f"{args.epoch:07d}"
    staged = []
    for f in os.listdir(src_dir):
        if f.endswith(f"_{tag}.weights"):
            shutil.copy2(os.path.join(src_dir, f), os.path.join(dst_dir, f))
            staged.append(f)
    if len(staged) < 2:
        print(f"epoch {args.epoch} checkpoints not found in {src_dir}",
              file=sys.stderr)
        return 1
    print(f"staged {len(staged)} params-only checkpoints @ {args.epoch}: "
          f"{staged}")

    end = args.epoch + args.extra
    cmd = [sys.executable, "train.py", "-c", "configs/dense_training.ini",
           "-data", args.scene, "-log", work_log,
           "-e", str(end + 1), "-Er", str(end), "-Ev", str(end),
           "-Eckpt", str(end),
           "--nonVerbose", "--dispatchSleepMs", "10", "--bf16",
           "--checkpointParamsOnly", "1"]
    print("+", " ".join(cmd), flush=True)
    r = subprocess.run(cmd, cwd=ROOT, capture_output=True, text=True,
                       timeout=3600)
    out = r.stdout + r.stderr
    sys.stdout.write(out[-3000:])
    if r.returncode != 0:
        print(f"train.py failed rc={r.returncode}", file=sys.stderr)
        return 1

    m = re.search(r"Reloading checkpoint from epoch (\d+)", out)
    if not m or int(m.group(1)) != args.epoch:
        print(f"FAIL: expected resume from epoch {args.epoch}, got "
              f"{m.group(1) if m else 'no resume line'}", file=sys.stderr)
        return 1
    final = [f for f in os.listdir(dst_dir) if f"_{end:07d}.weights" in f]
    if len(final) < 2:
        print(f"FAIL: no end-of-run checkpoint at {end}", file=sys.stderr)
        return 1
    print(f"RESUME EXERCISE PASS: resumed @ {args.epoch} (params-only, "
          f"fresh Adam), stepped {args.extra} epochs to {end}, "
          f"saved {final}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
