#!/usr/bin/env python
"""Supervised training launcher for the flaky axon TPU tunnel.

The tunnel occasionally hangs mid-run (process goes idle, log stops
advancing) or refuses to initialize for minutes.  This wrapper makes long
trainings unattended-safe:

  * probes the tunnel with a trivial readback before each (re)launch,
  * starts ``train.py`` with the given args,
  * watches the training log's mtime; if it stops advancing for
    ``--stall-min`` minutes, kills the run and relaunches (epoch-in-name
    checkpoints make the relaunch a resume, train_state.py:resume),
  * exits 0 when train.py exits 0.

Usage:
    python tools/supervise_train.py --log demo/mdense_train.log -- \
        python train.py -c configs/dense_training.ini -data demo/mscene ...
"""
import argparse
import os
import signal
import subprocess
import sys
import time


def tunnel_ok(timeout_s: float) -> bool:
    """One trivial readback in a fresh process (the only true fence).

    Honors ADANERF_PLATFORM (platform.py): a CPU-forced run has no tunnel
    to probe, and a bare ``jax.devices()`` would touch — and hang on — the
    axon backend this wrapper exists to avoid."""
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = (f"import sys; sys.path.insert(0, {root!r}); "
            "from adanerf_tpu.platform import apply_platform_env; "
            "apply_platform_env(); "
            "import jax, jax.numpy as jnp; jax.devices(); "
            "print(float(jnp.zeros(())))")
    try:
        r = subprocess.run([sys.executable, "-c", code], timeout=timeout_s,
                           stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--log", required=True, help="training stdout/stderr log")
    ap.add_argument("--stall-min", type=float, default=10.0,
                    help="kill+resume if the log stops advancing this long")
    ap.add_argument("--probe-timeout", type=float, default=600.0,
                    help="tunnel probe budget (first readback can cost 530s)")
    ap.add_argument("--max-restarts", type=int, default=30)
    ap.add_argument("cmd", nargs=argparse.REMAINDER,
                    help="-- python train.py ...")
    args = ap.parse_args()
    cmd = args.cmd[1:] if args.cmd and args.cmd[0] == "--" else args.cmd
    if not cmd:
        ap.error("no training command given")

    for attempt in range(args.max_restarts + 1):
        while not tunnel_ok(args.probe_timeout):
            print(f"[supervise] tunnel probe failed; retrying in 60s",
                  flush=True)
            time.sleep(60)
        print(f"[supervise] attempt {attempt}: {' '.join(cmd)}", flush=True)
        logf = open(args.log, "ab", buffering=0)
        proc = subprocess.Popen(cmd, stdout=logf, stderr=logf,
                                start_new_session=True)
        stall_s = args.stall_min * 60
        while True:
            try:
                rc = proc.wait(timeout=30)
                break
            except subprocess.TimeoutExpired:
                pass
            try:
                age = time.time() - os.stat(args.log).st_mtime
            except OSError:
                age = 0.0
            if age > stall_s:
                print(f"[supervise] log silent {age:.0f}s -> kill + resume",
                      flush=True)
                os.killpg(proc.pid, signal.SIGKILL)
                proc.wait()
                rc = None
                break
        logf.close()
        if rc == 0:
            print("[supervise] training finished cleanly", flush=True)
            return 0
        print(f"[supervise] run ended rc={rc}; restarting", flush=True)
        time.sleep(10)
    print("[supervise] giving up after max restarts", flush=True)
    return 1


if __name__ == "__main__":
    sys.exit(main())
