#!/usr/bin/env python
"""Benchmark: AdaNeRF adaptive real-time rendering throughput on one TPU chip.

Replicates the reference viewer's benchmark workload
(adanerf_real_time_viewer/README.md:26-28): 800x800 frame, full-size
networks (oracle relu 256x8 -> 128 bins, shading NeRF 256x8, posEnc 10-4),
adaptiveSamplingThreshold=0.2, max 8 samples/ray — through the fused
whole-frame Pallas megakernel (adanerf_tpu/ops/pallas/megakernel3.py) with
the bucketed XLA pipeline (adanerf_tpu/realtime.py) as fallback.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is FPS / 30 (BASELINE.json north star: >=30 FPS-equivalent at
800x800 on one v5e chip).

Methodology (round-4 hardening after the round-3 claim/record discrepancy):
* every variant is timed REPEATS times with chain-slope timing and the MIN
  is kept (robust to transient host/tunnel contention);
* a contention guard samples /proc for other busy processes before and
  after the run and flags the result if any were seen;
* the per-variant millisecond series and the active kernel configuration
  (tile, chunk, dynamic, avg samples/px, capacity) are printed to stderr
  as a JSON tail so a slow headline is diagnosable from the artifact alone;
* the frame is timed THROUGH to a scan-order RGBA image: the kernel renders
  in 16x16 block order (square tiles keep the tile-gated adaptive machinery
  coherent) and the inverse is a structured slice+transpose (~1 ms), not a
  row gather (8.5 ms — the round-3 BENCH_r03-vs-BENCH.md 37-vs-28.6 ms
  discrepancy was exactly this gather, present here and absent in
  tools/bench_megakernel.py).

Timing notes for the tunnel-attached TPU: block_until_ready is not a
completion fence and the FIRST device->host readback of a process costs
minutes, so (1) that cost is paid upfront on a trivial constant, (2) the
oracle-threshold calibration runs entirely on device, and (3) throughput is
the slope between two frame-chain lengths, each fenced by one tiny readback.
"""

import json
import os
import sys
import time
from types import SimpleNamespace

import numpy as np

REPEATS = 3
N1, N2 = 3, 13


def busy_processes():
    """Other live processes with meaningful recent CPU: pids whose utime
    delta over a 0.2 s window exceeds 10% of a core. Detection only —
    NEVER sends signals (see driver rules)."""
    me = os.getpid()

    def sample():
        out = {}
        for pid in os.listdir("/proc"):
            if not pid.isdigit() or int(pid) == me:
                continue
            try:
                with open(f"/proc/{pid}/stat") as f:
                    parts = f.read().rsplit(")", 1)[1].split()
                out[int(pid)] = int(parts[11]) + int(parts[12])
            except (OSError, IndexError, ValueError):
                continue
        return out

    a = sample()
    time.sleep(0.2)
    b = sample()
    hz = os.sysconf("SC_CLK_TCK")
    busy = []
    for pid, t1 in b.items():
        if pid in a and (t1 - a[pid]) / hz / 0.2 > 0.10:
            try:
                with open(f"/proc/{pid}/cmdline") as f:
                    cmd = f.read().replace("\0", " ").strip()[:80]
            except OSError:
                cmd = "?"
            busy.append(f"{pid}:{cmd}")
    return busy


def build_workload(w=800, h=800, max_samples=8, threshold=0.2,
                   target_avg_samples=2.5, batch_size=80_000, seed=0):
    import jax
    import jax.numpy as jnp

    from adanerf_tpu.models.mlp import BaseNetDef, NeRFDef
    from adanerf_tpu.ops.raygen import generate_ray_directions
    from adanerf_tpu.pipeline.features import SceneStatic
    from adanerf_tpu.ops.depth_transforms import LogTransform
    from adanerf_tpu.realtime import RealtimeRenderer

    fov = 0.69  # ~ DONeRF classroom camera_angle_x
    focal = 0.5 * w / np.tan(0.5 * fov)
    scene = SceneStatic(
        w=w, h=h, fov=fov, focal=focal,
        view_cell_center=(0.0, 0.0, 0.0), view_cell_radius=0.52,
        depth_range=(0.5, 20.0), depth_range_warped=(0.03, 20.0),
        depth_transform=LogTransform, depth_max=20.0)

    oracle = BaseNetDef(depth=8, width=256, n_in=90, n_out=128, skip="",
                        net_idx=0)
    nerf = NeRFDef(depth=8, width=256, input_ch=63, input_ch_views=27,
                   n_out=4, skips=(4,), net_idx=1)
    key = jax.random.PRNGKey(seed)
    k0, k1 = jax.random.split(key)
    params = [oracle.init(k0), nerf.init(k1)]

    config = SimpleNamespace(
        numRaymarchSamples=[128, max_samples],
        adaptiveSamplingThreshold=threshold,
        posEnc=["nerf", "nerf"], posEncArgs=["10-4", "10-4"],
        rayMarchNormalization=["InverseSqrtDistCentered",
                               "InverseSqrtDistCentered"],
        accumulationMult="alpha")

    directions = generate_ray_directions(w, h, fov, focal) \
        .reshape(-1, 3).astype(np.float32)

    # ON-DEVICE calibration: shift the oracle's output bias so the
    # thresholded top-k keeps ~target_avg_samples samples/ray — an honest
    # adaptive workload with untrained weights (a trained classroom oracle
    # keeps ~2.2 of 8 on classroom). Bisection runs in one jit; no readback.
    rt = RealtimeRenderer([oracle, nerf], params, scene, config,
                          batch_size=batch_size)
    pose = jnp.asarray(scene.view_cell_center, jnp.float32)
    rot = jnp.eye(3)
    probe_dirs = jnp.asarray(
        directions[:: max(len(directions) // 8192, 1)][:8192])

    @jax.jit
    def calibrate(p0):
        nds = probe_dirs @ rot.T
        from adanerf_tpu.ops.raymarch import ray_sphere_offset
        center = jnp.asarray(scene.view_cell_center)
        origins = jnp.broadcast_to(pose, nds.shape)
        dist = ray_sphere_offset(nds, origins, center, scene.view_cell_radius)
        proj = origins + nds * dist[:, None]
        out = oracle.apply(p0, jnp.concatenate(
            [rt.enc0_dir(nds), rt.enc0_pos(proj)], -1))

        def body(_, lohi):
            lo, hi = lohi
            mid = 0.5 * (lo + hi)
            # model the renderer's actual keep count: threshold keep capped
            # at max_samples, with the empty-ray fallback keeping 1 sample
            kept = jnp.clip(jnp.sum(out + mid >= threshold, axis=1),
                            1, max_samples).mean()
            low = kept < target_avg_samples
            return (jnp.where(low, mid, lo), jnp.where(low, hi, mid))

        lo, hi = jax.lax.fori_loop(0, 50, body, (jnp.float32(-50.0),
                                                 jnp.float32(50.0)))
        return 0.5 * (lo + hi)

    shift = calibrate(params[0])
    params[0][-1]["b"] = params[0][-1]["b"] + shift
    rt.params = params
    return rt, directions, scene


def main():
    import argparse

    import jax
    import jax.numpy as jnp

    ap = argparse.ArgumentParser()
    ap.add_argument("--export-dir", default=None,
                    help="measure a TRAINED exported model (viewer-export "
                         "dir) instead of the calibrated random workload")
    ap.add_argument("--synthetic", action="store_true",
                    help="force the calibrated random-weights workload")
    ap.add_argument("--repeats", type=int, default=REPEATS)
    ap.add_argument("--mesh", type=int, default=0,
                    help="shard the frame's rays over this many devices "
                         "(1-D mesh via shard_map, "
                         "adanerf_tpu/parallel/render.py); 0 = unsharded. "
                         "--mesh 1 measures the sharding wrapper's overhead "
                         "on one chip.")
    cli = ap.parse_args()

    contention_before = busy_processes()

    # default workload: the in-repo trained adaptive model (S=8, thr 0.2,
    # trained by the demo recipes in BENCH.md) so FPS and PSNR are measured
    # on the SAME model. The multi-object scene (oracle keeps ~1.3-1.4
    # samples/px with real occlusion structure) outranks the single-sphere
    # scene (~1.0 smp/px best case); calibrated random weights remain the
    # fallback / --synthetic path.
    here = os.path.dirname(os.path.abspath(__file__))
    if cli.export_dir is None and not cli.synthetic:
        for name in ("trained_mscene_export", "trained_sphere_export"):
            cand = os.path.join(here, "demo", name)
            if os.path.isdir(cand):
                cli.export_dir = cand
                break

    # pay the per-process transfer-path init on a trivial constant
    t0 = time.perf_counter()
    float(jnp.zeros(()))
    init_s = time.perf_counter() - t0

    w = h = 800
    if cli.export_dir:
        from adanerf_tpu.ops.raygen import generate_ray_directions
        from viewer import build_renderer_from_export
        rt, scene = build_renderer_from_export(cli.export_dir, 80_000)
        focal = 0.5 * w / np.tan(0.5 * scene.fov)
        directions = generate_ray_directions(w, h, scene.fov, focal) \
            .reshape(-1, 3).astype(np.float32)
    else:
        rt, directions, scene = build_workload(w, h)
    n_pix = directions.shape[0]

    dirs_dev = jnp.asarray(directions)  # uploaded once
    p0, p1 = rt.params[0], rt.params[1]
    probe = jax.jit(lambda f: jnp.sum(f[:2, :2]))

    rng = np.random.RandomState(1)
    center = np.asarray(scene.view_cell_center)
    # in-cell poses at ~0.38 radius (0.2 at the synthetic workload's 0.52)
    poses = [jnp.asarray(center + rng.uniform(-1.0, 1.0, 3)
                         * 0.38 * scene.view_cell_radius, jnp.float32)
             for _ in range(32)]
    rot = jnp.eye(3)
    B = rt.batch_size

    # average live samples/px over the pose set: one cheap oracle-only
    # scan per pose (no full-pipeline compile needed for this statistic)
    @jax.jit
    def probe_counts(p0, pose, rotation, dirs_full):
        nb = n_pix // B
        db = dirs_full[:nb * B].reshape(B, nb, 3).transpose(1, 0, 2)

        def f(carry, chunk):
            _packed, _mask, n_act = rt._oracle_stage(p0, pose, rotation, chunk)
            return carry, n_act

        _c, n_acts = jax.lax.scan(f, 0, db)
        return n_acts

    counts = [np.asarray(probe_counts(p0, pse, rot, dirs_dev))
              for pse in poses[:4]]
    avg_samples = float(np.mean([c.sum() for c in counts])) / n_pix

    t0 = time.perf_counter()
    compile_s = 0.0
    per_frame_s = None
    path = None
    detail = {"repeats": cli.repeats, "variants": {}}

    def timed_min(run_once, label):
        """Min over REPEATS chain-slope passes; returns seconds/frame and
        stores the series in the detail ledger."""
        run_once(1)  # compile + warm
        series = []
        for _ in range(cli.repeats):
            series.append((run_once(N2) - run_once(N1)) / (N2 - N1))
        detail["variants"][label] = [round(s * 1e3, 2) for s in series]
        return min(series)

    # the fused Pallas megakernels (whole pipeline in one VMEM-resident
    # kernel): v5d compacts samples in-tile with a dynamic-trip chunk loop
    # and a per-tile hybrid dense base; v5 is the static-unroll variant.
    # The frame is timed through to a SCAN-ORDER rgba image: block-order
    # kernel output -> slice 4 lanes -> structured transpose (the inverse
    # of viewer.block_permutation — never a row gather).
    try:
        from adanerf_tpu.ops.pallas.megakernel import (make_megakernel,
                                                       pack_nerf_weights,
                                                       pack_oracle_weights,
                                                       prep_inputs)
        from adanerf_tpu.ops.pallas.megakernel3 import make_megakernel_compact

        from viewer import block_permutation

        mk_cfg = rt.config
        tile, chunk = 256, 256
        po = pack_oracle_weights(rt.oracle_def, p0, dtype=jnp.bfloat16)
        pn = pack_nerf_weights(rt.nerf_def, p1, dtype=jnp.bfloat16)
        pose_rows = [jnp.zeros((1, 128), jnp.float32).at[0, :3].set(
            jnp.asarray(p)) for p in poses]

        mesh = None
        if cli.mesh:
            from adanerf_tpu.parallel.render import devices_mesh
            mesh = devices_mesh(cli.mesh)

        _frame_inputs = {}

        def frame_inputs(t):
            """Per-tile-size frame inputs: square-block ray order (tile-
            gated stages see coherent image blocks, viewer.block_permutation)
            + the structured inverse back to scan order, + mesh padding."""
            if t in _frame_inputs:
                return _frame_inputs[t]
            perm, _ = block_permutation(w, h, t)
            dirs_t = directions[perm] if perm is not None else directions
            if mesh is not None:
                from adanerf_tpu.parallel.render import frame_pad
                n_pad = frame_pad(n_pix, t, cli.mesh)
                dirs_t = np.concatenate(
                    [dirs_t, np.zeros((n_pad - n_pix, 3), np.float32)])
            dirs_pad, _, rot_pad = prep_inputs(jnp.asarray(dirs_t),
                                               jnp.zeros(3), jnp.eye(3))
            if mesh is not None:
                from adanerf_tpu.parallel.render import place_frame_inputs
                dirs_pad, _, rot_pad = place_frame_inputs(
                    mesh, dirs_pad, jnp.zeros((1, 128), jnp.float32),
                    rot_pad)
            side = int(np.sqrt(t))
            if perm is not None:
                def unperm(o):  # block order -> scan order, zero gathers
                    x = o[:n_pix, :4].reshape(h // side, w // side,
                                              side, side, 4)
                    return x.transpose(0, 2, 1, 3, 4).reshape(n_pix, 4)
            else:
                def unperm(o):
                    return o[:n_pix, :4]
            _frame_inputs[t] = (dirs_pad, rot_pad, unperm,
                                perm is not None)
            return _frame_inputs[t]

        def time_kernel(mk, t):
            dirs_pad, rot_pad, unperm, _ = frame_inputs(t)
            frame = jax.jit(lambda d, p, r: unperm(mk(d, p, r)))

            def mrun(n_frames):
                t0 = time.perf_counter()
                last = None
                for f in range(n_frames):
                    last = frame(dirs_pad, pose_rows[f % len(pose_rows)],
                                 rot_pad)
                float(probe(last[:, :3]))
                return time.perf_counter() - t0

            return mrun

        # v5d/v5 are the sparse-regime winners; v3 at tile=512 wins the
        # at-cap regime (barbershop S=4 / pavillon S=16 viewer scenes) —
        # timing all three machine-records whichever regime the export is
        # in (round-4 tournament, BENCH.md)
        for name, t, build in [
                ("pallas-megakernel-v5d", tile,
                 lambda: make_megakernel_compact(
                    rt.oracle_def, rt.nerf_def, scene, mk_cfg,
                    tile=tile, chunk=chunk, dynamic=True)(po, pn)),
                ("pallas-megakernel-v5", tile,
                 lambda: make_megakernel_compact(
                    rt.oracle_def, rt.nerf_def, scene, mk_cfg,
                    tile=tile, chunk=chunk)(po, pn)),
                ("pallas-megakernel-v3-t512", 512,
                 lambda: make_megakernel(
                    rt.oracle_def, rt.nerf_def, scene, mk_cfg,
                    tile=512)(po, pn))]:
            try:
                mk = build()
                if mesh is not None:
                    from adanerf_tpu.parallel.render import shard_megakernel
                    mk = shard_megakernel(mesh, mk)
                mega_s = timed_min(time_kernel(mk, t), name)
                print(f"# {name}: {mega_s * 1e3:.2f} ms/frame",
                      file=sys.stderr)
                if per_frame_s is None or mega_s < per_frame_s:
                    per_frame_s = mega_s
                    path = name
            except Exception as e:
                print(f"# {name} skipped: {type(e).__name__}: {e}",
                      file=sys.stderr)
        detail["kernel"] = {"tile": tile, "chunk": chunk,
                            "dense_path": True,
                            "block_order": frame_inputs(tile)[3],
                            "mesh": cli.mesh}
    except Exception as e:
        print(f"# megakernel paths skipped: {type(e).__name__}: {e}",
              file=sys.stderr)

    # fallback: the bucketed XLA pipeline (only compiled when every
    # megakernel failed to build — e.g. non-TPU backends)
    if per_frame_s is None:
        counts_all = np.concatenate(counts)
        capacity = rt.choose_frame_capacity(counts_all, headroom=1.15)
        render = rt.make_frame_renderer(n_pix, capacity=capacity)

        def xrun(n_frames):
            t0 = time.perf_counter()
            last = None
            for f in range(n_frames):
                last, _ = render(p0, p1, poses[f % len(poses)], rot, dirs_dev)
            float(probe(last))
            return time.perf_counter() - t0

        per_frame_s = timed_min(xrun, "xla-pipeline")
        path = "xla-pipeline"
        detail["kernel"] = {"capacity": int(capacity)}

    compile_s = time.perf_counter() - t0
    contention_after = busy_processes()
    contention = sorted(set(contention_before) | set(contention_after))

    rays_per_s = n_pix / per_frame_s
    fps = 1.0 / per_frame_s

    print(json.dumps({
        "metric": "adaptive_render_rays_per_sec_800x800_thr0.2",
        "value": round(rays_per_s, 1),
        "unit": "rays/s",
        "vs_baseline": round(fps / 30.0, 3),
    }))
    detail.update(fps=round(fps, 2), frame_ms=round(per_frame_s * 1e3, 2),
                  path=path, avg_samples_px=round(avg_samples, 3),
                  init_s=round(init_s), compile_s=round(compile_s),
                  contention=contention,
                  export=os.path.basename(cli.export_dir or "synthetic"))
    print("# detail " + json.dumps(detail), file=sys.stderr)
    if contention:
        print("# WARNING: other busy processes were live during this bench; "
              "the min-of-repeats headline is contention-resistant but "
              "treat per-variant series with care", file=sys.stderr)


if __name__ == "__main__":
    main()
