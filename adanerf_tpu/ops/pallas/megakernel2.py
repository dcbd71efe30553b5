"""Ragged megakernel pipeline (v4): count-sorted rays + per-tile slot
skipping — the full realization of the adaptive savings inside Pallas.

Three steps per frame:
  1. ``oracle_pack`` kernel: ray setup + oracle MLP + adaptive select, emitting
     128-lane packed rows [o | d | z_world(S) | probs(S) | 0... | count]
     (= megakernel.py's front half);
  2. XLA glue: sort rays by live count DESCENDING (one (B,) argsort + one
     aligned row gather — both cheap) and take per-tile maximum counts;
  3. ``shade_sorted`` kernel: per ray tile, slots are processed under
     ``@pl.when(s < tile_max_count)`` — trailing slots of sparse tiles skip
     their encode+MLP entirely. With sorted rays, tile max ≈ tile mean, so
     compute tracks the true adaptive sample count (the CUDA viewer's
     compaction payoff, adaptive_cuda_kernels.cu:301-450).

Semantics match the dense megakernel exactly (the skipped slots are the
all-dead ones).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .megakernel import (_lane_encode, _nerf_mlp, _oracle_mlp,
                         lane_encode_tables, pack_oracle_weights, prep_inputs)
from .select_kernel import _lane_cumsum

LANE = 128
COUNT_LANE = 127


def make_ragged_pipeline(oracle_def, nerf_def, scene, config, tile: int = 256,
                         shade_tile: int = 256, slot_group: int = 1,
                         interpret: bool = False):
    # tile: k1 (oracle+select) ray tile; shade_tile: k2 ray tile. Measured on
    # v5e (800x800, avg 2.9 smp): 256 -> 78.5 ms, 512 -> 97.9, 1024 -> 99.5.
    # Larger shade tiles lose more to coarser @pl.when slot-skip granularity
    # (max count per tile grows with tile size) than the fuller per-slot MXU
    # batch gains — keep shade_tile == tile unless that tradeoff changes.
    # n_pix must be divisible by both tile sizes.
    """Build fn(dirs_pad, pose8, rot_pad) -> (rgb (B, 3), counts (B,))."""
    S = config.numRaymarchSamples[1]
    threshold = float(config.adaptiveSamplingThreshold)
    D = oracle_def.n_out
    cell = 1.0 / D
    args0 = [int(x) for x in config.posEncArgs[0].split('-')]
    args1 = [int(x) for x in config.posEncArgs[1].split('-')]
    fp0, fd0 = args0
    fp1, fd1 = args1
    center = np.asarray(scene.view_cell_center, np.float32)
    radius = float(scene.view_cell_radius)
    sqrt_max_depth = math.sqrt(float(scene.depth_max))
    dr = scene.depth_range_warped
    transform = scene.depth_transform
    acc_alpha = (config.accumulationMult == "alpha")
    assert 6 + 2 * S + 1 <= LANE, "packed row overflow"

    o_tables = lane_encode_tables([([0, 1, 2], fd0), ([3, 4, 5], fp0)])
    n_tables = lane_encode_tables([([0, 1, 2], fp1), ([3, 4, 5], fd1)])

    # ---------------- kernel 1: oracle + select + pack ----------------------
    def k1(dirs_ref, pose_ref, rot_ref, *refs):
        ot = refs[0:5]
        okeys = sorted_oracle_keys
        ow = {k: r for k, r in zip(okeys, refs[5:5 + len(okeys)])}
        out_ref = refs[-1]
        T = tile

        dirs_pad = dirs_ref[:]
        pose = pose_ref[:]
        nds_pad = jnp.dot(dirs_pad, rot_ref[:],
                          preferred_element_type=jnp.float32)
        ndx, ndy, ndz = (nds_pad[:, 0:1], nds_pad[:, 1:2], nds_pad[:, 2:3])
        ox = jnp.broadcast_to(pose[:, 0:1], (T, 1))
        oy = jnp.broadcast_to(pose[:, 1:2], (T, 1))
        oz = jnp.broadcast_to(pose[:, 2:3], (T, 1))
        omcx, omcy, omcz = ox - center[0], oy - center[1], oz - center[2]
        u_dot = ndx * omcx + ndy * omcy + ndz * omcz
        delta = u_dot * u_dot - (omcx ** 2 + omcy ** 2 + omcz ** 2
                                 - radius * radius)
        dist = -u_dot + jnp.sqrt(jnp.maximum(delta, 0.0))
        prx, pry, prz = ox + ndx * dist, oy + ndy * dist, oz + ndz * dist

        zero2 = jnp.zeros((T, 2), jnp.float32)
        coords_o = jnp.concatenate([ndx, ndy, ndz, prx, pry, prz, zero2],
                                   axis=1)
        x0 = _lane_encode(coords_o, *ot)
        d = _oracle_mlp(ow, x0.astype(ow["w0"].dtype), oracle_def.depth)[:, :D]

        iota = jax.lax.broadcasted_iota(jnp.int32, (T, D), 1)
        work = d
        v_k = None
        for _ in range(S):
            v_k = jnp.max(work, axis=1, keepdims=True)
            first = jnp.min(jnp.where(work == v_k, iota, D), axis=1,
                            keepdims=True)
            work = jnp.where(iota == first, jnp.float32(-jnp.inf), work)
        above = d > v_k
        n_above = jnp.sum(above.astype(jnp.int32), axis=1, keepdims=True)
        ties = d == v_k
        tie_rank = _lane_cumsum(ties.astype(jnp.float32)).astype(jnp.int32)
        keep = above | (ties & (tie_rank <= (S - n_above)))
        if threshold > 0.0:
            keep = keep & (d >= threshold)
        any_keep = jnp.any(keep, axis=1, keepdims=True)
        dmax = jnp.max(d, axis=1, keepdims=True)
        am = jnp.min(jnp.where(d == dmax, iota, D), axis=1, keepdims=True)
        keep = keep | (jnp.logical_not(any_keep) & (iota == am))
        rowcum = _lane_cumsum(keep.astype(jnp.float32)).astype(jnp.int32)
        n_per = jnp.sum(keep.astype(jnp.int32), axis=1)

        keep_f = keep.astype(jnp.float32)
        iota_f = iota.astype(jnp.float32)
        z_cols, p_cols = [], []
        for s in range(S):
            sel = keep_f * (rowcum == (s + 1)).astype(jnp.float32)
            bin_s = jnp.sum(iota_f * sel, axis=1, keepdims=True)
            live = (jnp.sum(sel, axis=1, keepdims=True) > 0) \
                .astype(jnp.float32)
            z_cols.append(transform.to_world((bin_s + 0.5) * cell, dr) * live)
            p_cols.append(jnp.sum(d * sel, axis=1, keepdims=True) * live)

        # ray origins in the packed rows are the SPHERE ENTRY points (the
        # shading ray parameterization, features.py:458)
        pad = jnp.zeros((T, LANE - 6 - 2 * S - 1), jnp.float32)
        count = n_per.astype(jnp.float32)[:, None]
        out_ref[:] = jnp.concatenate(
            [prx, pry, prz, ndx, ndy, ndz] + z_cols + p_cols + [pad, count],
            axis=1)

    # ---------------- kernel 2: sorted ragged shade --------------------------
    def k2(maxc_ref, packed_ref, *refs):
        nt = refs[0:5]
        nkeys = sorted_nerf_keys
        nw = {k: r for k, r in zip(nkeys, refs[5:5 + len(nkeys)])}
        out_ref = refs[-2]
        state = refs[-1]  # scratch (T, 128): [r, g, b, trans, 0...]
        T = shade_tile
        i = pl.program_id(0)
        maxc = maxc_ref[i]

        rows = packed_ref[:]
        ox = rows[:, 0:1]
        oy = rows[:, 1:2]
        oz = rows[:, 2:3]
        ndx = rows[:, 3:4]
        ndy = rows[:, 4:5]
        ndz = rows[:, 5:6]

        state[:, 0:3] = jnp.zeros((T, 3), jnp.float32)
        state[:, 3:4] = jnp.ones((T, 1), jnp.float32)

        zero2 = jnp.zeros((T, 2), jnp.float32)
        # slots are processed in groups of `slot_group`: the G slots' encoded
        # inputs stack into ONE (G*T, 128) MLP batch (MXU utilization like
        # the dense megakernel's slot batching), while the transmittance
        # recurrence composites sequentially afterwards. A whole group is
        # skipped when even its first slot index >= the tile's max count;
        # within an executed group, rows lacking a slot have z == 0 and thus
        # live == 0 (a numeric no-op).
        for g0 in range(0, S, slot_group):
            grp = list(range(g0, min(g0 + slot_group, S)))

            @pl.when(g0 < maxc)
            def _(grp=grp):
                encs, lives, zps = [], [], []
                for s in grp:
                    z = rows[:, 6 + s:7 + s]
                    zp = rows[:, 6 + S + s:7 + S + s]
                    live = (z > 0.0).astype(jnp.float32)
                    sx, sy, sz = ox + ndx * z, oy + ndy * z, oz + ndz * z
                    lx = sx - center[0]
                    ly = sy - center[1]
                    lz = sz - center[2]
                    norm = jnp.sqrt(jnp.sqrt(lx * lx + ly * ly + lz * lz))
                    inv = 1.0 / (sqrt_max_depth * jnp.maximum(norm, 1e-12))
                    coords_n = jnp.concatenate(
                        [lx * inv, ly * inv, lz * inv, ndx, ndy, ndz, zero2],
                        axis=1)
                    encs.append(_lane_encode(coords_n, *nt))
                    lives.append(live)
                    zps.append(zp)
                x1 = jnp.concatenate(encs, axis=0) if len(grp) > 1 else encs[0]
                rgb_raw, alpha_raw = _nerf_mlp(nw, x1.astype(nw["w0"].dtype),
                                               nerf_def)
                for j in range(len(grp)):
                    a_j = alpha_raw[j * T:(j + 1) * T, 0:1]
                    r_j = rgb_raw[j * T:(j + 1) * T]
                    sig_a = jax.nn.sigmoid(a_j) * lives[j]
                    if acc_alpha:
                        sig_a = sig_a * zps[j]
                    trans = state[:, 3:4]
                    w_s = sig_a * trans
                    state[:, 0:1] += w_s * jax.nn.sigmoid(r_j[:, 0:1])
                    state[:, 1:2] += w_s * jax.nn.sigmoid(r_j[:, 1:2])
                    state[:, 2:3] += w_s * jax.nn.sigmoid(r_j[:, 2:3])
                    state[:, 3:4] = trans * (1.0 - sig_a + 1e-10)

        out = jnp.concatenate(
            [state[:, 0:3], jnp.zeros((T, LANE - 3), jnp.float32)], axis=1)
        out_ref[:] = out

    sorted_oracle_keys = None
    sorted_nerf_keys = None

    def build(packed_oracle, packed_nerf):
        nonlocal sorted_oracle_keys, sorted_nerf_keys
        sorted_oracle_keys = sorted(packed_oracle.keys())
        sorted_nerf_keys = sorted(packed_nerf.keys())

        def full_specs(tbls, weights, extra_first):
            specs = list(extra_first)
            arrs = []
            for t in tbls:
                specs.append(pl.BlockSpec(t.shape, lambda i, *_: (0, 0),
                                          memory_space=pltpu.VMEM))
                arrs.append(jnp.asarray(t))
            for k, w in weights:
                specs.append(pl.BlockSpec(w.shape, lambda i, *_: (0, 0),
                                          memory_space=pltpu.VMEM))
                arrs.append(w)
            return specs, arrs

        @functools.partial(jax.jit, static_argnames=("stop_after",))
        def run(dirs_pad, pose8, rot_pad, stop_after=None):
            B = dirs_pad.shape[0]
            if B % tile or B % shade_tile:
                raise ValueError(
                    f"n_pix={B} must be divisible by tile={tile} and "
                    f"shade_tile={shade_tile}")
            n_tiles = B // tile

            specs1, arrs1 = full_specs(
                o_tables,
                [(k, packed_oracle[k]) for k in sorted_oracle_keys],
                [pl.BlockSpec((tile, LANE), lambda i, *_: (i, 0),
                              memory_space=pltpu.VMEM),
                 pl.BlockSpec((1, LANE), lambda i, *_: (0, 0),
                              memory_space=pltpu.VMEM),
                 pl.BlockSpec((LANE, LANE), lambda i, *_: (0, 0),
                              memory_space=pltpu.VMEM)])
            packed = pl.pallas_call(
                k1, grid=(n_tiles,), in_specs=specs1,
                out_specs=pl.BlockSpec((tile, LANE), lambda i, *_: (i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((B, LANE), jnp.float32),
                interpret=interpret,
            )(dirs_pad, pose8, rot_pad, *arrs1)

            counts = packed[:, COUNT_LANE].astype(jnp.int32)
            if stop_after == "k1":  # profiling hook
                return packed[:, :3], counts
            order = jnp.argsort(-counts)
            packed_sorted = packed[order]
            if stop_after == "sort":  # profiling hook
                return packed_sorted[:, :3], counts
            n_tiles2 = B // shade_tile
            maxc = jnp.max(packed_sorted[:, COUNT_LANE]
                           .reshape(n_tiles2, shade_tile),
                           axis=1).astype(jnp.int32)

            specs2, arrs2 = full_specs(
                n_tables,
                [(k, packed_nerf[k]) for k in sorted_nerf_keys],
                [pl.BlockSpec((shade_tile, LANE), lambda i, *_: (i, 0),
                              memory_space=pltpu.VMEM)])
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(n_tiles2,),
                in_specs=specs2,
                out_specs=pl.BlockSpec((shade_tile, LANE), lambda i, *_: (i, 0),
                                       memory_space=pltpu.VMEM),
                scratch_shapes=[pltpu.VMEM((shade_tile, LANE), jnp.float32)],
            )
            rgb_sorted = pl.pallas_call(
                k2, grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct((B, LANE), jnp.float32),
                interpret=interpret,
            )(maxc, packed_sorted, *arrs2)

            inv = jnp.argsort(order)
            rgb = rgb_sorted[inv, :3]
            return rgb, counts

        return run

    return build
