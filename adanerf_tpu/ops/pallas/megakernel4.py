"""Supertile megakernel (v6): v5's in-tile compaction restructured around
three measured bottlenecks (BENCH.md round-2 stage ledger):

1. **Supertile front half.** v5's 256-ray tiles run the oracle MLP at ~34%
   MXU (deep chains of small matmuls are latency-bound) and issue the
   select/setup VPU ops 2500 times/frame. v6 processes ``tile`` = 1024 rays
   per grid step: 4x fewer op issues, 4x larger MXU batches, identical math.

2. **Windowed compaction.** The one-hot gather's compare cost scales with
   (chunk x tile), which is why v5 could not grow its tiles. Every ray
   keeps >= 1 sample, so chunk k's samples always come from <= chunk+1
   CONSECUTIVE rays starting at r_k = #(cum_incl <= k*chunk); the masks are
   built against a ``pl.ds``-sliced window of W=chunk+128 rays, making the
   per-chunk cost independent of the supertile size. The scatter reuses the
   SAME mask through a contract-dim-0 ``dot_general`` (v5 built a second,
   transposed mask).

3. **Dynamic-trip chunk loop.** v5 unrolled S*tile/chunk ``@pl.when``-gated
   regions; Mosaic scheduling across the gates was a measured residual cost
   and code size grew with the unroll. v6 runs ONE ``fori_loop`` body with
   the trip count ceil(sum(count)/chunk) — work is exactly proportional to
   live samples, with no gates.

Everything else — lane-packed encodes, hi/lo split precision scheme, the
sort-free select, per-slot z/p packing, the S-step composite — is shared
with or identical to v5 (megakernel3.py); outputs match v5 exactly in fp32
(tests/test_megakernel4.py).

TPU counterpart of adaptive_cuda_kernels.cu:301-450 +
imagegenerator.cpp:336-344, as in v5.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .megakernel import (_lane_cumsum, _lane_encode, _nerf_mlp, _oracle_mlp,
                         lane_encode_tables)

LANE = 128
_PRECISIONS = {"default": jax.lax.Precision.DEFAULT,
               "highest": jax.lax.Precision.HIGHEST}


def make_megakernel_supertile(oracle_def, nerf_def, scene, config,
                              tile: int = 1024, chunk: int = 256,
                              window: int = None, block: int = 256,
                              interpret: bool = False,
                              precision: str = "default",
                              dyn_loop: bool = True,
                              pipelined: bool = True,
                              no_shade: bool = False, no_encode: bool = False,
                              hybrid: bool = False, hybrid_beta: float = 2.2,
                              stop_after: str = ""):
    """Build fn(packed_oracle, packed_nerf) -> run(dirs_pad, pose8, rot_pad)
    -> (B, 128) rows [r, g, b, count, 0...]. Same contract as
    megakernel3.make_megakernel_compact."""
    if getattr(config, "useNDC", False) is True:
        raise ValueError("NDC scenes: only the v5 megakernel implements the "
                         "NDC ray transform (megakernel3.py)")
    S = config.numRaymarchSamples[1]
    threshold = float(config.adaptiveSamplingThreshold)
    D = oracle_def.n_out
    cell = 1.0 / D
    fp0, fd0 = [int(x) for x in config.posEncArgs[0].split('-')]
    fp1, fd1 = [int(x) for x in config.posEncArgs[1].split('-')]
    center = np.asarray(scene.view_cell_center, np.float32)
    radius = float(scene.view_cell_radius)
    sqrt_max_depth = math.sqrt(float(scene.depth_max))
    dr = scene.depth_range_warped
    transform = scene.depth_transform
    acc_alpha = (config.accumulationMult == "alpha")

    block = min(block, tile)
    assert tile % block == 0, (tile, block)
    # window must cover the <= chunk+1 rays a chunk can span, 8-aligned
    # start; window=0 disables windowing (full-tile masks, v5-style)
    full_mask = window == 0
    W = (chunk + LANE) if window in (None, 0) else window
    if full_mask:
        W = 0
    else:
        assert W >= chunk + 16 and W % 8 == 0, (W, chunk)
    n_chunks_max = (S * tile + chunk - 1) // chunk
    assert n_chunks_max <= LANE, n_chunks_max
    assert 8 * S <= LANE

    prec = _PRECISIONS[precision]
    use_split = precision == "default"
    pw = 8 if use_split else 4
    o_tables = lane_encode_tables([([0, 1, 2], fd0), ([3, 4, 5], fp0)])
    n_tables = lane_encode_tables([([0, 1, 2], fp1), ([3, 4, 5], fd1)])
    tril_b = np.tril(np.ones((block, block), np.float32), k=-1)
    tile_pw_c = np.tile(np.eye(pw, dtype=np.float32), (1, S))
    expand_s_c = np.kron(np.eye(S, dtype=np.float32),
                         np.ones((1, pw), np.float32))

    HW = 16 if (S + 7) <= 16 else 32
    V = 2 * HW

    def kernel(dirs_ref, pose_ref, rot_ref, tril_ref,
               tile_pw_ref, expand_s_ref, *wrefs):
        ot = wrefs[0:5]
        nt = wrefs[5:10]
        wrefs = wrefs[10:]
        n_ow = len(_ORACLE_KEYS)
        n_scr = 8 if pipe else 5
        ow = {k: r for k, r in zip(_ORACLE_KEYS, wrefs[:n_ow])}
        nw = {k: r for k, r in zip(_NERF_KEYS, wrefs[n_ow:-n_scr])}
        scr = wrefs[-n_scr:]
        out_ref = scr[0]
        acc_ref = scr[1]   # (tile+W, pw*S) f32: per-slot raw rgba
        keep_ref = scr[2]  # (tile, max(D, 2S)) f32: select + z/p carry
        vals_ref = scr[3]  # (tile+W, V) f32: hi/lo packed gather payload
        cum_ref = scr[4]   # (tile+W, 8) f32: [cum_excl, cum_incl, ...]
        if pipe:
            # double buffers: stage A (masks/gather/mid/encode, VPU-heavy)
            # for chunk k+1 is issued BEFORE stage B (MLP/scatter, MXU-
            # heavy) of chunk k, so the scheduler can overlap the units
            x1_ref = scr[5]     # (2, chunk, LANE) encode output
            sm_ref = scr[6]     # (2, chunk, S) slot mask
            mk_ref = scr[7]     # (2, Wm, chunk) bf16 scatter/gather mask

        T = tile
        dirs_pad = dirs_ref[:]
        pose = pose_ref[:]

        # ---- front half (identical math to v5, at supertile batch) ----
        nds_pad = jnp.dot(dirs_pad, rot_ref[:],
                          preferred_element_type=jnp.float32)
        nds3 = nds_pad[:, 0:3]
        o3 = jnp.broadcast_to(pose[:, 0:3], (T, 3))
        lane3 = jax.lax.broadcasted_iota(jnp.int32, (1, 3), 1)
        center3 = jnp.where(
            lane3 == 0, jnp.float32(center[0]),
            jnp.where(lane3 == 1, jnp.float32(center[1]),
                      jnp.float32(center[2])))
        omc3 = o3 - center3
        u_dot = jnp.sum(nds3 * omc3, axis=1, keepdims=True)
        delta = u_dot * u_dot - (jnp.sum(omc3 * omc3, axis=1, keepdims=True)
                                 - radius * radius)
        dist = -u_dot + jnp.sqrt(jnp.maximum(delta, 0.0))
        proj3 = o3 + nds3 * dist

        zero2 = jnp.zeros((T, 2), jnp.float32)
        coords_o = jnp.concatenate([nds3, proj3, zero2], axis=1)
        x0 = _lane_encode(coords_o, *ot)
        d = _oracle_mlp(ow, x0.astype(ow["w0"].dtype), oracle_def.depth)[:, :D]

        if stop_after == "oracle":
            out_ref[:] = d[:, :LANE] if D >= LANE else jnp.concatenate(
                [d, jnp.zeros((T, LANE - D), jnp.float32)], axis=1)
            return

        iota = jax.lax.broadcasted_iota(jnp.int32, (T, D), 1)
        if threshold > 0.0:
            # top-S cap fast path, gated per 256-row SUB-BLOCK: one ray over
            # the cap only sends its own block down the S argmax rounds
            # (tile-level gating at supertile sizes took the slow path almost
            # always — measured 12.7 ms vs 3.6 ms select at tile=512)
            G = min(T, 256)
            iota_g = jax.lax.broadcasted_iota(jnp.int32, (G, D), 1)
            for b in range(T // G):
                lo = b * G
                db = d[lo:lo + G]
                over = jnp.max(jnp.sum((db >= threshold).astype(jnp.int32),
                                       axis=1))
                needs_topk = over > S

                @pl.when(needs_topk)
                def _(db=db, lo=lo):
                    work = db
                    v_k = None
                    for _ in range(S):
                        v_k = jnp.max(work, axis=1, keepdims=True)
                        first = jnp.min(jnp.where(work == v_k, iota_g, D),
                                        axis=1, keepdims=True)
                        work = jnp.where(iota_g == first,
                                         jnp.float32(-jnp.inf), work)
                    above = db > v_k
                    n_above = jnp.sum(above.astype(jnp.int32), axis=1,
                                      keepdims=True)
                    ties = db == v_k
                    tie_rank = _lane_cumsum(
                        ties.astype(jnp.float32)).astype(jnp.int32)
                    kb = above | (ties & (tie_rank <= (S - n_above)))
                    keep_ref[lo:lo + G, :D] = \
                        (kb & (db >= threshold)).astype(jnp.float32)

                @pl.when(jnp.logical_not(needs_topk))
                def _(db=db, lo=lo):
                    keep_ref[lo:lo + G, :D] = \
                        (db >= threshold).astype(jnp.float32)

            keep = keep_ref[:, :D] > 0.0
        else:
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
        any_keep = jnp.any(keep, axis=1, keepdims=True)
        dmax = jnp.max(d, axis=1, keepdims=True)
        am = jnp.min(jnp.where(d == dmax, iota, D), axis=1, keepdims=True)
        keep = keep | (jnp.logical_not(any_keep) & (iota == am))
        rowcum = _lane_cumsum(keep.astype(jnp.float32)).astype(jnp.int32)
        n_per = jnp.sum(keep.astype(jnp.int32), axis=1)

        if stop_after == "select":
            out_ref[:] = jnp.broadcast_to(
                n_per.astype(jnp.float32)[:, None], (T, LANE))
            return

        keep_f = keep.astype(jnp.float32)
        iota_f = iota.astype(jnp.float32)
        rank = rowcum.astype(jnp.float32) * keep_f
        n_per_col = n_per.astype(jnp.float32)[:, None]
        max_n = jnp.max(n_per_col)

        def build_zp(n_slots):
            cols = []
            for s in range(n_slots):
                sel = (rank == (s + 1)).astype(jnp.float32)
                bin_s = jnp.sum(iota_f * sel, axis=1, keepdims=True)
                live = (n_per_col > s).astype(jnp.float32)
                cols.append(transform.to_world((bin_s + 0.5) * cell, dr)
                            * live)
            for s in range(n_slots):
                sel = (rank == (s + 1)).astype(jnp.float32)
                cols.append(jnp.sum(d * sel, axis=1, keepdims=True))
            pads = [] if n_slots == S else \
                [jnp.zeros((T, S - n_slots), jnp.float32)]
            keep_ref[:, :2 * S] = jnp.concatenate(
                cols[:n_slots] + pads + cols[n_slots:] + pads, axis=1)

        if S > 4:
            @pl.when(max_n <= 2.0)
            def _():
                build_zp(2)

            @pl.when(jnp.logical_and(max_n > 2.0, max_n <= 4.0))
            def _():
                build_zp(4)

            @pl.when(max_n > 4.0)
            def _():
                build_zp(S)
        else:
            build_zp(S)
        z_cols = [keep_ref[:, s:s + 1] for s in range(S)]
        p_cols = [keep_ref[:, S + s:S + s + 1] for s in range(S)]

        if stop_after == "zcols":
            out_ref[:] = jnp.concatenate(
                z_cols + p_cols
                + [jnp.zeros((T, LANE - 2 * S), jnp.float32)], axis=1)
            return

        c = n_per.astype(jnp.float32)[:, None]                   # (T, 1)
        pad = jnp.zeros((T, LANE - 4), jnp.float32)
        center_row = jnp.where(
            lane3 == 0, jnp.float32(center[0]),
            jnp.where(lane3 == 1, jnp.float32(center[1]),
                      jnp.float32(center[2])))

        # ---- hybrid dense fast path ------------------------------------
        # Real workloads are dominated by count-UNIFORM(ish) tiles (sky and
        # flat surfaces keep 1 sample; at-cap reference scenes keep exactly
        # S_eff everywhere). For a tile whose max count m is small, shading
        # m dense slots straight from z_cols (v3-style: no masks, no
        # gather, no per-sample machinery) beats the compaction loop, whose
        # measured cost is ~hybrid_beta x the pure-MLP time of its live
        # samples. Chosen per tile: dense iff m*T <= hybrid_beta*sum(c).
        # DEFAULT OFF: measured +40 ms/frame even when the dense branch is
        # never taken — the extra gated region poisons Mosaic's schedule
        # (round-3; exact-match tests keep both paths honest).
        hybrid_on = hybrid and not stop_after and not (no_shade or no_encode)
        zero2t = jnp.zeros((T, 2), jnp.float32)

        def dense_path(m):
            xs = []
            for sl in range(m):
                spos = proj3 + nds3 * z_cols[sl]
                lv = spos - center_row
                nrm = jnp.sqrt(jnp.sqrt(
                    jnp.sum(lv * lv, axis=1, keepdims=True)))
                inv = 1.0 / (sqrt_max_depth * jnp.maximum(nrm, 1e-12))
                coords = jnp.concatenate([lv * inv, nds3, zero2t], axis=1)
                xs.append(_lane_encode(coords, *nt).astype(nw["w0"].dtype))
            x_all = jnp.concatenate(xs, axis=0)                  # (m*T, 128)
            rgb_raw, alpha_raw = _nerf_mlp(nw, x_all, nerf_def)
            trans = jnp.ones((T, 1), jnp.float32)
            acc_rgb = jnp.zeros((T, 3), jnp.float32)
            for sl in range(m):
                live = (c > jnp.float32(sl)).astype(jnp.float32)
                rgba_s = jnp.concatenate(
                    [rgb_raw[sl * T:(sl + 1) * T, 0:3],
                     alpha_raw[sl * T:(sl + 1) * T, 0:1]], axis=1)
                sig = jax.nn.sigmoid(rgba_s)
                sig_a = sig[:, 3:4] * live
                if acc_alpha:
                    sig_a = sig_a * p_cols[sl]
                w_s = sig_a * trans
                trans = trans * (1.0 - sig_a + 1e-10)
                acc_rgb = acc_rgb + w_s * sig[:, 0:3]
            out_ref[:] = jnp.concatenate([acc_rgb, c, pad], axis=1)

        any_dense = jnp.bool_(False)
        if hybrid_on:
            dense_ms = [m for m in (1, 2, 4) if m <= S]
            maxc_t = jnp.max(c)
            sum_c = jnp.sum(c)
            prev = jnp.float32(0.0)
            for m in dense_ms:
                cond = jnp.logical_and(
                    jnp.logical_and(maxc_t > prev, maxc_t <= jnp.float32(m)),
                    jnp.float32(m * T) <= hybrid_beta * sum_c)
                any_dense = jnp.logical_or(any_dense, cond)
                prev = jnp.float32(m)

                @pl.when(cond)
                def _(m=m):
                    dense_path(m)

        def compact_path():
            # ---- compaction bookkeeping (supertile) ----
            # cum over T rays: block-local tril matmuls + scalar block offsets
            # (all-f32, exact; avoids a (T, T) constant)
            cum_blocks = []
            offset = jnp.float32(0.0)
            for b in range(T // block):
                cb = c[b * block:(b + 1) * block]
                cum_blocks.append(
                    jnp.dot(tril_ref[:], cb, preferred_element_type=jnp.float32)
                    + offset)
                offset = offset + jnp.sum(cb)
            cum_excl = jnp.concatenate(cum_blocks, axis=0)           # (T, 1)
            cum_incl = cum_excl + c
            total = offset                                            # scalar

            # hi/lo packed per-ray gather payload (identical layout to v5)
            def split2(v):
                hi = v.astype(jnp.bfloat16).astype(jnp.float32)
                return hi, v - hi

            o_hi, o_lo = split2(proj3)
            z_p = [split2(z) for z in z_cols]
            d_hi, d_lo = split2(nds3)
            cum_hi = jnp.floor(cum_excl * (1.0 / 128.0))
            cum_lo = cum_excl - cum_hi * 128.0
            padh = jnp.zeros((T, HW - (S + 7)), jnp.float32)
            vals_ref[0:T, :] = jnp.concatenate(
                [o_hi] + [p[0] for p in z_p] + [cum_hi * 128.0, d_hi, padh,
                 o_lo] + [p[1] for p in z_p] + [cum_lo, d_lo, padh], axis=1)
            pad6 = jnp.zeros((T, 6), jnp.float32)
            cum_ref[0:T, :] = jnp.concatenate([cum_excl, cum_incl, pad6], axis=1)
            if not full_mask:
                vals_ref[T:T + W, :] = jnp.zeros((W, V), jnp.float32)
                cum_ref[T:T + W, :] = jnp.zeros((W, 8), jnp.float32)
            acc_ref[:, :] = jnp.zeros((T + W, pw * S), jnp.float32)

            # per-chunk window starts, 8-aligned, all at once: r_k = #{incl<=kC}
            kgrid = jax.lax.broadcasted_iota(
                jnp.int32, (1, n_chunks_max), 1).astype(jnp.float32) * chunk
            r_all = jnp.sum((cum_incl <= kgrid).astype(jnp.float32), axis=0,
                            keepdims=True)                           # (1, NC)
            r8_all = jnp.floor(r_all * 0.125) * 8.0
            klane = jax.lax.broadcasted_iota(jnp.int32, (1, n_chunks_max), 1)

            # loop-invariant pieces
            jlane_base = jax.lax.broadcasted_iota(
                jnp.int32, (T if full_mask else W, chunk), 1).astype(jnp.float32)
            jcol_base = jax.lax.broadcasted_iota(
                jnp.int32, (chunk, 1), 0).astype(jnp.float32)
            slot_iota = jax.lax.broadcasted_iota(
                jnp.int32, (1, S), 1).astype(jnp.float32)
            tile_pw = tile_pw_ref[:]
            expand_s = expand_s_ref[:]

            def r8_of(k):
                return jnp.sum(jnp.where(klane == k, r8_all, 0.0)) \
                    .astype(jnp.int32)

            def stage_a(k):
                """Masks + compact gather + per-sample geometry + encode
                (VPU-dominated); returns (onehotT, smask, x1)."""
                kf = jnp.asarray(k, jnp.float32)
                if full_mask:
                    wvals = vals_ref[:, :]                           # (T, V)
                    excl_col = cum_ref[:, 0:1]
                    incl_col = cum_ref[:, 1:2]
                else:
                    r8i = r8_of(k)
                    wvals = vals_ref[pl.ds(r8i, W), :]               # (W, V)
                    excl_col = cum_ref[pl.ds(r8i, W), 0:1]           # (W, 1)
                    incl_col = cum_ref[pl.ds(r8i, W), 1:2]

                # ONE mask, built transposed (window rays as sublanes, chunk
                # rows as lanes): column cum vs lane iota — no row-orientation
                # matmul needed, and both the gather (contract-dim-0) and the
                # scatter (standard) consume it directly.
                jlane = jlane_base + kf * chunk                      # (W, chunk)
                onehotT = ((jlane >= excl_col)
                           & (jlane < incl_col)).astype(jnp.float32)
                cvals = jax.lax.dot_general(
                    onehotT, wvals, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=prec)                                  # (chunk, V)
                g = cvals[:, 0:HW] + cvals[:, HW:2 * HW]
                co = g[:, 0:3]
                zpieces = g[:, 3:3 + S]
                ccum = g[:, 3 + S:4 + S]
                cd = g[:, 4 + S:7 + S]
                jcol = jcol_base + kf * chunk
                s_j = jcol - ccum
                smask = (s_j == slot_iota).astype(jnp.float32)       # (chunk, S)
                z_sel = jnp.sum(zpieces * smask, axis=1, keepdims=True)

                spos = co + cd * z_sel
                l = spos - center_row
                norm = jnp.sqrt(jnp.sqrt(
                    jnp.sum(l * l, axis=1, keepdims=True)))
                inv = 1.0 / (sqrt_max_depth * jnp.maximum(norm, 1e-12))
                zero2c = jnp.zeros((chunk, 2), jnp.float32)
                coords_n = jnp.concatenate([l * inv, cd, zero2c], axis=1)
                if no_encode:  # profiling hook: loop machinery w/o encode+MLP
                    x1 = jnp.concatenate(
                        [coords_n, jnp.zeros((chunk, LANE - 8), jnp.float32)],
                        axis=1)
                else:
                    x1 = _lane_encode(coords_n, *nt)
                return onehotT, smask, x1

            def stage_b(k, onehotT, smask, x1):
                """Shading MLP + slot payload + scatter (MXU-dominated)."""
                if no_shade or no_encode:  # profiling hooks: skip the MLP
                    rgba = x1[:, 0:4]
                else:
                    rgb_raw, alpha_raw = _nerf_mlp(
                        nw, x1.astype(nw["w0"].dtype), nerf_def)
                    rgba = jnp.concatenate(
                        [rgb_raw[:, 0:3], alpha_raw[:, 0:1]], axis=1)
                if use_split:
                    rg_hi = rgba.astype(jnp.bfloat16).astype(jnp.float32)
                    rgba = jnp.concatenate([rg_hi, rgba - rg_hi], axis=1)
                payload = jnp.dot(rgba, tile_pw,
                                  preferred_element_type=jnp.float32,
                                  precision=prec) \
                    * jnp.dot(smask, expand_s,
                              preferred_element_type=jnp.float32)    # (chunk, pwS)
                # scatter through the SAME mask (standard orientation)
                delta = jnp.dot(onehotT.astype(jnp.float32), payload,
                                preferred_element_type=jnp.float32,
                                precision=prec)
                if full_mask:
                    acc_ref[:, :] = acc_ref[:, :] + delta            # (T, pw*S)
                else:
                    r8i = r8_of(k)
                    acc_ref[pl.ds(r8i, W), :] = \
                        acc_ref[pl.ds(r8i, W), :] + delta            # (W, pw*S)

            def chunk_body(k, _):
                a, sm, x1 = stage_a(k)
                stage_b(k, a, sm, x1)
                return 0

            n_live = jnp.ceil(total * (1.0 / chunk)).astype(jnp.int32)
            if dyn_loop and pipe:
                # software pipeline: fill slot 0, then each iteration ISSUES
                # stage A for chunk k+1 (independent VPU work into the other
                # buffer slot) before stage B consumes chunk k's buffers
                def fill(j):
                    a, sm, x1 = stage_a(j)
                    jm = jax.lax.rem(j, 2)
                    mk_ref[jm] = a.astype(jnp.bfloat16)
                    sm_ref[jm] = sm
                    x1_ref[jm] = x1.astype(x1_ref.dtype)

                fill(0)

                def pipe_body(k, _):
                    @pl.when(k + 1 < n_live)
                    def _():
                        fill(k + 1)
                    km = jax.lax.rem(k, 2)
                    stage_b(k, mk_ref[km], sm_ref[km], x1_ref[km])
                    return 0

                jax.lax.fori_loop(0, n_live, pipe_body, 0)
            elif dyn_loop:
                jax.lax.fori_loop(0, n_live, chunk_body, 0)
            else:
                for k in range(n_chunks_max):
                    @pl.when(jnp.float32(k * chunk) < total)
                    def _(k=k):
                        chunk_body(k, 0)


        if hybrid_on:
            @pl.when(jnp.logical_not(any_dense))
            def _():
                compact_path()
        else:
            compact_path()

        if stop_after == "compact":
            out_ref[:] = jnp.concatenate(
                [acc_ref[0:T, :],
                 jnp.zeros((T, LANE - pw * S), jnp.float32)], axis=1)
            return

        # ---- composite: v5's exact S-step recurrence, tile-gated ----
        def composite(n_slots):
            trans = jnp.ones((T, 1), jnp.float32)
            acc_rgb = jnp.zeros((T, 3), jnp.float32)
            for s in range(n_slots):
                live = (c > jnp.float32(s)).astype(jnp.float32)
                rgba_s = acc_ref[0:T, pw * s:pw * s + 4]
                if use_split:
                    rgba_s = rgba_s + acc_ref[0:T, pw * s + 4:pw * s + 8]
                sig = jax.nn.sigmoid(rgba_s)
                sig_a = sig[:, 3:4] * live
                if acc_alpha:
                    sig_a = sig_a * p_cols[s]
                w_s = sig_a * trans
                trans = trans * (1.0 - sig_a + 1e-10)
                acc_rgb = acc_rgb + w_s * sig[:, 0:3]
            out_ref[:] = jnp.concatenate([acc_rgb, c, pad], axis=1)

        def composite_gated():
            if S > 4:
                max_c = jnp.max(c)

                @pl.when(max_c <= 2.0)
                def _():
                    composite(2)

                @pl.when(jnp.logical_and(max_c > 2.0, max_c <= 4.0))
                def _():
                    composite(4)

                @pl.when(max_c > 4.0)
                def _():
                    composite(S)
            else:
                composite(S)

        if hybrid_on:
            @pl.when(jnp.logical_not(any_dense))
            def _():
                composite_gated()
        else:
            composite_gated()

    _ORACLE_KEYS = None
    _NERF_KEYS = None
    x1_dtype = jnp.float32
    pipe = dyn_loop and pipelined

    def build(packed_oracle, packed_nerf):
        nonlocal _ORACLE_KEYS, _NERF_KEYS, x1_dtype
        _ORACLE_KEYS = sorted(packed_oracle.keys())
        _NERF_KEYS = sorted(packed_nerf.keys())
        # buffered encodes carry the dtype the MLP consumes (bf16 in prod,
        # f32 in the fp32 interpret tests -> buffering changes no numerics)
        x1_dtype = packed_nerf["w0"].dtype

        @jax.jit
        def run(dirs_pad, pose8, rot_pad):
            B = dirs_pad.shape[0]
            in_specs = [pl.BlockSpec((tile, LANE), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((1, LANE), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((LANE, LANE), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((block, block), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec(tile_pw_c.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec(expand_s_c.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM)]
            ws = []
            for tbl in list(o_tables) + list(n_tables):
                in_specs.append(pl.BlockSpec(tbl.shape, lambda i: (0, 0),
                                             memory_space=pltpu.VMEM))
                ws.append(jnp.asarray(tbl))
            for k in _ORACLE_KEYS:
                w = packed_oracle[k]
                in_specs.append(pl.BlockSpec(w.shape, lambda i: (0, 0),
                                             memory_space=pltpu.VMEM))
                ws.append(w)
            for k in _NERF_KEYS:
                w = packed_nerf[k]
                in_specs.append(pl.BlockSpec(w.shape, lambda i: (0, 0),
                                             memory_space=pltpu.VMEM))
                ws.append(w)
            return pl.pallas_call(
                kernel,
                grid=(B // tile,),
                in_specs=in_specs,
                out_specs=pl.BlockSpec((tile, LANE), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((B, LANE), jnp.float32),
                scratch_shapes=[
                    pltpu.VMEM((tile + W, pw * S), jnp.float32),
                    pltpu.VMEM((tile, max(D, 2 * S)), jnp.float32),
                    pltpu.VMEM((tile + W, V), jnp.float32),
                    pltpu.VMEM((tile + W, 8), jnp.float32)] + ([
                    pltpu.VMEM((2, chunk, LANE), x1_dtype),
                    pltpu.VMEM((2, chunk, S), jnp.float32),
                    pltpu.VMEM((2, tile if full_mask else W, chunk),
                               jnp.bfloat16)] if pipe else []),
                interpret=interpret,
            )(jnp.asarray(dirs_pad), pose8, rot_pad, jnp.asarray(tril_b),
              jnp.asarray(tile_pw_c), jnp.asarray(expand_s_c), *ws)

        return run

    return build
