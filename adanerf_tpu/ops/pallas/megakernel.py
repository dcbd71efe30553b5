"""Fused frame "megakernel": the whole AdaNeRF inference pipeline — ray
setup, oracle MLP, adaptive select, shading MLP at every slot, and per-ray
compositing — as ONE Pallas kernel over ray tiles, with both networks'
weights resident in VMEM for the kernel's lifetime.

This is the TPU counterpart of the viewer's whole-frame CUDA+TensorRT loop
(imagegenerator.cpp:247-478) collapsed into a single launch: HBM traffic is
one read of the camera-space dirs and one write of the rgb tile; everything
else lives in VMEM.

v1 evaluates the shading MLP at ALL max_samples slots (dead slots masked in
the composite) — the XLA pipeline's compaction is replaced by raw fusion.
v2 (planned) sorts rays by live count so sample COLUMNS become
prefix-dense and whole columns can be skipped per tile via scalar-prefetched
counts.

Status (round 1): exactly matches the XLA pipeline in interpret mode
(tests/test_megakernel.py); on v5e it compiles in ~4 min (the TRT-build
analog) but runs at 733 ms/frame vs the XLA pipeline's 154 ms — the
fori_loop-serialized slots and (tile,1)-column scalar plumbing waste the VPU.
Round-2 work: bf16 intermediates, (tile, 8)-batched slot math, column
skipping with count-sorted rays.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _lane_cumsum(x_f32):
    """Inclusive cumsum along the 128-lane axis as one MXU matmul with an
    upper-triangular ones matrix (Pallas TPU has no cumsum lowering)."""
    T, D = x_f32.shape
    rows = jax.lax.broadcasted_iota(jnp.int32, (D, D), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (D, D), 1)
    tri = (rows <= cols).astype(jnp.float32)
    return jnp.dot(x_f32, tri, preferred_element_type=jnp.float32)


def _pad_to(x, rows, cols):
    return jnp.zeros((rows, cols), x.dtype).at[:x.shape[0], :x.shape[1]].set(x)


def _batcher_network(n):
    """Batcher odd-even mergesort comparator list for n elements.

    5 comparators at n=4, 19 at n=8, 63 at n=16 — the kernel's slot sort
    runs each comparator as ONE narrow (T, 4) compare-exchange, so
    restoring bin order after the pair-harvested select costs ~3 vector
    ops per comparator instead of the 3 (T,128)-wide reductions per slot
    of the mask-extraction form."""
    net = []
    p = 1
    while p < n:
        k = p
        while k >= 1:
            for j in range(k % p, n - k, 2 * k):
                for i in range(0, min(k, n - j - k)):
                    if (i + j) // (2 * p) == (i + j + k) // (2 * p):
                        net.append((i + j, i + j + k))
            k //= 2
        p *= 2
    return net


def pack_nerf_weights(nerf_def, params, dtype=jnp.bfloat16):
    """Pad/split the NeRF param pytree into MXU-aligned matrices for the
    in-kernel shading MLP (``_nerf_mlp``).

    The skip connection (concat at layer `skip`, models.py:260-261) is
    algebraically split into two matmuls (``[x, h] @ W == x @ W_x + h @ W_h``)
    so every operand keeps 128-multiple shapes; inputs/weight rows are
    zero-padded, which leaves results exact. Returns bf16 matrices + fp32
    bias rows, all of whose dims are multiples of 128.
    """
    W = nerf_def.width
    in_ch = nerf_def.input_ch
    in_views = nerf_def.input_ch_views
    skips = set(nerf_def.skips)
    in_pad = LANE * math.ceil((in_ch + in_views) / LANE)

    packed = {}
    w0 = params["pts"][0]["w"].astype(dtype)
    packed["w0"] = _pad_to(w0, in_pad, W)
    packed["b0"] = params["pts"][0]["b"].astype(jnp.float32).reshape(1, W)

    for i in range(1, nerf_def.depth):
        p = params["pts"][i]
        w = p["w"].astype(dtype)
        if (i - 1) in skips:
            # reference concat order is [input_pts, h] (models.py:261)
            packed[f"wx{i}"] = _pad_to(w[:in_ch], in_pad, W)
            packed[f"wh{i}"] = w[in_ch:]
        else:
            packed[f"wh{i}"] = w
        packed[f"b{i}"] = p["b"].astype(jnp.float32).reshape(1, W)

    half = W // 2
    half_pad = LANE * math.ceil(half / LANE)
    packed["wa"] = _pad_to(params["alpha"]["w"].astype(dtype), W, LANE)
    packed["ba"] = _pad_to(
        params["alpha"]["b"].astype(jnp.float32).reshape(1, 1), 1, LANE)
    packed["wf"] = params["feature"]["w"].astype(dtype)
    packed["bf"] = params["feature"]["b"].astype(jnp.float32).reshape(1, W)
    # views layer input is [feature W | dirs in_views] (models.py:266)
    wv = params["views"][0]["w"].astype(dtype)
    packed["wv_f"] = _pad_to(wv[:W], W, half_pad)
    wv_d = jnp.zeros((in_pad, half_pad), dtype)
    wv_d = wv_d.at[in_ch:in_ch + in_views, :half].set(wv[W:W + in_views])
    packed["wv_d"] = wv_d
    packed["bv"] = _pad_to(params["views"][0]["b"].astype(jnp.float32)
                           .reshape(1, half), 1, half_pad)
    packed["wrgb"] = _pad_to(params["rgb"]["w"].astype(dtype), half_pad, LANE)
    packed["brgb"] = _pad_to(params["rgb"]["b"].astype(jnp.float32)
                             .reshape(1, 3), 1, LANE)
    return packed


def pack_oracle_weights(oracle_def, params, dtype=jnp.bfloat16):
    """BaseNet weights padded to 128-multiples: w0 (in_pad, W), wh_i, bias."""
    packed = {}
    n_in = oracle_def.n_in
    in_pad = LANE * math.ceil(n_in / LANE)
    w0 = params[0]["w"].astype(dtype)
    packed["w0"] = jnp.zeros((in_pad, oracle_def.width), dtype) \
        .at[:n_in].set(w0)
    packed["b0"] = params[0]["b"].astype(jnp.float32).reshape(1, -1)
    for i in range(1, oracle_def.depth):
        packed[f"w{i}"] = params[i]["w"].astype(dtype)
        packed[f"b{i}"] = params[i]["b"].astype(jnp.float32).reshape(1, -1)
    return packed


def _mm(h, wref, dtype, split):
    """One MLP matmul. split=True runs f32 activations through TWO
    single-pass matmuls over a hi/lo bf16 decomposition (~17 activation
    mantissa bits); weight rounding stays single-piece — measured at only
    0.023 dB (tools/precision_study.py), while ACTIVATION rounding carried
    the kernel's round-2 PSNR deficit vs the fp32 XLA path (which keeps
    f32 activations between layers)."""
    if split and dtype != jnp.float32:
        hi = h.astype(dtype)
        lo = (h - hi.astype(jnp.float32)).astype(dtype)
        return jnp.dot(hi, wref[:], preferred_element_type=jnp.float32) \
            + jnp.dot(lo, wref[:], preferred_element_type=jnp.float32)
    return jnp.dot(h.astype(dtype), wref[:],
                   preferred_element_type=jnp.float32)


def _oracle_mlp(w, x, depth, split=False):
    """x: (N, in_pad) f32 encoded rows; returns (N, n_out) f32 logits."""
    dtype = w["w0"].dtype
    h = _mm(x, w["w0"], dtype, split) + w["b0"][:]
    h = jax.nn.relu(h)
    for i in range(1, depth):
        h = _mm(h, w[f"w{i}"], dtype, split) + w[f"b{i}"][:]
        if i + 1 < depth:
            h = jax.nn.relu(h)
    return h


def _nerf_mlp(w, x, nerf_def, split=False):
    """x: (N, in_pad) f32 [pos | dirs | 0]; returns (N, 4ish) f32 raw."""
    dtype = w["w0"].dtype
    skips = set(nerf_def.skips)
    h = _mm(x, w["w0"], dtype, split) + w["b0"][:]
    h = jax.nn.relu(h)
    for i in range(1, nerf_def.depth):
        hi = _mm(h, w[f"wh{i}"], dtype, split)
        if (i - 1) in skips:
            hi = hi + _mm(x, w[f"wx{i}"], dtype, split)
        h = jax.nn.relu(hi + w[f"b{i}"][:])
    alpha = _mm(h, w["wa"], dtype, split) + w["ba"][:]
    feat = _mm(h, w["wf"], dtype, split) + w["bf"][:]
    hv = _mm(feat, w["wv_f"], dtype, split) \
        + _mm(x, w["wv_d"], dtype, split) + w["bv"][:]
    hv = jax.nn.relu(hv)
    rgb = _mm(hv, w["wrgb"], dtype, split) + w["brgb"][:]
    return rgb, alpha


def _freq_encode_cols(x_cols, n_freqs):
    """x_cols: list of (N, 1) coordinate columns -> (N, C*(2F+1)) encoding
    in [x, sin f0 x, cos f0 x, ...] layout matching ops.encoding."""
    outs = list(x_cols)
    for f in (2.0 ** np.arange(n_freqs)).astype(np.float32):
        for c in x_cols:
            outs.append(jnp.sin(c * f))
        for c in x_cols:
            outs.append(jnp.cos(c * f))
    return outs


def _encode_interleaved(x_cols, n_freqs):
    """Match positional_encode exactly: [x, sinF0(x), cosF0(x), sinF1...]
    where each block spans all C coordinates."""
    return _freq_encode_cols(x_cols, n_freqs)


def lane_encode_tables(blocks, n_coords=8, lanes=LANE):
    """Constant tables for LANE-PACKED frequency encoding.

    A naive per-column encode builds ~90 (T,1) arrays, each occupying a full
    (8,128) register tile (127/128 lanes wasted). Instead, the whole encoded
    row is computed as
        arg = (coords @ SEL) * FREQ
        enc = IDENT*arg + SIN*sin(arg) + COS*cos(arg)
    — one tiny (T,n_coords)x(n_coords,128) matmul and ONE sin + ONE cos over
    (T,128).

    blocks: list of (coord_indices, n_freqs) in row order, each laid out as
    [x, sin f0 x, cos f0 x, sin f1 x, ...] per coordinate group (matching
    ops.encoding.positional_encode). Returns (SEL, FREQ, IDENT, SIN, COS).
    """
    sel = np.zeros((n_coords, lanes), np.float32)
    freq = np.ones((1, lanes), np.float32)
    ident = np.zeros((1, lanes), np.float32)
    sin_m = np.zeros((1, lanes), np.float32)
    cos_m = np.zeros((1, lanes), np.float32)
    l = 0
    for coords, n_freqs in blocks:
        for c in coords:
            sel[c, l] = 1.0
            ident[0, l] = 1.0
            l += 1
        for f in (2.0 ** np.arange(n_freqs)).astype(np.float32):
            for c in coords:
                sel[c, l] = 1.0
                freq[0, l] = f
                sin_m[0, l] = 1.0
                l += 1
            for c in coords:
                sel[c, l] = 1.0
                freq[0, l] = f
                cos_m[0, l] = 1.0
                l += 1
    assert l <= lanes, l
    return sel, freq, ident, sin_m, cos_m


def _lane_encode(coords8, sel_ref, freq_ref, ident_ref, sin_ref, cos_ref):
    """coords8: (T, 8) packed coordinates -> (T, 128) encoded row.

    One transcendental chain instead of two: cos lanes evaluate
    ``sin(arg + pi/2)`` (the sin/cos masks double as a lane-shift table).
    The phase add costs ~ulp(arg) ~ 3e-5 absolute at the top frequency
    band — far inside the kernels' 2e-4 agreement budget with the XLA
    pipeline, and identical across v3/v5 (both call this helper).

    The coordinate-selection matmul must not round the COORDINATES to bf16
    (the TPU default): a 2^-9 relative position error is ~a radian of phase
    at the 2^9 frequency band (measured ~0.9 dB PSNR loss on a trained
    scene). THREE single-pass matmuls over a hi/mid/lo coordinate split
    recover ~26 mantissa bits — the residual ~2^-17 rad phase error is
    invisible next to fp32's own sin rounding (a 2-piece split's ~2^-8 rad
    was the largest single term in the kernel's 0.19 dB deficit vs the
    fp32 pipeline; round-3 bisection). Still half of HIGHEST's 6-pass
    cost, and the (T,8)x(8,128) matmuls are tiny next to the (T,128) sin;
    SEL is 0/1 so only the coordinate operand matters."""
    c_hi = coords8.astype(jnp.bfloat16).astype(jnp.float32)
    r = coords8 - c_hi
    c_mid = r.astype(jnp.bfloat16).astype(jnp.float32)
    arg = (jnp.dot(c_hi, sel_ref[:], preferred_element_type=jnp.float32)
           + jnp.dot(c_mid, sel_ref[:], preferred_element_type=jnp.float32)
           + jnp.dot(r - c_mid, sel_ref[:],
                     preferred_element_type=jnp.float32)) * freq_ref[:]
    shifted = arg + cos_ref[:] * jnp.float32(np.pi / 2)
    return ident_ref[:] * arg \
        + (sin_ref[:] + cos_ref[:]) * jnp.sin(shifted)


def make_megakernel(oracle_def, nerf_def, scene, config, tile: int = 256,
                    interpret: bool = False, oracle_split: bool = False,
                    nerf_split: bool = False, stop_after: str = ""):
    """Build fn(packed_oracle, packed_nerf, pose8, rot_pad, dirs_pad) ->
    (rgb (B, 128 [rgb|count]),) fused frame pipeline.

    dirs_pad: (B, 128) rows [dir(3) | 0...] camera-space unit dirs.
    pose8: (1, 128) [pose(3) | 0]; rot_pad: (128, 128) with rot^T in [:3,:3].
    oracle_split/nerf_split: hi/lo-split MLP activations (see _mm).
    stop_after: profiling hook — 'oracle' | 'select' | 'geom' | 'encode'
    truncate the kernel after that stage (out_ref written), mirroring v5 hooks
    (megakernel3.py) so tools/bench_megakernel.py can ladder either kernel.
    """
    if getattr(config, "useNDC", False) is True:
        raise ValueError("NDC scenes: only the v5 megakernel implements the "
                         "NDC ray transform (megakernel3.py)")
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
    max_depth = float(scene.depth_max)
    sqrt_max_depth = math.sqrt(max_depth)
    dr = scene.depth_range_warped
    transform = scene.depth_transform
    acc_alpha = (config.accumulationMult == "alpha")

    nerf_in_pad = LANE  # 63 + 27 <= 128

    # lane-packed encoder tables (see lane_encode_tables): oracle row layout
    # is [dir_enc | pos_enc] (features.py:866-871), shading row is
    # [pos_enc | dir_enc]
    o_tables = lane_encode_tables([([0, 1, 2], fd0), ([3, 4, 5], fp0)])
    n_tables = lane_encode_tables([([0, 1, 2], fp1), ([3, 4, 5], fd1)])
    # pair-packed shading encode (see the kernel comment): P/Dn lane widths
    # of one slot's position/direction block
    P_LANES = 3 + 6 * fp1
    DN_LANES = 3 + 6 * fd1
    pair_pack = S >= 2 and 2 * P_LANES <= LANE \
        and P_LANES + DN_LANES <= LANE
    pos_pair_tables = (lane_encode_tables([([0, 1, 2], fp1), ([3, 4, 5], fp1)])
                       if pair_pack else n_tables)
    dir_tables = (lane_encode_tables([([0, 1, 2], fd1)])
                  if pair_pack else n_tables)

    def kernel(dirs_ref, pose_ref, rot_ref, *wrefs):
        ot = wrefs[0:5]
        nt = wrefs[5:10]
        pt = wrefs[10:15]
        dt = wrefs[15:20]
        wrefs = wrefs[20:]
        n_ow = len(_ORACLE_KEYS)
        ow = {k: r for k, r in zip(_ORACLE_KEYS, wrefs[:n_ow])}
        nw = {k: r for k, r in zip(_NERF_KEYS, wrefs[n_ow:-1])}
        out_ref = wrefs[-1]

        T = tile
        dirs_pad = dirs_ref[:]                       # (T, 128) [d3|0]
        pose = pose_ref[:]                           # (1, 128) [p3|0]

        # world dirs: (T,128)[:, :3] via padded matmul with rot^T
        nds_pad = jnp.dot(dirs_pad, rot_ref[:],
                          preferred_element_type=jnp.float32)  # (T,128)
        nds3 = nds_pad[:, 0:3]
        ndx = nds3[:, 0:1]
        ndy = nds3[:, 1:2]
        ndz = nds3[:, 2:3]

        o3 = jnp.broadcast_to(pose[:, 0:3], (T, 3))
        ox = o3[:, 0:1]
        oy = o3[:, 1:2]
        oz = o3[:, 2:3]

        # ray-sphere exit distance (features.py:768-791), lane-packed with
        # the same reduce order as ops.raymarch.ray_sphere_offset
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
        prx = ox + ndx * dist
        pry = oy + ndy * dist
        prz = oz + ndz * dist

        # oracle input: [dir_enc(d), pos_enc(proj)] (features.py:866-871),
        # lane-packed: one matmul + one sin + one cos over (T, 128)
        zero2 = jnp.zeros((T, 2), jnp.float32)
        coords_o = jnp.concatenate([ndx, ndy, ndz, prx, pry, prz, zero2],
                                   axis=1)
        x0 = _lane_encode(coords_o, *ot)
        oracle_out = _oracle_mlp(ow, x0, oracle_def.depth,
                                 split=oracle_split)[:, :D]
        if stop_after == "oracle":  # profiling hook
            out_ref[:] = jnp.concatenate(
                [oracle_out[:, :4], jnp.zeros((T, LANE - 4), jnp.float32)],
                axis=1)
            return

        # adaptive select, PAIR-HARVESTED: each of the S max rounds already
        # yields one slot's data as NARROW (T,1) columns — the round's max
        # IS the slot's oracle value p and its first-max lane IS the bin —
        # so the mask-based per-slot extraction (a (T,128) compare + three
        # (T,128)->(T,1) reductions per slot, ~60% of the round-4 encode-
        # block time at S=4) is replaced by a Batcher network of narrow
        # (T,4) compare-exchanges restoring front-to-back bin order.
        # Selection set, tie rule (value desc / lane asc), threshold
        # filter, argmax fallback, and dead-slot packing (bin 0, p 0,
        # live 0) are all BIT-IDENTICAL to the mask form (same floats in
        # the same slots), so the composite and the XLA-pipeline agreement
        # are unchanged. Reference semantics: sampleAdaptiveWarpMax
        # (adaptive_cuda_kernels.cu:21-227) — raw logits, no sigmoid,
        # exactly as the CUDA viewer thresholds its TRT oracle output.
        d = oracle_out
        iota = jax.lax.broadcasted_iota(jnp.int32, (T, D), 1)
        work = d
        rows = []  # (T, 4) rows [sort key | bin | p | live]
        ones_col = jnp.ones((T, 1), jnp.float32)
        for k in range(S):
            v_k = jnp.max(work, axis=1, keepdims=True)
            first = jnp.min(jnp.where(work == v_k, iota, D), axis=1,
                            keepdims=True)
            work = jnp.where(iota == first, jnp.float32(-jnp.inf), work)
            first_f = first.astype(jnp.float32)
            if threshold > 0.0 and k > 0:
                live = (v_k >= threshold).astype(jnp.float32)
            else:
                # slot of round 0 is ALWAYS live: v_0 is the row max, so
                # either it passes the threshold or nothing does and the
                # argmax fallback keeps exactly this bin
                live = ones_col
            rows.append(jnp.concatenate(
                [jnp.where(live > 0.0, first_f, jnp.float32(D)),
                 first_f * live, v_k * live, live], axis=1))
        for (i, j) in _batcher_network(S):
            swap = rows[i][:, 0:1] > rows[j][:, 0:1]
            lo = jnp.where(swap, rows[j], rows[i])
            rows[j] = jnp.where(swap, rows[i], rows[j])
            rows[i] = lo
        n_per_f = rows[0][:, 3:4]
        for k in range(1, S):
            n_per_f = n_per_f + rows[k][:, 3:4]
        n_per = n_per_f[:, 0].astype(jnp.int32)

        if stop_after == "select":  # profiling hook
            out_ref[:] = jnp.concatenate(
                [rows[0][:, 1:2], rows[(S + 1) // 2][:, 1:2],
                 rows[S - 1][:, 2:3], n_per_f,
                 jnp.zeros((T, LANE - 4), jnp.float32)], axis=1)
            return

        # SLOT-BATCHED shading: all S slots' MLP inputs stack into ONE
        # (S*T, 128) batch so the shading network runs as a single chain
        # of 11 large matmuls (a fori_loop over slots serialized the MXU and
        # ran 4.8x slower; a fully unrolled body blew compile time).
        # Slot geometry rides PLANAR (T, S) coordinate planes — one
        # elementwise pass per op per COORDINATE instead of per slot, so
        # the z/spos/normalize block is ~25 vector passes independent of S
        # (the round-4 (T,3)-per-slot form was ~13*S). Per-element
        # arithmetic and add order are unchanged (lx^2+ly^2 then +lz^2 ==
        # jnp.sum over a (T,3) row), so every ln lane is bit-identical.
        probs = [r[:, 2:3] for r in rows]
        lives = [r[:, 3:4] for r in rows]
        bins = jnp.concatenate([r[:, 1:2] for r in rows], axis=1)  # (T, S)
        zs = transform.to_world((bins + 0.5) * cell, dr)           # (T, S)
        sx = prx + ndx * zs
        sy = pry + ndy * zs
        sz = prz + ndz * zs
        lx = sx - jnp.float32(center[0])
        ly = sy - jnp.float32(center[1])
        lz = sz - jnp.float32(center[2])
        # InverseSqrtDistCentered normalization
        norm = jnp.sqrt(jnp.sqrt(lx * lx + ly * ly + lz * lz))
        inv = 1.0 / (sqrt_max_depth * jnp.maximum(norm, 1e-12))
        lnx, lny, lnz = lx * inv, ly * inv, lz * inv
        lns = [jnp.concatenate([lnx[:, s:s + 1], lny[:, s:s + 1],
                                lnz[:, s:s + 1]], axis=1)
               for s in range(S)]

        if stop_after == "geom":  # profiling hook: + per-slot z/geometry
            acc = n_per_f
            for s in range(S):
                acc = acc + lns[s][:, 0:1] + probs[s] + lives[s]
            out_ref[:] = jnp.concatenate(
                [jnp.broadcast_to(acc, (T, 4)),
                 jnp.zeros((T, LANE - 4), jnp.float32)], axis=1)
            return

        # PAIR-PACKED encodes (the dense frame's transcendental bill is the
        # encode stage — 11 of 39.5 ms at S=4/tile=512 on the at-cap
        # barbershop ladder): the dir encode (Dn lanes) is slot-INVARIANT,
        # so it runs once per tile and is lane-rolled into place; two slots'
        # position encodes (2P <= 128 lanes at posEnc 10) share ONE
        # (T, 128) transcendental pass and the second slot's block is
        # lane-rolled down. Rolls and 0/1 masks are exact data movement and
        # the 0/1-select encode matmul sums identical terms, so every MLP
        # input lane is BIT-IDENTICAL to the per-slot form. Sin passes:
        # S+0 -> S/2+1 (S=4: 4->3, S=16: 16->9).
        if pair_pack:
            dir_full = _lane_encode(
                jnp.concatenate([nds3, jnp.zeros((T, 5), jnp.float32)],
                                axis=1), *dt)
            dir_part = pltpu.roll(dir_full, P_LANES, axis=1)
            lane_i = jax.lax.broadcasted_iota(jnp.int32, (1, LANE), 1)
            mask_p = (lane_i < P_LANES).astype(jnp.float32)
            xs = [None] * S
            for p in range(S // 2):
                a, b = 2 * p, 2 * p + 1
                coords_p = jnp.concatenate([lns[a], lns[b], zero2], axis=1)
                enc_p = _lane_encode(coords_p, *pt)
                xs[a] = enc_p * mask_p + dir_part
                xs[b] = pltpu.roll(enc_p, LANE - P_LANES, axis=1) * mask_p \
                    + dir_part
            if S % 2:  # leftover slot: classic single-slot [pos|dir] row
                xs[S - 1] = _lane_encode(
                    jnp.concatenate([lns[S - 1], nds3, zero2], axis=1), *nt)
        else:  # 2P > 128 (posEnc > 10): per-slot rows
            xs = [_lane_encode(jnp.concatenate([ln, nds3, zero2], axis=1),
                               *nt) for ln in lns]

        x_all = jnp.concatenate(xs, axis=0)          # (S*T, 128)
        if stop_after == "encode":  # profiling hook: + slot geometry/encode
            acc = xs[0][:, 0:4]
            for s in range(1, S):
                acc = acc + xs[s][:, 0:4]
            out_ref[:] = jnp.concatenate(
                [acc, jnp.zeros((T, LANE - 4), jnp.float32)], axis=1)
            return
        rgb_raw, alpha_raw = _nerf_mlp(nw, x_all, nerf_def,
                                       split=nerf_split)

        # streaming front-to-back composite over the slot blocks. All S
        # slots' rgba ride ONE (T, 4S) sigmoid pass and the live/prob
        # premultiplies ONE (T, S) planar pass (sigmoid and multiply are
        # elementwise, so every value is bit-identical to the per-slot
        # form); only the inherently sequential transmittance recurrence
        # stays per-slot, in the exact reference order
        # (nerf_raw_2_output_adaptive_mult_depth, mult_location=1).
        rgba_all = jnp.concatenate(
            [c for s in range(S)
             for c in (rgb_raw[s * T:(s + 1) * T, 0:3],
                       alpha_raw[s * T:(s + 1) * T, 0:1])], axis=1)
        sig_all = jax.nn.sigmoid(rgba_all)                    # (T, 4S)
        a_cols = jnp.concatenate(
            [sig_all[:, 4 * s + 3:4 * s + 4] for s in range(S)], axis=1)
        a_cols = a_cols * jnp.concatenate(lives, axis=1)
        if acc_alpha:
            a_cols = a_cols * jnp.concatenate(probs, axis=1)
        trans = jnp.ones((T, 1), jnp.float32)
        acc_rgb = jnp.zeros((T, 3), jnp.float32)
        for s in range(S):
            sig_a = a_cols[:, s:s + 1]
            w_s = sig_a * trans
            trans = trans * (1.0 - sig_a + 1e-10)
            acc_rgb = acc_rgb + w_s * sig_all[:, 4 * s:4 * s + 3]

        count = n_per.astype(jnp.float32)[:, None]
        pad = jnp.zeros((T, LANE - 4), jnp.float32)
        out_ref[:] = jnp.concatenate([acc_rgb, count, pad], axis=1)

    _ORACLE_KEYS = None  # filled below
    _NERF_KEYS = None

    def build(packed_oracle, packed_nerf):
        nonlocal _ORACLE_KEYS, _NERF_KEYS
        _ORACLE_KEYS = sorted(packed_oracle.keys())
        _NERF_KEYS = sorted(packed_nerf.keys())

        @jax.jit
        def run(dirs_pad, pose8, rot_pad):
            B = dirs_pad.shape[0]
            in_specs = [pl.BlockSpec((tile, LANE), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((1, LANE), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((LANE, LANE), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM)]
            ws = []
            for tbl in (list(o_tables) + list(n_tables)
                        + list(pos_pair_tables) + list(dir_tables)):
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
                # tiles past 256 exceed Mosaic's conservative 16 MB
                # scoped-vmem default; raise it only then (v5e has 128 MB —
                # an unconditional override would fail compilation on
                # smaller-VMEM generations even for tiles that fit)
                compiler_params=(pltpu.CompilerParams(
                    vmem_limit_bytes=96 * 1024 * 1024)
                    if tile > 256 else None),
                interpret=interpret,
            )(dirs_pad, pose8, rot_pad, *ws)

        return run

    return build


def prep_inputs(directions, pose, rotation):
    """Host-side packing of the megakernel inputs."""
    B = directions.shape[0]
    dirs_pad = jnp.zeros((B, LANE), jnp.float32).at[:, :3].set(directions)
    pose8 = jnp.zeros((1, LANE), jnp.float32).at[0, :3].set(pose)
    rot_pad = jnp.zeros((LANE, LANE), jnp.float32) \
        .at[:3, :3].set(jnp.asarray(rotation).T)
    return dirs_pad, pose8, rot_pad
