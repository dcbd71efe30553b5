"""Real-time-style adaptive renderer — the TPU equivalent of the CUDA/TensorRT
viewer (``adanerf_real_time_viewer/src/imagegenerator.cpp:247-478``).

Per ray batch (the viewer's two-stage inference loop):
  1. feature+oracle stage (one jit): ray rotation + view-cell-sphere entry +
     frequency encoding fused with the oracle MLP — the analog of
     ``setSpherePosDirBatchedUnrolledEnc`` + TRT context 0
     (base_cuda_kernels.cu:19-97, imagegenerator.cpp:308-313);
  2. adaptive select (same jit): threshold/top-k sample placement
     (``sampleAdaptiveWarpReductionMax``) returning the live sample count;
  3. bucketed compacted shading (one jit per capacity bucket): gather only the
     surviving samples, encode + shading MLP on a dense MXU batch, scatter
     back, per-ray alpha compositing with the oracle premultiply
     (``rayMarchFromPosesAdaptive`` + TRT context 1 with ragged binding +
     ``nerf_raw_2_output_adaptive_mult_depth``).

The one host sync per batch is the live-count read that picks the bucket —
exactly the role of the viewer's ``num_act_inputs`` ragged TRT binding.
Per-stage microsecond timers and avg-samples/pixel logging mirror
imagegenerator.cpp:361-393.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .ops.encoding import get_encoder
from .ops.normalization import get_normalization
from .ops.raymarch import ndc_rays, ray_sphere_offset
from .ops.samplers import adaptive_select, linearly_spaced_z


@dataclass
class FrameStats:
    """Per-stage accumulated microseconds (imagegenerator.cpp:370-393)."""
    oracle_us: float = 0.0
    shade_us: float = 0.0
    total_us: float = 0.0
    n_rays: int = 0
    n_samples: int = 0
    bucket_hist: Dict[int, int] = field(default_factory=dict)

    @property
    def avg_samples_per_pixel(self) -> float:
        return self.n_samples / max(self.n_rays, 1)


class RealtimeRenderer:
    """Bucketed-compaction adaptive renderer for the AdaNeRF cascade."""

    def __init__(self, model_defs, params, scene, config,
                 batch_size: int = 80_000,
                 buckets: Tuple[float, ...] = (0.125, 0.25, 0.5, 1.0),
                 dtype=jnp.bfloat16, compaction: bool = True,
                 oracle_dtype="unset", nerf_dtype="unset"):
        self.oracle_def, self.nerf_def = model_defs[0], model_defs[1]
        self.config = config
        self.params = params
        self.scene = scene
        self.batch_size = batch_size
        self.max_samples = config.numRaymarchSamples[1]
        self.threshold = config.adaptiveSamplingThreshold
        self.dtype = dtype
        # per-net precision overrides (tools/precision_study.py): bisect
        # which MLP's bf16 rounding carries the kernel-vs-fp32 PSNR deficit
        self.oracle_dtype = dtype if oracle_dtype == "unset" else oracle_dtype
        self.nerf_dtype = dtype if nerf_dtype == "unset" else nerf_dtype

        # NDC / forward-facing scenes (the CUDA viewer's
        # rayMarchFromPosesAdaptiveNDC path, adaptive_cuda_kernels.cu:610-660):
        # rays project into NDC space after the world-space oracle features;
        # z stays the raw [0,1] NDC depth (the *NoDepthRange samplers)
        self.use_ndc = getattr(config, "useNDC", False) is True
        sampler1 = ""
        if getattr(config, "rayMarchSampler", None):
            sampler1 = config.rayMarchSampler[1] or ""
        self.z_no_range = self.use_ndc or sampler1.endswith("NoDepthRange")
        self.compaction = compaction and self.threshold > 0.0

        args0 = [int(x) for x in config.posEncArgs[0].split('-')]
        args1 = [int(x) for x in config.posEncArgs[1].split('-')]
        self.enc0_pos = get_encoder(config.posEnc[0], args0[0])
        self.enc0_dir = get_encoder(config.posEnc[0], args0[1])
        self.enc1_pos = get_encoder(config.posEnc[1], args1[0])
        self.enc1_dir = get_encoder(config.posEnc[1], args1[1])
        norm_name = config.rayMarchNormalization[1] \
            if config.rayMarchNormalization else None
        self.normalization = get_normalization(norm_name)
        self.accumulation_mult = config.accumulationMult or None

        # packed shade-row width: [o(3)|d(3)|z(S)|probs(S)|...]; 128-lane
        # aligned (S<=59 fits one lane group; dense S=128 uses 384)
        self._pack_width = 128 * ((6 + 2 * self.max_samples + 127) // 128)

        # capacities snap to a fixed tile so drift between frames re-picks a
        # bucket instead of recompiling
        self._mlp_tile = 2048
        cap_unit = batch_size * self.max_samples

        def round_tile(c):
            t = self._mlp_tile
            return ((c + t - 1) // t) * t

        self.capacities = sorted({round_tile(max(int(b * cap_unit), batch_size))
                                  for b in buckets})
        if self.capacities[-1] < cap_unit:
            self.capacities.append(round_tile(cap_unit))

        self._oracle_fn = jax.jit(self._oracle_stage)
        self._shade_fns = {c: jax.jit(partial(self._shade_stage, capacity=c))
                           for c in self.capacities}
        self._dense_fn = jax.jit(self._dense_shade_stage)

    # -- stage 1+2: features + oracle + adaptive select ----------------------

    def _oracle_stage(self, params0, pose, rotation, dirs):
        """dirs: (B, 3) camera-space unit dirs. Returns ray geometry + the
        adaptive sample plan + live count."""
        sc = self.scene
        dt = self.oracle_dtype
        nds = dirs @ rotation.T
        center = jnp.asarray(sc.view_cell_center)
        origins = jnp.broadcast_to(pose, nds.shape)
        distance = ray_sphere_offset(nds, origins, center, sc.view_cell_radius)
        proj = origins + nds * distance[:, None]

        # oracle features are ALWAYS world-space (SpherePosDir projects onto
        # the view-cell sphere even for NDC scenes; features.py:222-330) —
        # only the shading rays move to NDC below
        x = jnp.concatenate([self.enc0_dir(nds), self.enc0_pos(proj)], axis=-1)
        oracle_out = self.oracle_def.apply(params0, x, dtype=dt)

        if self.use_ndc:
            o_sh, d_sh = ndc_rays(sc.h, sc.w, sc.focal, 1.0, origins, nds)
        else:
            o_sh, d_sh = proj, nds

        def to_world(z):
            if self.z_no_range:
                return z
            return sc.depth_transform.to_world(z, sc.depth_range_warped)

        B = dirs.shape[0]
        S = self.max_samples
        if self.threshold > 0.0:
            z_unit, z_probs, mask = adaptive_select(
                oracle_out.astype(jnp.float32), S, self.threshold)
            z_world = to_world(z_unit)
            n_act = jnp.sum(mask.astype(jnp.int32))
        else:
            z_unit = linearly_spaced_z(B, 0.001, 1.0, S)
            z_world = to_world(z_unit)
            z_probs = jax.nn.sigmoid(oracle_out) if oracle_out.shape[-1] == S \
                else jnp.ones_like(z_world)
            mask = jnp.ones(z_world.shape, bool)
            n_act = jnp.asarray(B * S, jnp.int32)

        # pack all per-ray shade inputs into 128-lane rows here, fused with
        # the select (one aligned gather in the shade stage replaces four
        # narrow ones): [o(3) | d(3) | z(S) | z_probs(S) | 0...]
        packed = jnp.concatenate(
            [o_sh, d_sh, jnp.where(mask, z_world, 0.0), z_probs,
             jnp.zeros((B, self._pack_width - 6 - 2 * S), jnp.float32)],
            axis=-1)
        return packed, mask, n_act

    # -- stage 3: compacted shading + composite ------------------------------

    def _encode_samples(self, pos, dirs):
        sc = self.scene
        center = jnp.asarray(sc.view_cell_center)
        p = self.normalization(pos, center, sc.depth_max)
        return jnp.concatenate([self.enc1_pos(p), self.enc1_dir(dirs)], axis=-1)

    def _apply_nerf(self, params1, emb):
        """Shading MLP inside the jitted stage. A standalone fused Pallas MLP
        was measured 3.6x faster in isolation but SLOWER in context (it broke
        XLA's surrounding fusion, BENCH.md round 1) — the winning fusion is
        the whole-frame megakernel (ops/pallas/megakernel3.py), not a
        kernel for this one stage."""
        return self.nerf_def.apply(params1, emb, dtype=self.nerf_dtype)

    def _composite(self, restored, z_world, z_probs, mask):
        """Masked compositing with the oracle-density premultiply
        (adaptive_cuda_kernels.cu:793-852)."""
        alpha = restored[..., 3]
        rgb = restored[..., :3]
        if self.accumulation_mult == "alpha":
            alpha = alpha * z_probs
        ones = jnp.ones_like(alpha[..., :1])
        trans = jnp.cumprod(jnp.concatenate([ones, 1.0 - alpha + 1e-10], -1),
                            axis=-1)[..., :-1]
        weights = alpha * trans
        if self.accumulation_mult == "weights":
            weights = weights * z_probs
        return jnp.sum(weights[..., None] * rgb, axis=-2)

    def _shade_stage(self, params1, packed, mask, capacity: int):
        """Compacted shading + in-place segmented compositing.

        TPU scatters and big row-gathers are pathological (tools/
        profile_frame.py), so the ragged samples are addressed with nothing
        but small cumsums and flat gathers: valid samples already occupy the
        FIRST n_r slots of each ray (ascending z), so the compacted layout is
        contiguous per-ray segments; compositing runs directly in compacted
        space with segmented associative scans (product for transmittance,
        sum for radiance) — the XLA analog of the CUDA per-ray compositing
        loop (adaptive_cuda_kernels.cu:742-852).
        """
        B, S = mask.shape
        dt = self.dtype
        n_per_ray = jnp.sum(mask.astype(jnp.int32), axis=1)            # (B,)
        cum = jnp.cumsum(n_per_ray)
        ray_start = cum - n_per_ray                                     # (B,)
        n_act = cum[-1]

        # ray id per compacted slot: mark segment starts, prefix-sum
        marks = jnp.zeros((capacity,), jnp.int32).at[ray_start].add(
            1, mode="drop")
        ray_of = jnp.cumsum(marks) - 1                                  # (cap,)
        slots = jnp.arange(capacity, dtype=jnp.int32)
        live = slots < n_act
        s_of = slots - ray_start[ray_of]

        # ONE wide aligned row gather instead of four narrow ones (TPU
        # gathers of 128-lane rows run at ~half HBM peak; 3-wide rows are
        # ~20x slower — see tools profiling); rows were packed in the oracle
        # stage: [o(3) | d(3) | z(S) | z_probs(S) | 0...]
        rows = packed[ray_of]                                           # (cap, 128)

        o = rows[:, 0:3]
        d = rows[:, 3:6]
        # select this slot's z / prob from the ray's row (compare-reduce)
        onehot_s = (jax.lax.broadcasted_iota(jnp.int32, (capacity, S), 1)
                    == s_of[:, None]).astype(jnp.float32)
        z_flat = jnp.sum(rows[:, 6:6 + S] * onehot_s, axis=1)
        zp_flat = jnp.sum(rows[:, 6 + S:6 + 2 * S] * onehot_s, axis=1)

        pos = o + d * z_flat[:, None]
        d_enc = d
        if self.use_ndc:
            # NDC rays step with the UNnormalized d (positions in the NDC
            # box) but encode the normalized direction (features.py:575-577)
            d_enc = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        emb = self._encode_samples(pos, d_enc)
        # stop XLA from fusing the (transcendental-heavy) encoding into the
        # matmul tiles — recomputation inside the MLP costs ~6 ms/batch
        emb = jax.lax.optimization_barrier(emb)
        raw = self._apply_nerf(params1, emb)
        sig = jax.nn.sigmoid(raw.astype(jnp.float32))

        alpha = sig[:, 3]
        if self.accumulation_mult == "alpha":
            alpha = alpha * zp_flat
        alpha = jnp.where(live, alpha, 0.0)

        is_start = s_of == 0

        # segmented exclusive product of (1 - alpha + 1e-10) = transmittance
        def seg_op(a, b):
            fa, va = a
            fb, vb = b
            return fa | fb, jnp.where(fb, vb, va * vb)

        one_m_a = 1.0 - alpha + 1e-10
        _, incl_prod = jax.lax.associative_scan(seg_op, (is_start, one_m_a))
        trans = jnp.where(is_start, 1.0,
                          jnp.concatenate([jnp.ones((1,)), incl_prod[:-1]]))
        weights = alpha * trans
        if self.accumulation_mult == "weights":
            weights = weights * zp_flat

        # segmented inclusive sum of weighted radiance; read at segment ends
        wrgb = weights[:, None] * sig[:, :3]

        def seg_sum(a, b):
            fa, va = a
            fb, vb = b
            return fa | fb, jnp.where(fb[..., None] if vb.ndim > fb.ndim else fb,
                                      vb, va + vb)

        _, incl_sum = jax.lax.associative_scan(
            seg_sum, (is_start[:, None] & jnp.ones((1, 3), bool), wrgb))
        seg_end = jnp.minimum(ray_start + n_per_ray - 1, capacity - 1)
        return incl_sum[seg_end]

    def _dense_shade_stage(self, params1, packed, mask):
        """Masked-dense fallback: evaluate the MLP at every slot (dead slots
        masked out) — used for threshold=0 and as a compaction baseline."""
        B, S = mask.shape
        dt = self.dtype
        origins = packed[:, 0:3]
        nds = packed[:, 3:6]
        z_world = packed[:, 6:6 + S]
        z_probs = packed[:, 6 + S:6 + 2 * S]
        z_safe = jnp.where(mask, z_world, 1.0)
        pos = origins[:, None, :] + nds[:, None, :] * z_safe[..., None]
        d_enc = nds
        if self.use_ndc:
            d_enc = nds / jnp.linalg.norm(nds, axis=-1, keepdims=True)
        dirs_exp = jnp.broadcast_to(d_enc[:, None, :], pos.shape)
        emb = self._encode_samples(pos.reshape(-1, 3), dirs_exp.reshape(-1, 3))
        emb = jax.lax.optimization_barrier(emb)
        raw = self._apply_nerf(params1, emb)
        sig = jax.nn.sigmoid(raw.astype(jnp.float32)).reshape(B, S, 4)
        sig = sig * mask[..., None]
        return self._composite(sig, z_world, z_probs, mask)

    # -- fully on-device frame loop ------------------------------------------

    def make_frame_renderer(self, n_pix: int, capacity: Optional[int] = None):
        """One jitted program rendering a WHOLE frame: lax.scan over ray
        batches, zero host round-trips (the tunnel-attached TPU pays 100ms+
        per device->host read).

        Two ragged-dispatch modes (both analogs of the viewer's ragged TRT
        binding, imagegenerator.cpp:336-344):
          * capacity=None: in-graph lax.switch over the capacity buckets —
            fully dynamic, but the switch costs ~14 ms/batch on v5e;
          * capacity=C: single fixed capacity (pick with
            ``choose_frame_capacity`` — the TRT optimization-profile pattern;
            ~1.5x faster). Batches whose live count exceeds C drop their
            lowest-priority samples, so C is chosen with headroom and bumped
            when headroom shrinks.

        Returns fn(params0, params1, pose, rotation, dirs_full) ->
        (frame (n_pix, 3), n_act_per_batch).
        """
        B = self.batch_size
        n_batches = (n_pix + B - 1) // B
        pad = n_batches * B - n_pix
        caps = self.capacities
        bounds = jnp.asarray(caps, jnp.int32)

        def one_batch(params0, params1, pose, rotation, chunk):
            packed, mask, n_act = self._oracle_stage(
                params0, pose, rotation, chunk)
            if not self.compaction:
                rgb = self._dense_shade_stage(params1, packed, mask)
            elif capacity is not None:
                rgb = self._shade_stage(params1, packed, mask,
                                        capacity=capacity)
            else:
                idx = jnp.searchsorted(bounds, n_act)
                idx = jnp.minimum(idx, len(caps) - 1)
                branches = [partial(self._shade_stage, capacity=c)
                            for c in caps]
                rgb = jax.lax.switch(idx, branches, params1, packed, mask)
            return rgb, n_act

        @jax.jit
        def render(params0, params1, pose, rotation, dirs_full):
            if pad > 0:
                dirs_full = jnp.concatenate(
                    [dirs_full, dirs_full[:pad]], axis=0)
            # scan over batches with loop-invariants CLOSED OVER (not carried
            # — a carried 7.7 MB dirs array would be copied every iteration);
            # the compiled program contains a single batch body.
            # Batches INTERLEAVE pixels (batch b = pixels b::n_batches):
            # contiguous image regions have correlated sample counts, strided
            # batches concentrate every batch's live count at the mean, which
            # lets the fixed capacity sit just above the average.
            dirs_batched = dirs_full.reshape(B, n_batches, 3).transpose(1, 0, 2)

            def body(_, chunk):
                return _, one_batch(params0, params1, pose, rotation, chunk)

            _, (rgb, n_acts) = jax.lax.scan(body, 0, dirs_batched)
            frame = rgb.transpose(1, 0, 2).reshape(n_batches * B, 3)[:n_pix]
            return frame, n_acts

        return render

    def pick_capacity(self, n_act: int) -> int:
        for c in self.capacities:
            if n_act <= c:
                return c
        return self.capacities[-1]

    def choose_frame_capacity(self, n_acts, headroom: float = 1.3) -> int:
        """Fixed frame capacity from measured per-batch live counts (one
        readback, outside the frame loop): smallest tile multiple covering
        headroom * max(n_acts)."""
        max_act = int(np.max(np.asarray(n_acts)))
        t = self._mlp_tile
        cap = int(np.ceil(headroom * max_act / t)) * t
        return min(max(cap, t), ((self.batch_size * self.max_samples + t - 1)
                                 // t) * t)

    def render_rays(self, pose, rotation, dirs, stats: Optional[FrameStats] = None):
        """Render one ray batch; returns (B, 3) rgb."""
        p0, p1 = self.params[0], self.params[1]
        t0 = time.perf_counter()
        packed, mask, n_act = self._oracle_fn(p0, pose, rotation, dirs)
        n_act_host = int(jax.device_get(n_act))  # the one sync (TRT ragged dim)
        t1 = time.perf_counter()
        if self.compaction:
            cap = self.pick_capacity(n_act_host)
            rgb = self._shade_fns[cap](p1, packed, mask)
        else:
            cap = mask.shape[0] * mask.shape[1]
            rgb = self._dense_fn(p1, packed, mask)
        rgb.block_until_ready()
        t2 = time.perf_counter()
        if stats is not None:
            stats.oracle_us += (t1 - t0) * 1e6
            stats.shade_us += (t2 - t1) * 1e6
            stats.total_us += (t2 - t0) * 1e6
            stats.n_rays += dirs.shape[0]
            stats.n_samples += n_act_host
            stats.bucket_hist[cap] = stats.bucket_hist.get(cap, 0) + 1
        return rgb

    def render_frame(self, pose, rotation, directions,
                     stats: Optional[FrameStats] = None) -> np.ndarray:
        """Full frame in batch_size chunks (imagegenerator.cpp batch loop).
        directions: (n_pix, 3) camera-space dirs. Returns (n_pix, 3)."""
        n_pix = directions.shape[0]
        B = self.batch_size
        pose = jnp.asarray(pose)
        rotation = jnp.asarray(rotation)
        out = np.zeros((n_pix, 3), np.float32)
        for start in range(0, n_pix, B):
            end = min(start + B, n_pix)
            chunk = directions[start:end]
            if end - start < B:
                chunk = np.concatenate(
                    [chunk, np.repeat(chunk[-1:], B - (end - start), axis=0)])
            rgb = self.render_rays(pose, rotation, jnp.asarray(chunk), stats)
            out[start:end] = np.asarray(rgb)[:end - start]
        return out

    def warmup(self, directions):
        """Compile every bucket once (the TRT engine-build analog; seconds on
        TPU instead of the reference's 10min-to-hours builds)."""
        pose = jnp.zeros((3,)) + jnp.asarray(self.scene.view_cell_center)
        rot = jnp.eye(3)
        B = self.batch_size
        chunk = jnp.asarray(directions[:B]) if directions.shape[0] >= B else \
            jnp.asarray(np.tile(directions, (B // directions.shape[0] + 1, 1))[:B])
        p0, p1 = self.params[0], self.params[1]
        outs = self._oracle_fn(p0, pose, rot, chunk)
        jax.block_until_ready(outs)
        packed, mask, _ = outs
        if self.compaction:
            for c in self.capacities:
                self._shade_fns[c](p1, packed, mask).block_until_ready()
        else:
            self._dense_fn(p1, packed, mask).block_until_ready()
