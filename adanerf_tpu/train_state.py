"""Training orchestration: model/optimizer/loss/feature construction, the
jitted train step, checkpoint management, weight-locking schedules and the
cascade inference driver.

Functional rebuild of ``src/train_data.py::TrainConfig``. The per-epoch work
(feature construction, both MLPs, adaptive sampling, compositing, both losses,
Adam updates, lr decay, weight locking) compiles into ONE XLA program;
the host only supplies (poses, rotations, gathered ray dirs, targets, epoch).
"""

from __future__ import annotations

import os
import re
import time
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .config import write_config_echo
from .data.dataset import DatasetInfo, ViewCellDataset, load_dataset_split
from .data.sampling import get_sequence_generator
from .models.mlp import get_model, init_params
from .pipeline.cascade import run_cascade
from .pipeline.features import get_feature_sets
from .pipeline.keys import FSK, DatasetKeys
from .pipeline.losses import get_loss_by_name
from .utils.helper import experiment_name


# ---------------------------------------------------------------------------
# checkpoint IO: npz files with the reference's naming scheme
# ---------------------------------------------------------------------------

def _flatten_tree(tree) -> Dict[str, np.ndarray]:
    """Flatten to {dotted-path: leaf} WITHOUT pulling device arrays to host
    (the pull is save_tree's job, sliced and supervised there)."""
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = ".".join(str(getattr(p, 'key', getattr(p, 'idx', p))) for p in path)
        flat[key] = leaf
    return flat


def _unflatten_like(tree, flat: Dict[str, np.ndarray]):
    paths_and_leaves = jax.tree_util.tree_flatten_with_path(tree)
    leaves = []
    for path, leaf in paths_and_leaves[0]:
        key = ".".join(str(getattr(p, 'key', getattr(p, 'idx', p))) for p in path)
        arr = flat[key]
        leaves.append(jnp.asarray(arr).astype(leaf.dtype).reshape(leaf.shape))
    return jax.tree_util.tree_unflatten(paths_and_leaves[1], leaves)


def _leaf_nbytes(leaf) -> int:
    try:
        return int(np.prod(leaf.shape)) * np.dtype(leaf.dtype).itemsize
    except (AttributeError, TypeError):
        return np.asarray(leaf).nbytes


def save_tree(path: str, tree, group_bytes: int = 2 << 20,
              progress=None, retries: int = 2):
    """Tunnel-safe checkpoint save (round-4 forensics, BENCH.md: every
    reference-scale 300k attempt died at the first epoch-50000 save).

    Two measured pathologies on the axon tunnel, one knob each:
      * per-tensor ``np.asarray`` pulls pay one round-trip latency PER
        TENSOR (~50 s each in slow-readback moods x ~120 tensors): leaves
        are fetched in GROUPS via one ``jax.device_get`` per group, so
        latency is paid per group, not per tensor;
      * one monolithic bulk pull (~29 MB) wedges the transport outright:
        each group is capped at ``group_bytes`` (single oversize leaves
        still go alone — slicing inside a leaf isn't worth the copy).

    Between groups a ``progress(done, total)`` callback fires so a
    log-watching supervisor (tools/supervise_train.py) sees liveness during
    a slow-but-progressing save instead of killing it. Transport errors
    raise on the fetch; each group retries up to ``retries`` times.

    The file write is atomic (tmp + os.replace): a killed save never leaves
    a truncated checkpoint for load_latest_weights to trip on.
    """
    flat = _flatten_tree(tree)
    keys = list(flat.keys())

    groups = []
    cur, cur_bytes = [], 0
    limit = group_bytes if group_bytes and group_bytes > 0 else None
    for k in keys:
        nb = _leaf_nbytes(flat[k])
        if cur and limit is not None and cur_bytes + nb > limit:
            groups.append(cur)
            cur, cur_bytes = [], 0
        cur.append(k)
        cur_bytes += nb
    if cur:
        groups.append(cur)

    fetched: Dict[str, np.ndarray] = {}
    for gi, group in enumerate(groups):
        for attempt in range(retries + 1):
            try:
                got = jax.device_get({k: flat[k] for k in group})
                break
            except Exception as e:  # transport hiccup: bounded retry
                if attempt >= retries:
                    raise
                print(f"[ckpt] fetch group {gi + 1}/{len(groups)} failed "
                      f"({type(e).__name__}: {e}); retry {attempt + 1}",
                      flush=True)
                time.sleep(5.0)
        fetched.update(got)
        if progress is not None:
            progress(gi + 1, len(groups))

    tmp = path + ".tmp"
    np.savez(tmp, **fetched)
    # np.savez appends .npz — atomic-replace to the exact reference filename
    os.replace(tmp + ".npz", path)


def load_tree(path: str, like):
    with np.load(path) as data:
        flat = {k: data[k] for k in data.files}
    return _unflatten_like(like, flat)


# ---------------------------------------------------------------------------

class TrainState:
    """Owns models/features/losses/optimizers for the cascade
    (reference: TrainConfig, src/train_data.py:24-400)."""

    def __init__(self):
        self.f_in = []
        self.f_out = []
        self.model_defs = []
        self.params = []
        self.opt_states = []
        self.losses = []
        self.loss_weights = []
        self.config_file = None
        self.epoch0 = 0
        self.epochs = 300000
        self.logDir = ""
        self.dataset_name = None
        self.experiment_name = None
        self.base_log_dir = ""
        self.best_valid_loss = None
        self.best_valid_loss_pretrain = []
        self.dataset_info = None
        self.scene = None
        self.train_dataset = None
        self.valid_dataset = None
        self.test_dataset = None
        self.pixel_idx_sequence_gen = None
        self.h = -1
        self.w = -1
        self._train_step = None
        self._inference_fns = {}
        self._tx = None

    # -- construction -------------------------------------------------------

    def initialize(self, config, load_data=True, log_path=None, training=True):
        self.config_file = config
        self.base_log_dir = config.logDir

        seed = config.randomSeed if config.randomSeed != -1 else 0
        self.seed = seed

        # materialize per-net list defaults (train_data.py:92-127)
        if config.rayMarchSamplingNoise is None:
            config.rayMarchSamplingNoise = []
        if config.zNear is None:
            config.zNear = []
        if config.zFar is None:
            config.zFar = []

        self.dataset_info = DatasetInfo(config)
        self.scene = self.dataset_info.scene_static()
        self.h, self.w = self.dataset_info.h, self.dataset_info.w
        self.f_in, self.f_out = get_feature_sets(config, self.scene)

        self.model_defs = []
        self.losses = []
        self.loss_weights = []
        for i in range(len(self.f_in)):
            model = get_model(config, self.f_in[i].n_feat, self.f_out[i].n_feat, i)
            self.model_defs.append(model)
            self.losses.append(get_loss_by_name(config.losses[i], config, i))
            self.loss_weights.append(config.lossWeights[i])

            if len(config.rayMarchSamplingNoise) <= i:
                config.rayMarchSamplingNoise.append(0.0)
            if len(config.zNear) <= i:
                config.zNear.append(0.001)
            if len(config.zFar) <= i:
                config.zFar.append(1.0)
            if hasattr(self.losses[i], 'requires_alpha_beta'):
                if len(config.lossAlpha) <= i:
                    config.lossAlpha.append(1.0)
                if len(config.lossBeta) <= i:
                    config.lossBeta.append(0.0)

        self.params = init_params(self.model_defs, seed)
        self._tx = optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8)
        self.opt_states = [self._tx.init(p) for p in self.params]

        self.experiment_name = experiment_name(config, self.f_in, self.f_out,
                                               self.model_defs)
        dataset_name = os.path.basename(os.path.normpath(config.data)) + "/"
        self.dataset_name = dataset_name
        if log_path is None:
            self.logDir = os.path.join(config.logDir, dataset_name,
                                       self.experiment_name) + "/"
        else:
            self.logDir = log_path
        config.logDir = self.logDir
        os.makedirs(self.logDir, exist_ok=True)
        self.epochs = config.epochs

        # previous best validation loss (train_data.py:166-178)
        opt_txt = os.path.join(self.logDir, "opt.txt")
        if os.path.exists(opt_txt):
            with open(opt_txt) as f:
                line = f.readline()
                m = re.search(r'\d+\.\d+', line)
                if m:
                    self.best_valid_loss = float(m.group(0))
        for i in range(len(self.model_defs)):
            p = os.path.join(self.logDir, f"opt_{i}.txt")
            if os.path.exists(p):
                with open(p) as f:
                    m = re.search(r'\d+\.\d+', f.readline())
                    if m:
                        self.best_valid_loss_pretrain.append(float(m.group(0)))

        write_config_echo(config, self.logDir)

        if load_data:
            self.pixel_idx_sequence_gen = get_sequence_generator(
                config.sampleGenerator, dims=2)
            if training:
                self.train_dataset = load_dataset_split(
                    config, self.dataset_info, "train", config.samples)
                self.valid_dataset = load_dataset_split(
                    config, self.dataset_info, "val", config.samples)
            self.test_dataset = load_dataset_split(
                config, self.dataset_info, "test", self.w * self.h)

    # -- weight locking (train_data.py:378-400) -----------------------------

    def _lock_bounds(self, net_idx: int):
        c = self.config_file
        e_bef = c.epochsLockWeightsBefore[net_idx] \
            if c.epochsLockWeightsBefore and len(c.epochsLockWeightsBefore) > net_idx else -1
        e_aft = c.epochsLockWeightsAfter[net_idx] \
            if c.epochsLockWeightsAfter and len(c.epochsLockWeightsAfter) > net_idx else -1
        return e_bef, e_aft

    def ever_unlocked(self, net_idx: int) -> bool:
        """Static: is net_idx trainable at ANY epoch of the schedule? A net
        locked for the whole run (e.g. the oracle in fine training,
        epochsLockWeightsAfter=[0,-1]) never has its loss evaluated — the
        reference skips locked criteria per-epoch (train.py:305-307), which
        is what makes the fine config's (B,128)-oracle vs (B,S)-alpha
        NeRFWeightMultiplicationLoss shapes legal there."""
        e_bef, e_aft = self._lock_bounds(net_idx)
        last = int(self.config_file.epochs)
        if e_bef == -1 and e_aft == -1:
            return True
        if e_bef == -1:                      # locked for epoch > e_aft
            return e_aft >= 1
        if e_aft == -1:                      # locked for epoch < e_bef
            return e_bef <= last
        return e_aft >= 1 or e_bef <= last   # locked strictly in between

    def weights_locked(self, epoch, net_idx: int):
        """Traced-bool lock predicate; works for python ints too."""
        e_bef, e_aft = self._lock_bounds(net_idx)
        if e_bef == -1 and e_aft != -1:
            return epoch > e_aft
        if e_bef != -1 and e_aft == -1:
            return epoch < e_bef
        if e_bef != -1 and e_aft != -1:
            return jnp.logical_and(epoch > e_aft, epoch < e_bef) \
                if not isinstance(epoch, int) else (e_bef > epoch > e_aft)
        return jnp.asarray(False) if not isinstance(epoch, int) else False

    # -- the jitted train step ----------------------------------------------

    def _train_apply_fns(self):
        """Per-net apply overrides for the train step: the shading NeRF runs
        through the fused Pallas forward+backward kernel on TPU (the XLA
        autodiff chain is HBM-bound at 4x the kernel's time; see
        ops/pallas/train_kernel.py).  Disabled off-TPU, without --bf16, or
        with --fusedTrainKernel 0."""
        c = self.config_file
        if not c.bf16 or not getattr(c, "fusedTrainKernel", 1):
            return None
        import jax as _jax
        if _jax.devices()[0].platform not in ("tpu", "axon"):
            return None
        from .ops.pallas.train_kernel import make_nerf_train_apply
        from .models.mlp import NeRFDef
        fns = []
        for d in self.model_defs:
            if (isinstance(d, NeRFDef) and d.use_viewdirs
                    and d.width % 128 == 0 and d.width >= 128):
                fns.append(make_nerf_train_apply(d))
            else:
                fns.append(None)
        return fns if any(f is not None for f in fns) else None

    def make_train_step(self):
        """One fused XLA program for a whole training epoch-step
        (reference hot loop: src/train.py:284-341)."""
        c = self.config_file
        model_defs = self.model_defs
        f_in = self.f_in
        losses = self.losses
        loss_weights = self.loss_weights
        tx = self._tx
        lrate = c.lrate
        decay_rate = c.lrate_decay
        decay_steps = c.lrate_decay_steps
        pre_train_epochs = max(c.epochsPretrain) if c.epochsPretrain else 0
        dtype = jnp.bfloat16 if c.bf16 else None
        apply_fns = self._train_apply_fns()

        def loss_fn(params, batch, targets, epoch, key):
            outs, dicts = run_cascade(model_defs, params, f_in, batch,
                                      is_inference=False, key=key, dtype=dtype,
                                      apply_fns=apply_fns)
            total = 0.0
            per_net = []
            for i, crit in enumerate(losses):
                if crit is None or loss_weights[i] == 0 \
                        or not self.ever_unlocked(i):
                    per_net.append(jnp.asarray(0.0))
                    continue
                y = targets.get(i)
                li = crit(outs[i], y, inference_dicts=dicts, epoch=epoch)
                locked = self.weights_locked(epoch, i)
                w = jnp.where(locked, 0.0, loss_weights[i])
                total = total + w * li
                per_net.append(li)
            return total, per_net

        def train_step(params, opt_states, batch, targets, epoch, key):
            grads, per_net = jax.grad(loss_fn, has_aux=True)(
                params, batch, targets, epoch, key)
            lr = lrate * decay_rate ** ((epoch - pre_train_epochs) / decay_steps)
            new_params, new_opts = [], []
            for i in range(len(params)):
                updates, opt_new = tx.update(grads[i], opt_states[i], params[i])
                updates = jax.tree.map(lambda u: -lr * u, updates)
                p_new = optax.apply_updates(params[i], updates)
                locked = self.weights_locked(epoch, i)
                p_new = jax.tree.map(
                    lambda old, new: jnp.where(locked, old, new), params[i], p_new)
                opt_new = jax.tree.map(
                    lambda old, new: jnp.where(locked, old, new),
                    opt_states[i], opt_new)
                new_params.append(p_new)
                new_opts.append(opt_new)
            return new_params, new_opts, per_net

        self._train_step_raw = train_step  # unjitted body (for mesh sharding)
        self._train_step = jax.jit(train_step, donate_argnums=(0, 1))
        return self._train_step

    def make_pretrain_step(self, model_idx: int):
        """Single-net GT pretraining step (reference: src/train.py:144-261)."""
        c = self.config_file
        model_defs = self.model_defs
        f_in = self.f_in
        crit = self.losses[model_idx]
        tx = self._tx
        lrate, decay_rate = c.lrate, c.lrate_decay
        decay_steps = c.lrate_decay_steps
        dtype = jnp.bfloat16 if c.bf16 else None

        def loss_fn(p_i, params, batch, targets, epoch, key):
            params = list(params)
            params[model_idx] = p_i
            prev = []
            keys = jax.random.split(key, model_idx + 1) if key is not None \
                else [None] * (model_idx + 1)
            for j in range(model_idx):
                # previous stage outputs are replaced by their GT targets
                prev.append({FSK.postprocessed_network_output: targets.get(j)})
            d = f_in[model_idx].batch(batch, prev_outs=prev, key=keys[model_idx])
            out = model_defs[model_idx].apply(p_i, d[FSK.input_feature_batch],
                                              dtype=dtype)
            d[FSK.network_output] = out
            y = targets.get(model_idx)
            return crit(out, y, inference_dicts=[d], epoch=epoch,
                        inference_dict=d)

        def step(params, opt_states, batch, targets, epoch, epoch0, key):
            grads = jax.grad(loss_fn)(params[model_idx], params, batch, targets,
                                      epoch, key)
            lr = lrate * decay_rate ** ((epoch0 + epoch) / decay_steps)
            updates, opt_new = tx.update(grads, opt_states[model_idx],
                                         params[model_idx])
            updates = jax.tree.map(lambda u: -lr * u, updates)
            p_new = optax.apply_updates(params[model_idx], updates)
            params = list(params)
            opt_states = list(opt_states)
            params[model_idx] = p_new
            opt_states[model_idx] = opt_new
            return params, opt_states

        return jax.jit(step, donate_argnums=(0, 1))

    # -- inference driver (train_data.py:278-299) ---------------------------

    def inference_jit(self, n_img: int, n_rays: int, with_depth: bool = False):
        """Compile (and cache) the cascade for a given batch geometry."""
        key_sig = (n_img, n_rays, with_depth)
        if key_sig in self._inference_fns:
            return self._inference_fns[key_sig]
        model_defs, f_in = self.model_defs, self.f_in
        dtype = jnp.bfloat16 if self.config_file.bf16 else None

        @jax.jit
        def fn(params, batch):
            return run_cascade(model_defs, params, f_in, batch,
                               is_inference=True, key=None, dtype=dtype)

        self._inference_fns[key_sig] = fn
        return fn

    def inference(self, batch: Dict, is_inference=True):
        """Eager cascade call for chunked rendering; jit-cached by geometry."""
        n_img = batch[DatasetKeys.image_pose].shape[0]
        n_rays = batch[DatasetKeys.ray_directions_samples].shape[1]
        with_depth = DatasetKeys.depth_image_samples in batch
        fn = self.inference_jit(n_img, n_rays, with_depth)
        jb = {k: jnp.asarray(v) for k, v in batch.items()
              if k != DatasetKeys.image_sample_indices
              and not isinstance(v, (str, list))}
        return fn(self.params, jb)

    # -- checkpoints (train_data.py:322-376, models.py:87-181) --------------

    def save_weights(self, name_suffix: str, model_idx: int = -1,
                     params_only: bool = False):
        """Checkpoint every (selected) net. params_only skips the optimizer
        trees (~4x smaller device->host pull — the periodic-save mode behind
        --checkpointParamsOnly); the final/best saves keep full state."""
        c = self.config_file
        group_bytes = int(getattr(c, "checkpointGroupMB", 2.0) * (1 << 20))
        t0 = time.perf_counter()

        def progress(done, total):
            # one line per group: keeps the training log's mtime advancing
            # through a slow-readback save so the supervisor doesn't kill a
            # save that is progressing (tools/supervise_train.py --stall-min)
            print(f"[ckpt {name_suffix}] group {done}/{total} "
                  f"({time.perf_counter() - t0:.1f}s)", flush=True)

        for i, d in enumerate(self.model_defs):
            if model_idx in (-1, i):
                save_tree(os.path.join(self.logDir, f"{d.name}_{name_suffix}.weights"),
                          self.params[i], group_bytes=group_bytes,
                          progress=progress)
                if not params_only:
                    save_tree(os.path.join(self.logDir,
                                           f"{d.name}_{name_suffix}.optimizer"),
                              self.opt_states[i], group_bytes=group_bytes,
                              progress=progress)
        if getattr(self.config_file, "amp", False):
            # bf16 on TPU needs no loss scaling; keep an AMP-scaler state
            # placeholder for checkpoint-layout compat (train_data.py:328-329)
            save_tree(os.path.join(self.logDir, f"{name_suffix}.scale"),
                      {"scale": np.float32(1.0), "growth_tracker": np.int32(0)})

    def delete_saved_weights(self, model_idx: int = -1):
        """Prune old checkpoints: keep the newest 10 plus every 50k-epoch one
        (reference: models.py:92-103; call sites are disabled there too —
        train_data.py:325 — so the trainer never invokes this automatically).
        """
        for i, d in enumerate(self.model_defs):
            if model_idx not in (-1, i):
                continue
            ckpts = self._ckpt_candidates(self.logDir, d.name)
            for f in ckpts[:-10]:
                try:
                    epoch = int(f.split('.weights')[0].split('_')[-1])
                except ValueError:
                    continue
                if epoch % 50000 == 0 and epoch > 0:
                    continue
                os.remove(f)
                opt = f.split('.weights')[0] + '.optimizer'
                if os.path.exists(opt):
                    os.remove(opt)

    def _ckpt_candidates(self, path: str, name: str, include_opt=False):
        try:
            files = sorted(os.listdir(path))
        except OSError:
            return []
        out = []
        for f in files:
            if '.weights' in f and name in f:
                if not include_opt and '_opt.weights' in f:
                    continue
                out.append(os.path.join(path, f))
        return out

    def _try_resume_common_epoch(self) -> bool:
        """Resume every net from the NEWEST epoch for which every net has a
        READABLE checkpoint. A kill mid-save (tunnel wedge + supervisor
        restart) can leave one net's file missing or, pre-atomic-write,
        truncated; per-net independent "newest file" resume would then load
        nets from different epochs. Unreadable/incomplete epochs are skipped
        with a warning, falling back to the next older one."""
        per_net = []
        for d in self.model_defs:
            by_epoch = {}
            for p in self._ckpt_candidates(self.logDir, d.name):
                try:
                    by_epoch[int(p.split('.weights')[0].split('_')[-1])] = p
                except ValueError:
                    continue
            per_net.append(by_epoch)
        if not per_net or not all(per_net):
            return False
        common = set(per_net[0])
        for m in per_net[1:]:
            common &= set(m)
        for epoch in sorted(common, reverse=True):
            try:
                new_params = list(self.params)
                new_opts = list(self.opt_states)
                for i in range(len(self.model_defs)):
                    ckpt = per_net[i][epoch]
                    new_params[i] = load_tree(ckpt, self.params[i])
                    opt_path = ckpt.split('.weights')[0] + '.optimizer'
                    if os.path.exists(opt_path):
                        new_opts[i] = load_tree(opt_path, self.opt_states[i])
            except Exception as e:
                print(f"checkpoint epoch {epoch} unreadable "
                      f"({type(e).__name__}: {e}); trying an older one")
                continue
            print(f"Reloading checkpoint from epoch {epoch} "
                  f"({per_net[0][epoch]})")
            self.params = new_params
            self.opt_states = new_opts
            self.epoch0 = epoch + 1
            return True
        return False

    def load_latest_weights(self):
        """Resume from the newest complete checkpoint; otherwise bootstrap
        fine training from the dense run via the regex-derived experiment
        name (train_data.py:340-361)."""
        c = self.config_file
        if self._try_resume_common_epoch():
            return
        for i, d in enumerate(self.model_defs):
            self.epoch0 = 1
            if (c.preTrainedSuffix != "" and c.adaptiveSamplingThreshold > 0
                    and c.preTrained and len(c.preTrained) > i):
                base_name = re.sub(r"\d+_LSfCDA_\(\d+\.\d+\)", "128_LSfCDA_(0.0)",
                                   self.experiment_name)
                path = os.path.join(c.preTrained[i], base_name)
                cands = self._ckpt_candidates(path, d.name, include_opt=True)
                cands = [x for x in cands if c.preTrainedSuffix in x]
                if cands:
                    print(f"loading dense-pretrained weights from {cands[-1]}")
                    self.params[i] = load_tree(cands[-1], self.params[i])
                    opt_path = cands[-1].split('.weights')[0] + '.optimizer'
                    if os.path.exists(opt_path):
                        self.opt_states[i] = load_tree(opt_path, self.opt_states[i])
                else:
                    # Training an adaptive model from scratch silently (the
                    # reference's behavior, train_data.py:358) wastes the
                    # whole leg when the regex-derived teacher name doesn't
                    # resolve (e.g. a blending override renames the
                    # experiment); fail fast instead.
                    raise FileNotFoundError(
                        f"dense-pretrained weights for '{d.name}' not found "
                        f"in {path} (suffix '{c.preTrainedSuffix}'); the "
                        "teacher name is regex-derived from THIS run's "
                        "config — check that name-bearing flags (loss "
                        "blending, sample counts) match the dense run")
            elif c.preTrained and len(c.preTrained) > i \
                    and c.preTrained[i].lower() != "none":
                wpath = os.path.join(c.preTrained[i], f"{d.name}.weights")
                if not os.path.exists(wpath):
                    wpath = os.path.join(c.preTrained[i], f"{d.name}__opt.weights")
                if os.path.exists(wpath):
                    print(f"loading pretrained weights from {wpath}")
                    self.params[i] = load_tree(wpath, self.params[i])

    def load_specific_weights(self, name: str, model_idx: int = -1):
        for i, d in enumerate(self.model_defs):
            if model_idx in (-1, i):
                cands = self._ckpt_candidates(self.logDir, d.name, include_opt=True)
                cands = [x for x in cands if name in os.path.basename(x)]
                if not cands:
                    print("no Checkpoints found")
                    continue
                self.params[i] = load_tree(cands[-1], self.params[i])
                opt_path = cands[-1].split('.weights')[0] + '.optimizer'
                if os.path.exists(opt_path):
                    self.opt_states[i] = load_tree(opt_path, self.opt_states[i])

    # -- batch assembly -----------------------------------------------------

    def assemble_train_batch(self, dataset: ViewCellDataset,
                             image_indices: np.ndarray) -> tuple:
        """Host-side gather of a multi-image ray batch + targets.

        Matches OnTheFlyViewCellDataset.__getitem__ + create_sample_wrapper
        (datasets.py:430-477,41-67): per-image low-discrepancy pixel picks,
        image-major flattening.
        """
        n_img = len(image_indices)
        samples = dataset.num_samples
        dirs = np.zeros((n_img, samples, 3), np.float32)
        poses = dataset.poses[image_indices]
        rots = dataset.rotations[image_indices]
        targets = {}
        colors = None
        depth_samples = None
        placement = None
        tracker = getattr(dataset, "sample_placement_tracker", None)
        self._last_pixels = []
        for k, idx in enumerate(image_indices):
            pix = self.pixel_idx_sequence_gen.pixel_indices(samples, dataset.h,
                                                            dataset.w)
            self._last_pixels.append(pix)
            dirs[k] = dataset.directions[pix]
            if tracker is not None:
                # literal reference computation (datasets.py:606-610):
                # unpacked (h, w, max) -> (h*w, max), picked at the batch's
                # pixel indices
                if placement is None:
                    placement = np.zeros(
                        (n_img, samples, tracker.max_sample_count), np.float32)
                placement[k] = tracker.get_unpacked_image(idx).reshape(
                    dataset.h * dataset.w, -1)[pix]
            if dataset.color_images is not None:
                if colors is None:
                    colors = np.zeros((n_img, samples, 3), np.float32)
                colors[k] = dataset.color_images[idx].reshape(-1, 3)[pix]
            if dataset.depth_images is not None:
                if depth_samples is None:
                    depth_samples = np.zeros((n_img, samples, 1), np.float32)
                depth_samples[k] = dataset.depth_images[idx].reshape(-1, 1)[pix]

        batch = {DatasetKeys.image_pose: jnp.asarray(poses),
                 DatasetKeys.image_rotation: jnp.asarray(rots),
                 DatasetKeys.ray_directions_samples: jnp.asarray(dirs)}
        if depth_samples is not None:
            batch[DatasetKeys.depth_image_samples] = \
                jnp.asarray(depth_samples.reshape(-1, 1))
        if placement is not None:
            batch[DatasetKeys.sample_placement] = jnp.asarray(
                placement.reshape(-1, placement.shape[-1]))

        # per-net targets (only nets with real targets get one)
        for i, f_out in enumerate(self.f_out):
            t = None
            cls = type(f_out).__name__
            if cls == "RGBARayMarch" and colors is not None:
                t = colors.reshape(-1, 3)
            elif cls == "ClassifiedDepth" and dataset.depth_images is not None:
                # windowed depth-bin features via the native kernel (with
                # numpy fallback), mirroring the reference's CUDA extension
                from .native.disc_depth import disc_depth_features
                feats = []
                for k, idx in enumerate(image_indices):
                    pix = self._last_pixels[k]
                    feats.append(disc_depth_features(
                        dataset.depth_images[idx].reshape(dataset.h, dataset.w),
                        pix, f_out.window_size, f_out.n_feat,
                        f_out.ignore_depth_value))
                t = np.concatenate(feats, axis=0)
            if t is not None:
                targets[i] = jnp.asarray(t)
        return batch, targets
