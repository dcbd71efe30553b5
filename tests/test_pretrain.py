"""GT pretraining path (reference: src/train.py:144-261): per-net training on
ground-truth targets before joint training — oracle on ClassifiedDepth/BCE."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adanerf_tpu.config import Config
from adanerf_tpu.train_state import TrainState

from scene_utils import dense_config_args, make_scene


def test_pretrain_step_trains_oracle_on_gt(tmp_path):
    scene = make_scene(str(tmp_path / "scene"), with_depth=True)
    args = dense_config_args(scene, str(tmp_path / "logs"))
    args[args.index("RawSigmoid")] = "ClassifiedDepth"
    args[args.index("NeRFWeightMultiplicationLoss")] = "BCEWithLogitsLoss"
    args += ["--trainWithGTDepth", "--multiDepthWindowSize", "3",
             "--multiDepthWindowSize", "3",
             "--epochsPretrain", "5", "--epochsPretrain", "-1"]
    config = Config.init(argv=args)
    ts = TrainState()
    ts.initialize(config)

    step = ts.make_pretrain_step(0)
    p_before = jax.tree.map(lambda x: np.asarray(x).copy(), ts.params)

    losses = []
    for e in range(8):
        batch, targets = ts.assemble_train_batch(ts.train_dataset,
                                                 np.array([e % 4, (e + 1) % 4]))
        ts.params, ts.opt_states = step(ts.params, ts.opt_states, batch,
                                        targets, jnp.asarray(e),
                                        jnp.asarray(0), jax.random.PRNGKey(e))
        # track loss by recomputing cheaply on oracle outputs
    # net0 moved, net1 untouched
    moved = any(not np.array_equal(a, np.asarray(b))
                for a, b in zip(jax.tree.leaves(p_before[0]),
                                jax.tree.leaves(ts.params[0])))
    frozen = all(np.array_equal(a, np.asarray(b))
                 for a, b in zip(jax.tree.leaves(p_before[1]),
                                 jax.tree.leaves(ts.params[1])))
    assert moved and frozen
