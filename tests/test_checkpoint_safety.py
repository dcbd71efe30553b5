"""Tunnel-safe checkpoint machinery (round-5: BENCH.md 300k forensics).

The reference's save path is a blocking torch.save per net
(src/models.py:87-118); on the tunnel-attached TPU a monolithic
device->host pull wedges the transport, so save_tree slices the fetch
into bounded groups with progress callbacks and writes atomically, and
load_latest_weights resumes from the newest epoch COMPLETE across all
nets, skipping unreadable files (a mid-save kill leaves partial epochs).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adanerf_tpu.config import Config
from adanerf_tpu.train_state import TrainState, load_tree, save_tree

from scene_utils import dense_config_args, make_scene


@pytest.fixture(scope="module")
def ts(tmp_path_factory):
    scene = make_scene(str(tmp_path_factory.mktemp("scene_ckpt")))
    log = str(tmp_path_factory.mktemp("logs_ckpt"))
    config = Config.init(argv=dense_config_args(scene, log, epochs=50))
    state = TrainState()
    state.initialize(config)
    return state


def _tree(seed=0, n=6, size=1024):
    rng = np.random.RandomState(seed)
    return {f"w{i}": jnp.asarray(rng.rand(size).astype(np.float32))
            for i in range(n)}


def test_save_tree_sliced_groups(tmp_path):
    """The device->host pull happens in bounded groups (never one bulk
    fetch), each reported through the progress callback, and the round
    trip is exact."""
    tree = _tree(n=10, size=1024)  # 4 KB per leaf
    path = str(tmp_path / "t.weights")
    calls = []
    save_tree(path, tree, group_bytes=2 * 4096,
              progress=lambda d, t: calls.append((d, t)))
    # 10 leaves at 4 KB with an 8 KB cap -> 5 groups, each reported
    assert calls == [(i + 1, 5) for i in range(5)]
    out = load_tree(path, tree)
    for k in tree:
        np.testing.assert_array_equal(np.asarray(out[k]), np.asarray(tree[k]))
    assert not os.path.exists(path + ".tmp.npz")


def test_save_tree_oversize_leaf_goes_alone(tmp_path):
    """A leaf larger than group_bytes still saves (its own group)."""
    tree = {"big": jnp.zeros(4096, jnp.float32), "small": jnp.ones(8)}
    path = str(tmp_path / "t2.weights")
    calls = []
    save_tree(path, tree, group_bytes=1024,
              progress=lambda d, t: calls.append((d, t)))
    assert calls[-1][0] == calls[-1][1] == 2
    out = load_tree(path, tree)
    np.testing.assert_array_equal(np.asarray(out["small"]), np.ones(8))


def test_save_tree_retries_transient_fetch_failure(tmp_path, monkeypatch):
    """A transport error on one group is retried, not fatal."""
    tree = _tree(n=4)
    real_get = jax.device_get
    fails = {"n": 1}

    def flaky(x):
        if fails["n"] > 0:
            fails["n"] -= 1
            raise RuntimeError("synthetic transport hiccup")
        return real_get(x)

    monkeypatch.setattr(jax, "device_get", flaky)
    monkeypatch.setattr("adanerf_tpu.train_state.time.sleep", lambda s: None)
    path = str(tmp_path / "t3.weights")
    save_tree(path, tree, group_bytes=4096, retries=2)
    out = load_tree(path, tree)
    np.testing.assert_array_equal(np.asarray(out["w0"]),
                                  np.asarray(tree["w0"]))


def test_params_only_save_skips_optimizer(ts):
    ts.save_weights(name_suffix="0000042", params_only=True)
    weights = [f for f in os.listdir(ts.logDir) if f.endswith("0000042.weights")]
    opts = [f for f in os.listdir(ts.logDir) if f.endswith("0000042.optimizer")]
    assert len(weights) == len(ts.model_defs)
    assert opts == []
    for f in weights:
        os.remove(os.path.join(ts.logDir, f))


def test_resume_skips_incomplete_and_corrupt_epochs(ts):
    """Kill-mid-save forensics: net0 has epoch 30, net1 doesn't (incomplete
    save) and epoch 20 is truncated for net1 (pre-atomic-write artifact) —
    resume must land on epoch 10, the newest COMPLETE readable one."""
    for f in os.listdir(ts.logDir):
        if f.endswith((".weights", ".optimizer")):
            os.remove(os.path.join(ts.logDir, f))
    # mutate params so each save is distinguishable
    base = ts.params
    saved = {}
    for epoch in (10, 20):
        ts.params = jax.tree.map(lambda p, e=epoch: p + 0.001 * e, base)
        saved[epoch] = ts.params
        ts.save_weights(name_suffix=f"{epoch:07d}")
    names = [d.name for d in ts.model_defs]
    # epoch 30: only net0 written (simulate kill between nets)
    ts.params = jax.tree.map(lambda p: p + 0.003 * 10, base)
    ts.save_weights(name_suffix="0000030", model_idx=0)
    # corrupt net1's epoch-20 weights
    bad = os.path.join(ts.logDir, f"{names[1]}_0000020.weights")
    with open(bad, "wb") as f:
        f.write(b"not an npz")

    ts.params = jax.tree.map(jnp.zeros_like, base)
    ts.load_latest_weights()
    assert ts.epoch0 == 11
    got = np.asarray(jax.tree.leaves(ts.params[0])[0])
    want = np.asarray(jax.tree.leaves(saved[10][0])[0])
    np.testing.assert_array_equal(got, want)
    ts.params = base


def test_resume_prefers_newest_complete_epoch(ts):
    for f in os.listdir(ts.logDir):
        if f.endswith((".weights", ".optimizer")):
            os.remove(os.path.join(ts.logDir, f))
    base = ts.params
    saved = {}
    for epoch in (10, 20):
        ts.params = jax.tree.map(lambda p, e=epoch: p + 0.001 * e, base)
        saved[epoch] = ts.params
        ts.save_weights(name_suffix=f"{epoch:07d}",
                        params_only=(epoch == 20))
    ts.params = jax.tree.map(jnp.zeros_like, base)
    ts.load_latest_weights()
    assert ts.epoch0 == 21  # params-only epochs are still resumable
    got = np.asarray(jax.tree.leaves(ts.params[1])[0])
    want = np.asarray(jax.tree.leaves(saved[20][1])[0])
    np.testing.assert_array_equal(got, want)
    ts.params = base
