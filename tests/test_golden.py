"""Golden numeric regression: the cascade with seed-0 weights on the fixed
synthetic scene must keep producing the same values (guards the volume
rendering, sampler, encoding and model numerics across refactors).

The golden constants were recorded from the CPU backend at the commit that
introduced this test; any intentional numeric change must update them (and
say why in the commit message).
"""

import numpy as np
import pytest

from adanerf_tpu.config import Config
from adanerf_tpu.pipeline.keys import FSK
from adanerf_tpu.train_state import TrainState

from scene_utils import dense_config_args, make_scene


@pytest.fixture(scope="module")
def states(tmp_path_factory):
    scene = make_scene(str(tmp_path_factory.mktemp("scene_gold")))
    out = {}
    for thr in (0.0, 0.2):
        log = str(tmp_path_factory.mktemp(f"logs_gold_{thr}"))
        config = Config.init(argv=dense_config_args(scene, log, threshold=thr)
                             + ["--randomSeed", "0"])
        ts = TrainState()
        ts.initialize(config)
        out[thr] = ts
    return out


def _render_probe(ts):
    batch, _ = ts.assemble_train_batch(ts.train_dataset, np.array([0]))
    outs, dicts = ts.inference(batch)
    rgb = np.asarray(outs[1])
    oracle = np.asarray(outs[0])
    return rgb, oracle, dicts


def test_dense_golden(states):
    ts = states[0.0]
    rgb, oracle, dicts = _render_probe(ts)
    # recorded goldens (CPU backend, seed 0, scene seed 0)
    np.testing.assert_allclose(float(rgb.mean()), 0.55500060, rtol=1e-4)
    np.testing.assert_allclose(float(np.abs(oracle).mean()), 1.08444655, rtol=1e-4)
    w = np.asarray(dicts[1][FSK.nerf_weights_output])
    np.testing.assert_allclose(float(w.sum()), 64.615936, rtol=1e-4)


def test_adaptive_golden(states):
    ts = states[0.2]
    rgb, oracle, dicts = _render_probe(ts)
    mask = np.asarray(dicts[1][FSK.adaptive_sample_mask])
    np.testing.assert_allclose(float(rgb.mean()), 0.54290968, rtol=1e-4)
    assert int(mask.sum()) == 384


def test_record_goldens_helper(states, capsys):
    """Prints current values — run with -s to refresh the constants above."""
    for thr, ts in states.items():
        rgb, oracle, dicts = _render_probe(ts)
        line = (f"thr={thr}: rgb.mean={float(rgb.mean()):.8f} "
                f"|oracle|.mean={float(np.abs(oracle).mean()):.8f}")
        if FSK.adaptive_sample_mask in dicts[1]:
            line += f" mask.sum={int(np.asarray(dicts[1][FSK.adaptive_sample_mask]).sum())}"
        else:
            line += f" w.sum={float(np.asarray(dicts[1][FSK.nerf_weights_output]).sum()):.6f}"
        print(line)
