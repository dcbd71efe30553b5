"""Streaming (bounded-LRU) dataset fallback for over-budget splits —
reference analog OnTheFlyViewCellDataset (datasets.py:382-477)."""

import numpy as np
import pytest

from adanerf_tpu.config import Config
from adanerf_tpu.data.dataset import (DatasetInfo, ViewCellDataset,
                                      load_dataset_split)
from adanerf_tpu.data.streaming import (LazyImageStore,
                                        StreamingViewCellDataset,
                                        split_fits_in_memory)

from scene_utils import dense_config_args, make_scene


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    return make_scene(str(tmp_path_factory.mktemp("scene") / "s"),
                      w=24, h=24, n_train=6, with_depth=True)


def _cfg(scene, tmp_path, extra=()):
    args = dense_config_args(scene, str(tmp_path / "logs")) + list(extra)
    return Config.init(argv=args)


def test_lazy_store_matches_and_evicts(scene, tmp_path):
    cfg = _cfg(scene, tmp_path, ["--trainWithGTDepth"])
    info = DatasetInfo(cfg)
    full = ViewCellDataset(cfg, info, "train", 64)
    # budget of ~3 frames -> forced eviction over 6 frames
    frame_bytes = info.w * info.h * 3 * 4
    streaming = StreamingViewCellDataset(cfg, info, "train", 64,
                                         max_bytes=3 * frame_bytes * 2)
    assert len(streaming.color_images) == len(full)
    assert streaming.color_images.shape == full.color_images.shape
    for i in range(len(full)):
        np.testing.assert_array_equal(streaming.color_images[i],
                                      full.color_images[i])
        np.testing.assert_allclose(streaming.depth_images[i],
                                   full.depth_images[i], atol=1e-6)
    assert streaming.color_images.resident <= streaming.color_images.max_items
    assert streaming.color_images.resident < len(full)
    # LRU: second pass over the tail reloads evicted heads
    first_loads = streaming.color_images.loads
    streaming.color_images[0]
    assert streaming.color_images.loads == first_loads + 1


def test_train_batches_identical(scene, tmp_path):
    """assemble_train_batch must produce bit-identical batches on either
    residency policy."""
    from adanerf_tpu.train_state import TrainState

    cfg = _cfg(scene, tmp_path, ["--trainWithGTDepth"])
    ts = TrainState()
    ts.initialize(cfg)
    full = ViewCellDataset(cfg, ts.dataset_info, "train", cfg.samples)
    frame_bytes = ts.dataset_info.w * ts.dataset_info.h * 3 * 4
    streaming = StreamingViewCellDataset(cfg, ts.dataset_info, "train",
                                         cfg.samples,
                                         max_bytes=2 * frame_bytes * 2)

    idx = np.array([1, 4])
    ts.pixel_idx_sequence_gen.reset() if hasattr(
        ts.pixel_idx_sequence_gen, "reset") else None
    b_full, t_full = ts.assemble_train_batch(full, idx)
    # re-create the generator so both runs see the same pixel sequence
    from adanerf_tpu.data.sampling import get_sequence_generator
    ts.pixel_idx_sequence_gen = get_sequence_generator(
        cfg.sampleGenerator, dims=2)
    b_str, t_str = ts.assemble_train_batch(streaming, idx)
    for k in b_full:
        np.testing.assert_array_equal(np.asarray(b_full[k]),
                                      np.asarray(b_str[k]), err_msg=str(k))
    for k in t_full:
        np.testing.assert_array_equal(np.asarray(t_full[k]),
                                      np.asarray(t_str[k]))


def test_split_selection_by_budget(scene, tmp_path, monkeypatch):
    cfg = _cfg(scene, tmp_path)
    info = DatasetInfo(cfg)
    # generous budget -> fully loaded
    monkeypatch.setenv("ADANERF_HOST_MEM_BUDGET_MB", "1024")
    assert split_fits_in_memory(cfg, info, "train")
    ds = load_dataset_split(cfg, info, "train", 64)
    assert type(ds) is ViewCellDataset
    # artificially low budget -> streaming fallback engages
    monkeypatch.setenv("ADANERF_HOST_MEM_BUDGET_MB", "0.01")
    assert not split_fits_in_memory(cfg, info, "train")
    ds = load_dataset_split(cfg, info, "train", 64)
    assert isinstance(ds, StreamingViewCellDataset)
    np.testing.assert_array_equal(ds.color_images[2],
                                  ViewCellDataset(cfg, info, "train",
                                                  64).color_images[2])
    # --storeFullData overrides the budget
    cfg2 = _cfg(scene, tmp_path, ["--storeFullData"])
    ds = load_dataset_split(cfg2, info, "train", 64)
    assert type(ds) is ViewCellDataset
