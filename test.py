#!/usr/bin/env python
"""Offline render entry point (reference: src/test.py:13-36): render the
train/val/test splits with a chosen checkpoint into test_images/."""

from adanerf_tpu.config import Config
from adanerf_tpu.render import render_all_imgs, render_video
from adanerf_tpu.train_state import TrainState


from adanerf_tpu.platform import apply_platform_env

def main():
    apply_platform_env()
    config = Config.init(only_known_args=True)
    ts = TrainState()
    ts.initialize(config)

    ts.load_latest_weights()
    if config.checkPointName:
        ts.load_specific_weights(config.checkPointName.replace(".weights", ""))

    render_all_imgs(ts, "test_images/", dataset_name="train")
    render_all_imgs(ts, "test_images/", dataset_name="val")
    render_all_imgs(ts, "test_images/", dataset_name="test")


if __name__ == "__main__":
    main()
