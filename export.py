#!/usr/bin/env python
"""Model export entry point (reference: src/export.py): write the viewer
artifact directory (weights, dataset_info.txt, config echo, AOT executables)."""

import os

from adanerf_tpu.config import Config
from adanerf_tpu.export import export_artifacts
from adanerf_tpu.train_state import TrainState


from adanerf_tpu.platform import apply_platform_env

def main():
    apply_platform_env()
    config = Config.init(only_known_args=True)
    ts = TrainState()
    ts.initialize(config, training=False)
    if config.checkPointName:
        ts.load_specific_weights(config.checkPointName.replace(".weights", ""))
    else:
        ts.load_latest_weights()
    export_artifacts(ts, os.path.join(ts.logDir, "exported_model"))


if __name__ == "__main__":
    main()
