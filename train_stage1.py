"""Stage-1 video-VAE training CLI (parity with ``python -m stage1_VAE.main``):
``-cf/--config`` YAML + optional ``-gpu`` (ignored; JAX owns devices)."""

import argparse

from image2video_synthesis_using_cinns_tpu import config as cfg
from image2video_synthesis_using_cinns_tpu.train.stage1 import main

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "-cf", "--config", type=str, default="configs/stage1/bair_config.yaml",
        help="Define config file",
    )
    parser.add_argument("-gpu", type=str, required=False, help="ignored (JAX/TPU)")
    args = parser.parse_args()
    main(cfg.load(args.config))
