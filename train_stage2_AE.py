"""Stage-2 conditioning-AE training CLI (parity with
``python -m stage2_cINN.AE.main``)."""

import argparse

from image2video_synthesis_using_cinns_tpu import config as cfg
from image2video_synthesis_using_cinns_tpu.train.stage2_ae import main

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "-cf", "--config", type=str, default="configs/stage2_AE/bair_config.yaml",
        help="Define config file",
    )
    parser.add_argument("-gpu", type=str, required=False, help="ignored (JAX/TPU)")
    args = parser.parse_args()
    main(cfg.load(args.config))
