"""Stage-2 cINN training CLI (parity with ``python -m stage2_cINN.main``)."""

import argparse

from image2video_synthesis_using_cinns_tpu import config as cfg
from image2video_synthesis_using_cinns_tpu.train.stage2 import main

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("-cf", "--config", type=str, required=True, help="Define config file")
    parser.add_argument("-gpu", type=str, required=False, help="ignored (JAX/TPU)")
    args = parser.parse_args()
    main(cfg.load(args.config))
