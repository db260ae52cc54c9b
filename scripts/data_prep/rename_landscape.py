"""Offline landscape preparation: normalise frame filenames to
``frame<k>.jpg`` (parity with reference ``data/landscape/rename_images.py``)."""

import argparse
import glob
import os


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data_dir", required=True, help="dir with sky_train/ sky_test/")
    args = p.parse_args()

    for split in ("sky_train", "sky_test"):
        for vid_dir in sorted(glob.glob(os.path.join(args.data_dir, split, "*"))):
            frames = sorted(glob.glob(os.path.join(vid_dir, "*.jpg")))
            for k, old in enumerate(frames):
                new = os.path.join(vid_dir, f"frame{k}.jpg")
                if old != new:
                    os.rename(old, new)
        print(split, "done")


if __name__ == "__main__":
    main()
