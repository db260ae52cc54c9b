"""Offline iPER preparation: mp4 videos → per-video frame PNGs.

Layout parity with reference ``data/iPER/extract_iPER.py``: each video
``<actor>/<outfit>/<action>.mp4`` becomes ``<out>/<actor>_<outfit>_<action>/
frame_<k>.png`` resized to ``--size``.
"""

import argparse
import glob
import os

import cv2


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--video_dir", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--size", type=int, default=256)
    args = p.parse_args()

    videos = sorted(glob.glob(os.path.join(args.video_dir, "**", "*.mp4"), recursive=True))
    for vi, path in enumerate(videos):
        rel = os.path.relpath(path, args.video_dir)
        name = os.path.splitext(rel)[0].replace(os.sep, "_")
        out_dir = os.path.join(args.output_dir, name)
        os.makedirs(out_dir, exist_ok=True)
        cap = cv2.VideoCapture(path)
        frame = 0
        while True:
            ok, img = cap.read()
            if not ok:
                break
            img = cv2.resize(img, (args.size, args.size), interpolation=cv2.INTER_AREA)
            cv2.imwrite(os.path.join(out_dir, f"frame_{frame}.png"), img)
            frame += 1
        cap.release()
        print(f"{vi + 1}/{len(videos)}: {name} ({frame} frames)")


if __name__ == "__main__":
    main()
