"""Stochastic video sampling CLI.

Flag/output parity with reference ``generate_samples.py``: reads all
jpg/png/jpeg start frames from ``assets/GT_samples/<dataset>[/<texture>]``,
normalises + resizes to the model's image size, samples videos in batches of
``-bs`` and writes ``assets/results/<path>/results.gif``.

``-gpu`` is accepted for CLI parity but ignored — device selection is JAX's
(the TPU chip is used when present).
"""

import argparse
import glob
import math
import os

import numpy as np

IMG_SUFFIX = ["jpg", "png", "jpeg"]


def load_images(img_path: str, img_res: int) -> np.ndarray:
    import cv2

    img_list = []
    for suffix in IMG_SUFFIX:
        img_list.extend(sorted(glob.glob(os.path.join(img_path, f"*.{suffix}"))))
    if not img_list:
        raise FileNotFoundError(f"no images found under {img_path}")
    imgs = []
    for name in img_list:
        img = cv2.cvtColor(cv2.imread(name), cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0
        img = (img - 0.5) / 0.5
        img = cv2.resize(img, (img_res, img_res), interpolation=cv2.INTER_LINEAR)
        imgs.append(np.transpose(img, (2, 0, 1)))  # (C,H,W) torch layout
    return np.stack(imgs, axis=0)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-gpu", type=str, required=False, help="ignored (JAX/TPU)")
    parser.add_argument("-dataset", type=str, required=True, help="Specify dataset")
    parser.add_argument("-texture", type=str, help="Specify texture when using DTDB")
    parser.add_argument("-ckpt_path", type=str, required=False, help="If ckpt outside of repo")
    parser.add_argument("-seq_length", type=int, default=16)
    parser.add_argument("-bs", type=int, default=6, help="Batchsize")
    parser.add_argument("-seed", type=int, default=0)
    # TPU-only additions over the reference flag surface: shard each sampling
    # batch over all visible chips (weights replicated, batch data-parallel),
    # and serve the decoder in bf16 (the benchmarked fast path — BASELINE.md)
    parser.add_argument("-data_parallel", action="store_true",
                        help="sample data-parallel over all devices")
    parser.add_argument("-compute_dtype", type=str, default="float32",
                        choices=["float32", "bfloat16"],
                        help="decoder serving dtype (flow stays fp32)")
    parser.add_argument("-spatial_shard", type=int, default=0,
                        help="width-shard the decoder over N devices for "
                        "single-video latency (composes with -data_parallel "
                        "via a 2-D (data, model) mesh; 0 = off)")
    args = parser.parse_args()

    from image2video_synthesis_using_cinns_tpu.models.facade import Model
    from image2video_synthesis_using_cinns_tpu.utils import video as vid

    path_ds = f"{args.dataset}/{args.texture}" if args.dataset == "DTDB" else args.dataset
    ckpt_path = args.ckpt_path or f"./models/{path_ds}/stage2/"
    img_path = f"./assets/GT_samples/{path_ds}/"

    model = Model(
        ckpt_path, args.seq_length, seed=args.seed,
        data_parallel=args.data_parallel, compute_dtype=args.compute_dtype,
        spatial_shard=args.spatial_shard or False,
    )
    img_res = model.config_stage1.Data["img_size"]
    imgs = load_images(img_path, img_res)

    bs = args.bs
    length = math.ceil(imgs.shape[0] / bs)
    videos = []
    for i in range(length):
        batch = imgs[i * bs : (i + 1) * bs]
        videos.append(np.asarray(model(batch)))
    videos = np.concatenate(videos, axis=0)

    save_path = f"./assets/results/{path_ds}/"
    os.makedirs(save_path, exist_ok=True)
    gif = vid.convert_seq2gif(videos)
    import imageio

    imageio.mimsave(save_path + "results.gif", gif.astype(np.uint8), fps=3)
    print(f"Animations saved in {save_path}")


if __name__ == "__main__":
    main()
