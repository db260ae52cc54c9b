"""Motion transfer CLI (landscape only, like the reference).

Flag/output parity with reference ``generate_transfer.py``: loads frame
sequences from ``assets/GT_samples/landscape/transfer/<video>/``, natural-sort
order, transfers each query video's dynamics onto all start frames, prepends
the query row and writes ``assets/results/landscape/transfer_<idx>.gif``.
"""

import argparse
import glob
import math
import os

import numpy as np

IMG_SUFFIX = ["jpg", "png", "jpeg"]


def natsorted(items):
    import re

    def key(s):
        return [int(t) if t.isdigit() else t for t in re.split(r"(\d+)", s)]

    return sorted(items, key=key)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-gpu", type=str, required=False, help="ignored (JAX/TPU)")
    parser.add_argument("-dataset", type=str, required=True)
    parser.add_argument("-ckpt_path", type=str, required=False)
    parser.add_argument("-seq_length", type=int, default=16)
    parser.add_argument("-bs", type=int, default=6)
    # TPU-only additions over the reference flag surface (same as the other
    # sampling CLIs): shard the start-frame batch over all visible chips and
    # serve the decoder in bf16 (the benchmarked fast path — BASELINE.md)
    parser.add_argument("-data_parallel", action="store_true",
                        help="transfer data-parallel over all devices")
    parser.add_argument("-compute_dtype", type=str, default="float32",
                        choices=["float32", "bfloat16"],
                        help="decoder serving dtype (flow stays fp32)")
    parser.add_argument("-spatial_shard", type=int, default=0,
                        help="width-shard the decoder over N devices for "
                        "single-video latency (composes with -data_parallel "
                        "via a 2-D (data, model) mesh; 0 = off)")
    args = parser.parse_args()

    assert args.dataset == "landscape", "Only implemented for landscape"

    import cv2

    from image2video_synthesis_using_cinns_tpu.models.facade import Model
    from image2video_synthesis_using_cinns_tpu.utils import video as vid

    ckpt_path = args.ckpt_path or f"./models/{args.dataset}/stage2/"
    model = Model(
        ckpt_path, args.seq_length, transfer=True,
        data_parallel=args.data_parallel, compute_dtype=args.compute_dtype,
        spatial_shard=args.spatial_shard or False,
    )
    img_res = model.config_stage1.Data["img_size"]

    img_path = f"./assets/GT_samples/{args.dataset}/transfer/"
    video_paths = natsorted(os.listdir(img_path))
    videos = []
    for vidp in video_paths:
        img_list = []
        for suffix in IMG_SUFFIX:
            img_list.extend(glob.glob(os.path.join(img_path, vidp, f"*.{suffix}")))
        img_list = natsorted(img_list)[: args.seq_length]
        seq = []
        for name in img_list:
            img = cv2.cvtColor(cv2.imread(name), cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0
            img = (img - 0.5) / 0.5
            img = cv2.resize(img, (img_res, img_res), interpolation=cv2.INTER_LINEAR)
            seq.append(np.transpose(img, (2, 0, 1)))
        videos.append(np.stack(seq, axis=0))
    videos = np.stack(videos, axis=0)  # (N, T, C, H, W)

    # the reference parses -bs but hardcodes 6 here (generate_transfer.py:49)
    # — replicated for output parity
    bs = 6
    length = math.ceil(videos.shape[0] / bs)
    save_path = f"./assets/results/{args.dataset}/"
    os.makedirs(save_path, exist_ok=True)
    import imageio

    for idx, query in enumerate(videos):
        transfer = []
        for i in range(length):
            batch = videos[i * bs : (i + 1) * bs, 0]
            transfer.append(np.asarray(model.transfer(query[None], batch)))
        transfer = np.concatenate(transfer, axis=0)
        transfer = np.concatenate((query[None, : transfer.shape[1]], transfer), axis=0)
        gif = vid.convert_seq2gif(transfer)
        imageio.mimsave(save_path + f"transfer_{idx}.gif", gif.astype(np.uint8), fps=3)
    print(f"Animations saved in {save_path}")


if __name__ == "__main__":
    main()
