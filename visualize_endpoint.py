"""Endpoint-controlled synthesis CLI (BAIR only, like the reference).

Flag/output parity with reference ``visualize_endpoint.py``: loads the
``stage2_control`` checkpoint, iterates the BAIR endpoint eval loader
(supplying the 3-dof end-effector target), generates ``-n_realiz``
realisations per test item and writes ``assets/results/bair_endpoint/
endpoint_<idx>.gif`` + last-frame PNG grids.
"""

import argparse
import os

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-gpu", type=str, required=False, help="ignored (JAX/TPU)")
    parser.add_argument("-dataset", type=str, required=True)
    parser.add_argument("-data_path", type=str, required=False)
    parser.add_argument("-ckpt_path", type=str, required=False)
    parser.add_argument("-seq_length", type=int, default=16)
    parser.add_argument("-n_samples", type=int, default=15)
    parser.add_argument("-n_realiz", type=int, default=8)
    parser.add_argument("-bs", type=int, default=6)
    # TPU-only additions (mirrors generate_samples.py): n_realiz samplings
    # per batch dominate the wall-clock
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

    assert args.dataset == "bair"

    import jax.numpy as jnp

    from image2video_synthesis_using_cinns_tpu.data import get_eval_loader
    from image2video_synthesis_using_cinns_tpu.data.augment import build_augment
    from image2video_synthesis_using_cinns_tpu.data.framestore import open_or_build
    from image2video_synthesis_using_cinns_tpu.data.loader import Loader
    from image2video_synthesis_using_cinns_tpu.models.facade import Model
    from image2video_synthesis_using_cinns_tpu.utils import video as vid

    ckpt_path = args.ckpt_path or f"./models/{args.dataset}/stage2_control/"
    model = Model(ckpt_path, args.seq_length,
                  data_parallel=args.data_parallel,
                  compute_dtype=args.compute_dtype,
                  spatial_shard=args.spatial_shard or False)
    img_size = model.config.Data["img_size"]

    dataset = get_eval_loader(
        args.dataset, args.seq_length + 1, args.data_path, model.config, control=True
    )
    fs = open_or_build(dataset, model.config.Data.get("framestore", "off"), "test")
    loader = Loader(dataset, args.bs, shuffle=False, drop_last=False, workers=10,
                    framestore=fs)
    aug = build_augment(img_size, None, False, False)

    import jax

    seq_fake = []
    for r in range(args.n_realiz):
        seq_fakes, num_samples = [], 0
        for batch in loader.epoch_iter(0):
            seq = aug(jnp.asarray(batch["seq_raw"]), jax.random.PRNGKey(0))
            x0 = np.transpose(np.asarray(seq[:, 0]), (0, 3, 1, 2))
            gen = np.asarray(model(x0, cond=batch["cond"]))
            seq_fakes.append(gen)
            num_samples += gen.shape[0]
            if num_samples >= args.n_samples:
                break
        seq_fake.append(np.concatenate(seq_fakes, axis=0))

    videos = np.stack(seq_fake, axis=1)[: args.n_samples]

    save_path = "./assets/results/bair_endpoint/"
    os.makedirs(save_path, exist_ok=True)
    import imageio

    for idx, v in enumerate(videos):
        gif = vid.convert_seq2gif(v)
        imageio.mimsave(save_path + f"endpoint_{idx}.gif", gif.astype(np.uint8), fps=3)
        # last-frame grid (reference uses torchvision.utils.save_image)
        last = np.transpose(v[:, -1], (0, 2, 3, 1))
        grid = np.concatenate(list(np.clip((last + 1) / 2, 0, 1)), axis=1)
        imageio.imwrite(save_path + f"endpoint_{idx}.png", (grid * 255).astype(np.uint8))

    print(f"Animations saved in {save_path}")


if __name__ == "__main__":
    main()
