"""Diversity evaluation CLI.

Flag/protocol parity with reference ``eval_diversity.py``: fixed seed 249,
``-n_realiz`` (default 5) realisations per test item, diversity via VGG /
kinetics-I3D / DT-I3D backbones (``-VGG -I3D -DTI3D``).
"""

import argparse

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-gpu", type=str, required=False, help="ignored (JAX/TPU)")
    parser.add_argument("-dataset", type=str, required=True)
    parser.add_argument("-texture", type=str)
    parser.add_argument("-ckpt_path", type=str, required=False)
    parser.add_argument("-data_path", type=str, required=True)
    parser.add_argument("-seq_length", type=int, default=16)
    parser.add_argument("-n_realiz", type=int, default=5)
    parser.add_argument("-bs", type=int, default=6)
    parser.add_argument("-I3D", type=bool)
    parser.add_argument("-VGG", type=bool)
    parser.add_argument("-DTI3D", type=bool)
    # TPU-only additions (mirrors generate_samples.py): n_realiz × batches
    # of sampling dominate the wall-clock — shard over all visible chips
    # and/or serve the decoder in bf16
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

    import jax
    import jax.numpy as jnp

    from image2video_synthesis_using_cinns_tpu.data import get_eval_loader
    from image2video_synthesis_using_cinns_tpu.data.augment import build_augment
    from image2video_synthesis_using_cinns_tpu.data.framestore import open_or_build
    from image2video_synthesis_using_cinns_tpu.data.loader import Loader
    from image2video_synthesis_using_cinns_tpu.metrics.streaming_eval import (
        DiversityStream,
    )
    from image2video_synthesis_using_cinns_tpu.models.facade import Model
    from image2video_synthesis_using_cinns_tpu.utils.seed import set_seed

    set_seed(249)

    path_ds = f"{args.dataset}/{args.texture}/" if args.dataset == "DTDB" else args.dataset
    ckpt_path = args.ckpt_path or f"./models/{path_ds}/stage2/"
    model = Model(ckpt_path, args.seq_length, seed=249,
                  data_parallel=args.data_parallel,
                  compute_dtype=args.compute_dtype,
                  spatial_shard=args.spatial_shard or False)
    img_size = model.config.Data["img_size"]

    dataset = get_eval_loader(args.dataset, args.seq_length, args.data_path, model.config)
    fs = open_or_build(dataset, model.config.Data.get("framestore", "off"), "test")
    loader = Loader(dataset, args.bs, shuffle=False, drop_last=False, workers=10,
                    framestore=fs)
    aug = build_augment(img_size, None, False, False)

    # Streaming, batch-major: each eval batch is sampled n_realiz times and
    # reduced to backbone embeddings / pairwise scalars immediately, instead
    # of materialising the full (B, n_realiz, T, C, H, W) fp32 stack
    # (/root/reference/eval_diversity.py is realisation-major and hoards it
    # all). To keep values identical to the realisation-major order, the
    # facade's ν stream is pre-drawn realisation-major and injected —
    # each (realisation, batch) pair gets exactly the noise it had before
    # (metrics/streaming_eval.py; parity test tests/test_streaming_eval.py).
    stream = DiversityStream(
        args.n_realiz, want_vgg=bool(args.VGG), want_i3d=bool(args.I3D),
        want_dti3d=bool(args.DTI3D), seq_length=args.seq_length,
    )
    n = len(loader.dataset)
    sizes = [args.bs] * (n // args.bs) + ([n % args.bs] if n % args.bs else [])
    residuals = [[model.draw_residual(s) for s in sizes]
                 for _ in range(args.n_realiz)]
    for i, batch in enumerate(loader.epoch_iter(0)):
        seq_cl = aug(jnp.asarray(batch["seq_raw"]), jax.random.PRNGKey(0))
        seq = np.transpose(np.asarray(seq_cl), (0, 1, 4, 2, 3))
        gens = [np.asarray(model.forward(seq[:, 0], residual=residuals[r][i]))
                for r in range(args.n_realiz)]
        stream.add_batch(np.stack(gens, axis=1))  # (B, n_realiz, T, C, H, W)

    results = stream.results()
    if args.VGG:
        print(f"Diversity score of {results['VGG']} using VGG backbone")
    if args.DTI3D:
        print(f"Diversity score of {results['DTI3D']} using I3D backbone pretrained on dynamic textures")
    if args.I3D:
        print(f"Diversity score of {results['I3D']} using I3D kinetics backbone")


if __name__ == "__main__":
    main()
