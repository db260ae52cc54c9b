"""Synthesis-quality evaluation CLI (FID / LPIPS / DTFVD / FVD).

Flag/protocol parity with reference ``eval_synthesis_quality.py``: fixed seed
249, eval loader at ``seq_length + 1``, dataset-specific frame-concatenation
protocols (bair: prepend GT frame 0 + drop last generated frame per the
FVD-paper convention; iPER: prepend GT frame, keep all generated; textures:
generated only), then the selected metrics. The official TF1 FVD is replaced
by the JAX kinetics-I3D path with videos grouped in 16s (see
``metrics/fvd.py`` for the documented delta).
"""

import argparse

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-gpu", type=str, required=False, help="ignored (JAX/TPU)")
    parser.add_argument("-dataset", type=str)
    parser.add_argument("-texture", type=str, required=False)
    parser.add_argument("-ckpt_path", type=str, required=False)
    parser.add_argument("-data_path", type=str, required=False)
    parser.add_argument("-seq_length", type=int, default=16)
    parser.add_argument("-bs", type=int, default=6)
    parser.add_argument("-FID", type=bool)
    parser.add_argument("-FVD", type=bool)
    parser.add_argument("-DTFVD", type=bool)
    parser.add_argument("-LPIPS", type=bool)
    # TPU-only additions (mirrors generate_samples.py): the eval wall-clock
    # is dominated by model(...) sampling, so shard it over all visible
    # chips and/or serve the decoder in bf16
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

    dataset = get_eval_loader(args.dataset, args.seq_length + 1, args.data_path, model.config)
    fs = open_or_build(dataset, model.config.Data.get("framestore", "off"), "test")
    loader = Loader(dataset, args.bs, shuffle=False, drop_last=False, workers=10,
                    framestore=fs)
    aug = build_augment(img_size, None, False, False)

    # Streaming: each batch is reduced to backbone activations immediately —
    # peak host memory is one batch of clips plus activation rows, instead of
    # the reference's whole-eval-set fp32 arrays
    # (/root/reference/eval_synthesis_quality.py:41-113). Reductions and
    # tail-drop populations match the materialised path exactly
    # (metrics/streaming_eval.py; parity test tests/test_streaming_eval.py).
    from image2video_synthesis_using_cinns_tpu.metrics.streaming_eval import (
        SynthesisQualityStream,
    )

    stream = SynthesisQualityStream(
        want_fid=bool(args.FID), want_lpips=bool(args.LPIPS),
        want_fvd=bool(args.FVD), want_dtfvd=bool(args.DTFVD),
        seq_length=args.seq_length,
    )
    for batch in loader.epoch_iter(0):
        seq_cl = aug(jnp.asarray(batch["seq_raw"]), jax.random.PRNGKey(0))
        seq = np.transpose(np.asarray(seq_cl), (0, 1, 4, 2, 3))  # (B,T,C,H,W)
        gen = np.asarray(model(seq[:, 0]))
        if args.dataset == "bair":
            gen = np.concatenate((seq[:, :1], gen[:, :-1]), axis=1)
            real = seq[:, :-1]
        elif args.dataset == "iPER":
            gen = np.concatenate((seq[:, :1], gen), axis=1)
            real = seq
        else:
            real = seq[:, :-1]
        stream.add_batch(gen, real)

    results = stream.results()
    if args.FID:
        print("Evaluate FID")
        print(f"FID score of {results['FID']}")
    if args.LPIPS:
        print("Evaluate LPIPS")
        print(f"LPIPS score of {results['LPIPS']}")
    if args.DTFVD:
        print("Evaluate DTFVD")
        print(f"DTFVD score of {results['DTFVD']}")
    if args.FVD:
        print("Evaluate FVD")
        print(f"FVD score of {results['FVD']}")


if __name__ == "__main__":
    main()
