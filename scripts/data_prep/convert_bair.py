"""Offline BAIR preparation: tfrecords → per-clip PNG frames + endpoint CSVs.

Layout parity with reference ``data/bair/convert_bair.py``: writes
``<output>/<split>/traj_x_to_y/<k>/<frame>.png`` plus
``endeffector_positions.csv`` per clip (the CSV feeds the endpoint-control
dataloader). Requires tensorflow to *read* tfrecords only; it is not part of
the runtime framework and this script errors cleanly when TF is absent.
"""

import argparse
import glob
import os


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data_dir", required=True, help="dir with BAIR .tfrecords")
    p.add_argument("--output_dir", required=True)
    args = p.parse_args()

    try:
        import tensorflow as tf
    except ImportError as e:  # pragma: no cover
        raise SystemExit(
            "tensorflow is required to decode BAIR tfrecords (offline data "
            "prep only); install it or convert on a machine that has it"
        ) from e

    import numpy as np
    from PIL import Image

    for split in ("train", "test"):
        files = sorted(glob.glob(os.path.join(args.data_dir, split, "*.tfrecords")))
        for fi, fname in enumerate(files):
            base = os.path.basename(fname).replace(".tfrecords", "")
            out_base = os.path.join(args.output_dir, split, base)
            for ti, record in enumerate(tf.data.TFRecordDataset(fname)):
                ex = tf.train.Example()
                ex.ParseFromString(record.numpy())
                feats = ex.features.feature
                out_dir = os.path.join(out_base, str(ti))
                os.makedirs(out_dir, exist_ok=True)
                positions = []
                frame = 0
                while f"{frame}/image_aux1/encoded" in feats:
                    raw = feats[f"{frame}/image_aux1/encoded"].bytes_list.value[0]
                    img = np.frombuffer(raw, np.uint8).reshape(64, 64, 3)
                    Image.fromarray(img).save(os.path.join(out_dir, f"{frame}.png"))
                    pos = feats[f"{frame}/endeffector_pos"].float_list.value
                    positions.append(list(pos))
                    frame += 1
                np.savetxt(
                    os.path.join(out_dir, "endeffector_positions.csv"),
                    np.asarray(positions), delimiter=",",
                )
            print(f"{split}: {fi + 1}/{len(files)} tfrecord files done")


if __name__ == "__main__":
    main()
