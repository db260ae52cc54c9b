"""Video export helpers (GIF / mp4), parity with reference
``utils/auxiliaries.py:15-55`` (``convert_seq2gif``, ``save_video``,
``plot_vid``, ``denorm``). Sequences here are numpy/JAX arrays in the torch
layout (B, T, C, H, W) in [-1, 1], matching the facade outputs."""

from __future__ import annotations

import os

import numpy as np


def denorm(x):
    return np.clip((np.asarray(x) + 1.0) / 2.0, 0.0, 1.0)


def convert_seq2gif(sequence) -> np.ndarray:
    """(B,T,C,H,W) in [-1,1] → (T,H,B*W,3) uint8-ranged float frames, batch
    tiled horizontally (reference lines 15-22)."""
    seq = denorm(sequence)
    seq = np.transpose(seq, (0, 1, 3, 4, 2))  # (B,T,H,W,C)
    img_gif = np.concatenate(list(seq), axis=2)  # tile batch along width
    maxv = np.max(img_gif)
    if maxv > 0:
        img_gif = 255.0 * img_gif / maxv
    return img_gif


def save_video(path: str, video: np.ndarray, fps: int = 3, loops: int = 6) -> None:
    import imageio

    try:
        writer = imageio.get_writer(path, fps=fps)
    except (ValueError, ImportError):
        # mp4 needs an ffmpeg imageio backend, which may be absent —
        # the GIF is the primary artifact.
        return
    long_video = np.tile(video, (loops, 1, 1, 1))
    for im in long_video:
        writer.append_data(im.astype(np.uint8))
    writer.close()


def plot_vid(opt, sequences, epoch: int = 0, mode: str = "train", path: str | None = None, axis: int = 1):
    import imageio

    sequence_gen, sequence_orig = sequences
    seq_gen = convert_seq2gif(sequence_gen)
    seq_orig = convert_seq2gif(sequence_orig)
    seq = np.concatenate((seq_gen, seq_orig), axis=axis)
    x, y = seq.shape[1] // 16 * 16, seq.shape[2] // 16 * 16
    seq = seq[:, :x, :y]
    if path is None:
        base = os.path.join(
            opt.Training["save_path"], "videos", f"{epoch + 1:03d}_sequence_{mode}"
        )
        imageio.mimsave(base + ".gif", seq.astype(np.uint8), fps=3)
        save_video(base + ".mp4", seq)
    else:
        imageio.mimsave(path + "seq.gif", seq.astype(np.uint8), fps=3)
        save_video(path + "seq.mp4", seq)
    return seq.astype(np.uint8).transpose(0, 3, 1, 2)
