"""Resampling / norm ops parity against torch oracles (torch-CPU available)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from image2video_synthesis_using_cinns_tpu.ops.resize import (
    resize_bilinear_align_corners,
    upsample_nearest,
)
from image2video_synthesis_using_cinns_tpu.ops.norms import instance_norm
from image2video_synthesis_using_cinns_tpu.models.layers import (
    GroupNorm,
    avg_pool,
    leaky_relu,
    max_pool,
)


def test_align_corners_bilinear_matches_torch(rng):
    x = rng.standard_normal((2, 7, 9, 3)).astype(np.float32)
    for size in [(13, 17), (3, 4), (7, 9), (64, 64), (1, 5)]:
        ours = np.asarray(resize_bilinear_align_corners(jnp.asarray(x), size))
        theirs = (
            F.interpolate(
                torch.from_numpy(x).permute(0, 3, 1, 2),
                size=size, mode="bilinear", align_corners=True,
            )
            .permute(0, 2, 3, 1)
            .numpy()
        )
        np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-5)


def test_nearest_upsample_matches_torch(rng):
    x = rng.standard_normal((2, 3, 4, 5, 6)).astype(np.float32)  # (B,T,H,W,C)
    ours = np.asarray(upsample_nearest(jnp.asarray(x), (2, 2, 2), (1, 2, 3)))
    theirs = (
        F.interpolate(torch.from_numpy(x).permute(0, 4, 1, 2, 3), scale_factor=2)
        .permute(0, 2, 3, 4, 1)
        .numpy()
    )
    np.testing.assert_allclose(ours, theirs)

    ours2 = np.asarray(upsample_nearest(jnp.asarray(x), (2, 1, 1), (1, 2, 3)))
    theirs2 = (
        F.interpolate(torch.from_numpy(x).permute(0, 4, 1, 2, 3), scale_factor=(2, 1, 1))
        .permute(0, 2, 3, 4, 1)
        .numpy()
    )
    np.testing.assert_allclose(ours2, theirs2)


def test_instance_norm3d_matches_torch(rng):
    x = rng.standard_normal((2, 4, 5, 6, 8)).astype(np.float32)
    ours = np.asarray(instance_norm(jnp.asarray(x)))
    theirs = (
        F.instance_norm(torch.from_numpy(x).permute(0, 4, 1, 2, 3))
        .permute(0, 2, 3, 4, 1)
        .numpy()
    )
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_group_norm_matches_torch(rng):
    x = rng.standard_normal((2, 5, 6, 32)).astype(np.float32)
    gn = GroupNorm(num_groups=16)
    variables = gn.init(jax.random.PRNGKey(0), jnp.asarray(x))
    ours = np.asarray(gn.apply(variables, jnp.asarray(x)))
    theirs = (
        F.group_norm(torch.from_numpy(x).permute(0, 3, 1, 2), 16)
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)

    # 5D (video) input
    xv = rng.standard_normal((2, 3, 4, 5, 32)).astype(np.float32)
    variables = gn.init(jax.random.PRNGKey(0), jnp.asarray(xv))
    ours = np.asarray(gn.apply(variables, jnp.asarray(xv)))
    theirs = (
        F.group_norm(torch.from_numpy(xv).permute(0, 4, 1, 2, 3), 16)
        .permute(0, 2, 3, 4, 1)
        .numpy()
    )
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_pools_match_torch(rng):
    x = rng.standard_normal((2, 5, 10, 12, 7)).astype(np.float32)
    xt = torch.from_numpy(x).permute(0, 4, 1, 2, 3)
    ours = np.asarray(max_pool(jnp.asarray(x), (3, 3, 3), (1, 2, 2), (1, 1, 1)))
    theirs = (
        F.max_pool3d(xt, kernel_size=3, stride=(1, 2, 2), padding=1)
        .permute(0, 2, 3, 4, 1)
        .numpy()
    )
    np.testing.assert_allclose(ours, theirs)

    x2 = rng.standard_normal((2, 3, 4, 4, 7)).astype(np.float32)
    ours2 = np.asarray(avg_pool(jnp.asarray(x2), (1, 4, 4), (1, 1, 1)))
    theirs2 = (
        F.avg_pool3d(torch.from_numpy(x2).permute(0, 4, 1, 2, 3), (1, 4, 4), stride=1)
        .permute(0, 2, 3, 4, 1)
        .numpy()
    )
    np.testing.assert_allclose(ours2, theirs2, rtol=1e-5, atol=1e-6)


def test_leaky_relu_matches_torch(rng):
    x = rng.standard_normal((17,)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(leaky_relu(jnp.asarray(x), 0.2)),
        F.leaky_relu(torch.from_numpy(x), 0.2).numpy(),
    )


def test_folded_conv3d_matches_direct(rng, monkeypatch):
    """The small-batch folded (3x 2D over B*T) conv3d lowering
    (models/layers.py::_conv3x3x3_folded) must match the direct 3D conv to
    reassociation noise, values AND gradients, including the T=1 edge
    (head_0's (B,1,4,4,C) input where both temporal taps read zero-pad)."""
    from image2video_synthesis_using_cinns_tpu.models.layers import SNConv

    for shape in ((2, 5, 8, 8, 6), (2, 1, 4, 4, 6)):
        x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
        conv = SNConv(4, (3, 3, 3), padding=(1, 1, 1), use_spectral=True)
        variables = conv.init({"params": jax.random.PRNGKey(0)}, x)

        outs, grads = {}, {}
        for mode in ("direct", "fold"):
            monkeypatch.setenv("I2V_CONV3D_LOWERING", mode)

            def loss(v, x):
                return jnp.sum(conv.apply(v, x) ** 2)

            outs[mode] = np.asarray(conv.apply(variables, x))
            grads[mode] = jax.grad(loss)(variables, x)

        # fp32 reassociation noise only: ~3e-5 absolute on O(100) outputs
        np.testing.assert_allclose(
            outs["fold"], outs["direct"], rtol=1e-5, atol=1e-4
        )
        for (pa, a), (pb, b) in zip(
            jax.tree.leaves_with_path(grads["fold"]),
            jax.tree.leaves_with_path(grads["direct"]),
        ):
            assert pa == pb
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4,
                err_msg=f"grad {jax.tree_util.keystr(pa)} diverged",
            )


def test_folded_conv3d_gate():
    """auto-mode gate: fold only for small-batch stride-1 SAME 3x3x3."""
    from image2video_synthesis_using_cinns_tpu.models.layers import (
        _use_folded_conv3d,
    )

    assert _use_folded_conv3d((6, 16, 64, 64, 128), (3, 3, 3), (1, 1, 1), (1, 1, 1))
    assert not _use_folded_conv3d((24, 16, 64, 64, 128), (3, 3, 3), (1, 1, 1), (1, 1, 1))
    assert not _use_folded_conv3d((6, 16, 64, 64, 128), (3, 3, 3), (2, 2, 2), (1, 1, 1))
    assert not _use_folded_conv3d((6, 64, 64, 128), (3, 3), (1, 1), (1, 1))


def test_folded_conv3d_gate_dp_divisor():
    """Under data-parallel serving the gate compares the PER-DEVICE batch:
    a global batch of 24 over 8 chips runs each conv at batch 3, which XLA
    space-to-batch-rewrites just like a single-chip bs=3 program
    (conv3d_fold_divisor scopes the shard count into the gate)."""
    from image2video_synthesis_using_cinns_tpu.models.layers import (
        _use_folded_conv3d,
        conv3d_fold_divisor,
    )

    k, s, p = (3, 3, 3), (1, 1, 1), (1, 1, 1)
    # global 24 is >= 8, but 24/8 chips = 3/chip → fold
    assert not _use_folded_conv3d((24, 16, 64, 64, 128), k, s, p)
    with conv3d_fold_divisor(8):
        assert _use_folded_conv3d((24, 16, 64, 64, 128), k, s, p)
        # 128/8 = 16/chip → direct lowering stays
        assert not _use_folded_conv3d((128, 16, 64, 64, 128), k, s, p)
    # scope exits cleanly
    assert not _use_folded_conv3d((24, 16, 64, 64, 128), k, s, p)
