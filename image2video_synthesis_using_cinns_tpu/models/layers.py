"""Shared linen layers: spectral-norm convolutions/dense, ActNorm, pooling.

Channels-last everywhere (NHWC / NDHWC) so convolutions map directly onto the
TPU MXU without layout transposes. Spectral norm keeps its power-iteration
vector in the ``"spectral"`` variable collection (see ``ops/spectral.py``);
ActNorm keeps its data-dependent-init flag in ``"actnorm_stats"``.
"""

from __future__ import annotations

import contextlib
import contextvars
import os
from typing import Any, Callable, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.spectral import kernel_to_matrix, spectral_normalize

Dtype = Any

# --------------------------------------------------------------------------
# weight initialisers matching the reference's torch init choices
# --------------------------------------------------------------------------

def torch_conv_default_init(fan_in_scale: float = 1.0):
    """torch Conv default: kaiming_uniform(a=sqrt(5)) == U(-1/sqrt(fan_in), +)."""

    def init(key, shape, dtype=jnp.float32):
        fan_in = 1
        for d in shape[:-1]:
            fan_in *= d
        bound = 1.0 / jnp.sqrt(fan_in * fan_in_scale)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def normal_init(std: float = 0.02):
    return nn.initializers.normal(stddev=std)


def xavier_uniform_gain(gain: float):
    return nn.initializers.variance_scaling(gain * gain, "fan_avg", "uniform")


kaiming_normal_fan_out = nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal")


def kaiming_normal_fan_out_exact(key, shape, dtype=jnp.float32):
    """Untruncated kaiming normal (torch ``kaiming_normal_`` has no truncation)."""
    fan_out = shape[-1]
    for d in shape[:-2]:
        fan_out *= d
    std = jnp.sqrt(2.0 / fan_out)
    return jax.random.normal(key, shape, dtype) * std


def orthogonal_conv_init(key, shape, dtype=jnp.float32):
    """torch ``orthogonal_`` on a conv weight: orthogonalise the (out, -1) matrix."""
    out = shape[-1]
    flat = 1
    for d in shape[:-1]:
        flat *= d
    q = jax.nn.initializers.orthogonal()(key, (out, flat), dtype)
    return jnp.moveaxis(q.reshape((out,) + shape[:-1]), 0, -1)


def uniform_bias_for_fan_in(fan_in: int):
    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / jnp.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


# --------------------------------------------------------------------------
# spectral norm mixin
# --------------------------------------------------------------------------

class _SpectralMixin:
    """Provides kernel spectral-normalisation backed by the 'spectral' collection."""

    def _maybe_spectral(self, kernel: jax.Array) -> jax.Array:
        if not self.use_spectral:  # type: ignore[attr-defined]
            return kernel
        out_features = kernel.shape[-1]
        in_flat = 1
        for d in kernel.shape[:-1]:
            in_flat *= d
        u_var = self.variable(  # type: ignore[attr-defined]
            "spectral",
            "u",
            lambda: _init_u(self.make_rng("params"), out_features),  # type: ignore[attr-defined]
        )
        v_var = self.variable(  # type: ignore[attr-defined]
            "spectral",
            "v",
            lambda: _init_u(self.make_rng("params"), in_flat),  # type: ignore[attr-defined]
        )
        matrix = kernel_to_matrix(kernel)
        eps = getattr(self, "sn_eps", 1e-12)
        mode = getattr(self, "sn_mode", "torch")
        if mode == "biggan":
            # reference BigGAN SpectralNorm (generator.py:31-43) recomputes
            # (v, u) from the *stored* u on every forward and never persists
            # the update — replicate: iterate, use refreshed vectors, no write.
            sigma, _, _ = spectral_normalize(
                matrix, u_var.value, v_var.value, update=True, eps=eps
            )
        else:
            update = (
                not self.is_initializing()  # type: ignore[attr-defined]
                and self.is_mutable_collection("spectral")  # type: ignore[attr-defined]
            )
            sigma, new_u, new_v = spectral_normalize(
                matrix, u_var.value, v_var.value, update=update, eps=eps
            )
            if update:
                u_var.value = new_u
                v_var.value = new_v
        return kernel / sigma


def _init_u(key, n):
    u = jax.random.normal(key, (n,))
    return u / (jnp.linalg.norm(u) + 1e-12)


# --------------------------------------------------------------------------
# convolution / dense layers
# --------------------------------------------------------------------------

class SNConv(nn.Module, _SpectralMixin):
    """N-D channels-last convolution with optional spectral norm.

    ``kernel_size``/``strides``/``padding`` are per spatial axis (2 entries for
    images, 3 for videos). Padding entries are symmetric torch-style ints.
    """

    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int] | None = None
    padding: Sequence[int] | None = None
    use_bias: bool = True
    use_spectral: bool = False
    kernel_init: Callable = None  # type: ignore[assignment]
    bias_init: Callable = None  # type: ignore[assignment]
    dtype: Dtype = None
    sn_eps: float = 1e-12
    sn_mode: str = "torch"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        ndim_sp = len(self.kernel_size)
        in_features = x.shape[-1]
        kshape = tuple(self.kernel_size) + (in_features, self.features)

        fan_in = in_features
        for k in self.kernel_size:
            fan_in *= k
        kernel_init = self.kernel_init or torch_conv_default_init()
        bias_init = self.bias_init or uniform_bias_for_fan_in(fan_in)

        kernel = self.param("kernel", kernel_init, kshape)
        kernel = self._maybe_spectral(kernel)

        strides = tuple(self.strides or (1,) * ndim_sp)
        padding = self.padding
        if padding is None:
            padding = (0,) * ndim_sp
        pad = [(p, p) for p in padding]

        dn = jax.lax.conv_dimension_numbers(
            x.shape, kshape, _dim_numbers(ndim_sp)
        )
        dtype = self.dtype or x.dtype
        if _use_folded_conv3d(x.shape, self.kernel_size, strides, padding):
            y = _conv3x3x3_folded(x.astype(dtype), kernel.astype(dtype), dtype)
        else:
            # preferred output type follows the compute dtype: the MXU still
            # accumulates in fp32 internally, and a mixed (bf16 in, f32 out)
            # conv has no transpose rule, which breaks jax.grad through bf16
            # forwards
            y = jax.lax.conv_general_dilated(
                x.astype(dtype),
                kernel.astype(dtype),
                window_strides=strides,
                padding=pad,
                dimension_numbers=dn,
                preferred_element_type=dtype,
            )
        if self.use_bias:
            bias = self.param("bias", bias_init, (self.features,))
            y = y + bias
        return y.astype(dtype)


# Under data-parallel serving the jitted program is written in GLOBAL shapes
# but each chip runs the conv at batch/n_devices — the space-to-batch rewrite
# the fold exists to avoid is a PER-DEVICE decision. Callers that shard the
# batch scope this divisor around their traced function so the gate compares
# the per-device batch (contextvar: trace-time only, no retrace hazard — the
# divisor is fixed per facade/mesh instance).
_fold_divisor: contextvars.ContextVar[int] = contextvars.ContextVar(
    "i2v_conv3d_fold_divisor", default=1
)


@contextlib.contextmanager
def conv3d_fold_divisor(n_devices: int):
    """Scope: the conv3d fold gate divides traced batch sizes by ``n_devices``
    (the data-parallel shard count) before comparing against the fold
    threshold. Wrap the *traced* body (inside jit), not the dispatch site.

    Caveat: the divisor applies to EVERY conv3d traced inside the scope,
    including convs on replicated (non-batch-sharded) tensors — e.g. the
    transfer path's encoder pass over the replicated query video. Today all
    such tensors have batch 1 so the decision is unchanged, but a replicated
    batch >= 8 inside a DP scope would be mis-gated into the folded lowering
    (~0.57x at large batch). If that arises, scope the divisor only around
    the sub-programs whose batch axis is actually sharded."""
    token = _fold_divisor.set(max(1, int(n_devices)))
    try:
        yield
    finally:
        _fold_divisor.reset(token)


def _use_folded_conv3d(xshape, kernel_size, strides, padding) -> bool:
    """Small-batch (3,3,3) stride-1 SAME convs use the folded 2D lowering.

    At batch < 8, XLA:TPU rewrites the direct 3D conv with space-to-batch
    (a sub-sublane batch cannot fill the MXU), materialising haloed copies
    of every operand AND dragging the surrounding norm chains into the
    bloated layout — measured at ~15% of the whole bs=6 BAIR serving
    decoder (BASELINE.md round 3, "conv lowering"). Folding T into the
    batch gives the per-frame 2D convs a B*T >= 8 batch, so no rewrite
    happens and the conv FLOPs run at the chip's measured conv ceiling.
    At batch >= 8 the direct lowering is strictly better (the fold's 3x
    input reads cost more than they save: 0.57x at bs=24) — hence the
    static gate on the traced batch size.

    ``I2V_CONV3D_LOWERING`` ∈ {auto (default), direct, fold} overrides for
    A/B measurement.
    """
    mode = os.environ.get("I2V_CONV3D_LOWERING", "auto")
    if mode == "direct":
        return False
    eligible = (
        len(xshape) == 5
        and tuple(kernel_size) == (3, 3, 3)
        and tuple(strides) == (1, 1, 1)
        and tuple(padding) == (1, 1, 1)
    )
    if mode == "fold":
        return eligible
    per_device_batch = -(-xshape[0] // _fold_divisor.get())
    return eligible and per_device_batch < 8


def _conv3x3x3_folded(x: jax.Array, kernel: jax.Array, dtype) -> jax.Array:
    """(3,3,3) stride-1 SAME conv as 3 summed per-frame 2D convs over a
    folded (B*T) batch (see ``_use_folded_conv3d``).

    Partials accumulate with the same ``preferred_element_type`` policy as
    the direct lowering, so for fp32 the only difference is reassociation
    (~1e-6 relative; pinned by tests/test_ops.py); bf16 partials round per
    tap, which every consumer treats as ordinary bf16 noise.
    """
    b, t, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
    acc = None
    for dt in range(3):
        xi = jax.lax.dynamic_slice_in_dim(xp, dt, t, axis=1)
        o = jax.lax.conv_general_dilated(
            xi.reshape(b * t, h, w, c),
            kernel[dt],
            window_strides=(1, 1),
            padding=[(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=dtype,
        )
        acc = o if acc is None else acc + o
    return acc.reshape(b, t, h, w, acc.shape[-1])


def _dim_numbers(ndim_sp: int):
    if ndim_sp == 1:
        return ("NWC", "WIO", "NWC")
    if ndim_sp == 2:
        return ("NHWC", "HWIO", "NHWC")
    if ndim_sp == 3:
        return ("NDHWC", "DHWIO", "NDHWC")
    raise ValueError(f"unsupported conv rank {ndim_sp}")


class SNDense(nn.Module, _SpectralMixin):
    features: int
    use_bias: bool = True
    use_spectral: bool = False
    kernel_init: Callable = None  # type: ignore[assignment]
    bias_init: Callable = None  # type: ignore[assignment]
    dtype: Dtype = None
    sn_eps: float = 1e-12
    sn_mode: str = "torch"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_features = x.shape[-1]
        kernel_init = self.kernel_init or torch_conv_default_init()
        bias_init = self.bias_init or uniform_bias_for_fan_in(in_features)
        # stored as (in, out); spectral norm needs torch's (out, in) view
        kernel = self.param("kernel", kernel_init, (in_features, self.features))
        kernel = self._maybe_spectral(kernel)
        dtype = self.dtype or x.dtype
        # same dtype policy as SNConv (mixed-out dot also lacks a transpose)
        y = jnp.dot(x.astype(dtype), kernel.astype(dtype), preferred_element_type=dtype)
        if self.use_bias:
            y = y + self.param("bias", bias_init, (self.features,))
        return y.astype(dtype)


# --------------------------------------------------------------------------
# norms
# --------------------------------------------------------------------------

class GroupNorm(nn.Module):
    """GroupNorm with torch eps (1e-5), channels-last, any spatial rank.

    Stats are computed by reducing in the NATIVE (..., C) layout: first a
    per-channel sum / sum-of-squares (a lane-friendly reduction), then the
    tiny (B, C) result is folded into groups. Never reshape the big tensor
    into (B, -1, G, C/G) — on TPU that layout pads the trailing (.., C/G)
    tile to 128 lanes, an 8x memory blow-up that both OOMs training and
    wrecks inference bandwidth.
    """

    num_groups: int = 16
    use_affine: bool = True
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        g = self.num_groups
        assert c % g == 0, f"channels {c} not divisible by groups {g}"
        b = x.shape[0]
        spatial = 1
        for d in x.shape[1:-1]:
            spatial *= d
        cnt = spatial * (c // g)

        x32 = x.astype(jnp.float32)
        axes = tuple(range(1, x.ndim - 1))
        s1 = jnp.sum(x32, axis=axes)            # (B, C)
        s2 = jnp.sum(x32 * x32, axis=axes)      # (B, C)
        s1g = jnp.sum(s1.reshape(b, g, c // g), axis=-1)  # (B, G)
        s2g = jnp.sum(s2.reshape(b, g, c // g), axis=-1)
        mean_g = s1g / cnt
        var_g = jnp.maximum(s2g / cnt - mean_g * mean_g, 0.0)
        # broadcast group stats back to per-channel vectors
        mean_c = jnp.repeat(mean_g, c // g, axis=-1)  # (B, C)
        rstd_c = jax.lax.rsqrt(var_g + self.eps)
        rstd_c = jnp.repeat(rstd_c, c // g, axis=-1)
        bshape = (b,) + (1,) * (x.ndim - 2) + (c,)
        y = (x32 - mean_c.reshape(bshape)) * rstd_c.reshape(bshape)
        if self.use_affine:
            scale = self.param("scale", nn.initializers.ones, (c,))
            bias = self.param("bias", nn.initializers.zeros, (c,))
            y = y * scale + bias
        return y.astype(x.dtype)


class BatchNorm(nn.Module):
    """BatchNorm with torch semantics: running stats in 'batch_stats'.

    ``use_running_average=True`` == torch eval mode.
    """

    use_affine: bool = True
    eps: float = 1e-5
    momentum: float = 0.1  # torch momentum convention: new = (1-m)*old + m*batch

    @nn.compact
    def __call__(self, x: jax.Array, use_running_average: bool = True) -> jax.Array:
        c = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((c,)))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((c,)))
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            axes = tuple(range(x.ndim - 1))
            x32 = x.astype(jnp.float32)
            mean = jnp.mean(x32, axis=axes)
            var = jnp.var(x32, axis=axes)
            if not self.is_initializing() and self.is_mutable_collection("batch_stats"):
                n = 1
                for ax in axes:
                    n *= x.shape[ax]
                unbiased = var * n / max(n - 1, 1)
                m = self.momentum
                ra_mean.value = (1 - m) * ra_mean.value + m * mean
                ra_var.value = (1 - m) * ra_var.value + m * unbiased
        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.eps)
        if self.use_affine:
            scale = self.param("scale", nn.initializers.ones, (c,))
            bias = self.param("bias", nn.initializers.zeros, (c,))
            y = y * scale + bias
        return y.astype(x.dtype)


class ActNormImage(nn.Module):
    """Per-channel affine with data-dependent init (image variant).

    Mirrors the patch-disc / AE ActNorm (reference
    ``stage1_VAE/modules/patch_disc.py:16-98``): initialisation from the first
    *training* batch (gated on train mode), parameters ``loc``/``scale`` with
    ``h = scale * (x + loc)``.

    JAX has no in-forward parameter mutation, so data-dependent init is an
    *explicit pass*: apply the model once with the ``"actnorm_stats"``
    collection mutable — each ActNorm then computes batch stats, uses them
    immediately for this forward (so downstream ActNorms see correctly
    normalised activations, exactly like torch's sequential in-place init) and
    records them in the collection. ``merge_actnorm_init`` (below) then folds
    the recorded values into the params pytree. During ordinary train/eval
    steps the collection is not mutable and the stored params are used as-is.
    """

    logdet: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        c = x.shape[-1]
        loc = self.param("loc", nn.initializers.zeros, (c,))
        scale = self.param("scale", nn.initializers.ones, (c,))
        initialized = self.variable(
            "actnorm_stats", "initialized", lambda: jnp.zeros((), jnp.uint8)
        )
        loc_init = self.variable("actnorm_stats", "loc_init", lambda: jnp.zeros((c,)))
        scale_init = self.variable("actnorm_stats", "scale_init", lambda: jnp.ones((c,)))

        do_init = (
            train
            and not self.is_initializing()
            and self.is_mutable_collection("actnorm_stats")
        )
        if do_init:
            axes = tuple(range(x.ndim - 1))
            x32 = x.astype(jnp.float32)
            mean = jnp.mean(x32, axis=axes)
            std = jnp.std(x32, axis=axes, ddof=1)
            first = (initialized.value == 0).astype(jnp.float32)
            loc = first * (-mean) + (1 - first) * loc
            scale = first * (1.0 / (std + 1e-6)) + (1 - first) * scale
            loc_init.value = loc
            scale_init.value = scale
            initialized.value = jnp.ones((), jnp.uint8)

        h = scale * (x + loc)
        if self.logdet:
            hw = 1
            for ax in range(1, x.ndim - 1):
                hw *= x.shape[ax]
            ld = hw * jnp.sum(jnp.log(jnp.abs(scale)))
            return h, jnp.broadcast_to(ld, (x.shape[0],))
        return h

    @staticmethod
    def reverse(params, x):
        return x / params["scale"] - params["loc"]


def merge_actnorm_init(params, actnorm_stats):
    """Fold recorded data-dependent ActNorm stats into the params pytree.

    ``actnorm_stats`` is the (updated) collection returned by an apply call
    with ``mutable=['actnorm_stats']``; wherever it contains ``loc_init`` /
    ``scale_init`` alongside ``loc``/``scale`` params at the same module path,
    the params are replaced.
    """
    import flax

    flat_params = flax.traverse_util.flatten_dict(params)
    flat_stats = flax.traverse_util.flatten_dict(actnorm_stats)
    for path, value in flat_stats.items():
        if path[-1] == "loc_init":
            target = path[:-1] + ("loc",)
            if target in flat_params:
                flat_params[target] = value
        elif path[-1] == "scale_init":
            target = path[:-1] + ("scale",)
            if target in flat_params:
                flat_params[target] = value
    return flax.traverse_util.unflatten_dict(flat_params)


# --------------------------------------------------------------------------
# pooling
# --------------------------------------------------------------------------

def max_pool(x: jax.Array, window: Sequence[int], strides: Sequence[int], padding: Sequence[int]) -> jax.Array:
    """Channels-last max pool over the spatial axes with symmetric padding."""
    ones = (1,)
    win = ones + tuple(window) + ones
    strd = ones + tuple(strides) + ones
    pad = [(0, 0)] + [(p, p) for p in padding] + [(0, 0)]
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, win, strd, pad)


def avg_pool(x: jax.Array, window: Sequence[int], strides: Sequence[int], padding: Sequence[int] | None = None) -> jax.Array:
    ones = (1,)
    win = ones + tuple(window) + ones
    strd = ones + tuple(strides) + ones
    pad = [(0, 0)] + [(p, p) for p in (padding or (0,) * len(window))] + [(0, 0)]
    summed = jax.lax.reduce_window(x, 0.0, jax.lax.add, win, strd, pad)
    count = 1
    for w in window:
        count *= w
    return summed / count


def leaky_relu(x: jax.Array, slope: float = 0.2) -> jax.Array:
    return jnp.where(x >= 0, x, slope * x)
