"""On-device, jit-compiled clip augmentation (replaces the reference's
per-item CPU kornia pipeline, ``data/augmentation.py``).

The reference augments each clip on the CPU inside ``__getitem__`` with
``same_on_batch=True`` kornia ops — identical transform for every frame of a
clip. Here the loader ships raw uint8 frames to the device and a single jitted
function augments the whole batch: per-clip random draws (vmapped over the
batch axis), shared across the clip's frames.

Pipelines (matching the two reference variants):
  * standard (``Augmentation``): resize → hflip(p) → color-jitter → normalize
  * random-crop (``Augmentation_random_crop``): resize to size+16 → hflip →
    random crop → color-jitter → normalize

Color jitter uses torchvision factor semantics (kornia delegates to the same
definitions): brightness/contrast/saturation blend factors ~ U(1±x), hue shift
~ U(−h, h) in HSV, and — like torchvision/kornia ColorJitter — the enabled
adjustments are applied in a *random order* drawn per clip
(reference: ``data/augmentation.py:12-13`` delegates to kornia ColorJitter).
Normalize(0.5, 0.5) maps [0,1] → [−1,1].
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops.resize import resize_bilinear


def _grayscale(x):
    r, g, b = x[..., 0:1], x[..., 1:2], x[..., 2:3]
    return 0.299 * r + 0.587 * g + 0.114 * b


def _adjust_brightness(x, factor):
    return jnp.clip(x * factor, 0.0, 1.0)


def _adjust_contrast(x, factor):
    mean = jnp.mean(_grayscale(x), axis=tuple(range(x.ndim - 3, x.ndim)), keepdims=True)
    return jnp.clip(factor * x + (1 - factor) * mean, 0.0, 1.0)


def _adjust_saturation(x, factor):
    gray = _grayscale(x)
    return jnp.clip(factor * x + (1 - factor) * gray, 0.0, 1.0)


def _rgb_to_hsv(x):
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    maxc = jnp.max(x, axis=-1)
    minc = jnp.min(x, axis=-1)
    v = maxc
    deltac = maxc - minc
    s = jnp.where(maxc > 0, deltac / jnp.maximum(maxc, 1e-12), 0.0)
    deltac_safe = jnp.where(deltac == 0, 1.0, deltac)
    rc = (maxc - r) / deltac_safe
    gc = (maxc - g) / deltac_safe
    bc = (maxc - b) / deltac_safe
    h = jnp.where(
        maxc == r, bc - gc, jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc)
    )
    h = jnp.where(deltac == 0, 0.0, h)
    h = (h / 6.0) % 1.0
    return jnp.stack([h, s, v], axis=-1)


def _hsv_to_rgb(x):
    h, s, v = x[..., 0], x[..., 1], x[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - f * s)
    t = v * (1.0 - (1.0 - f) * s)
    i = i.astype(jnp.int32) % 6
    conds = [i == k for k in range(6)]
    r = jnp.select(conds, [v, q, p, p, t, v])
    g = jnp.select(conds, [t, v, v, q, p, p])
    b = jnp.select(conds, [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def _adjust_hue(x, shift):
    hsv = _rgb_to_hsv(x)
    h = (hsv[..., 0] + shift) % 1.0
    return _hsv_to_rgb(jnp.stack([h, hsv[..., 1], hsv[..., 2]], axis=-1))


def _augment_clip(clip, key, *, img_size, params, random_crop, train):
    """clip: (T,H,W,3) float in [0,1]."""
    k_flip, k_crop_y, k_crop_x, k_b, k_c, k_s, k_h, k_order = jax.random.split(key, 8)

    target = img_size + 16 if (train and random_crop) else img_size
    clip = resize_bilinear(clip, (target, target))

    if train:
        # horizontal flip, same for the whole clip
        do_flip = jax.random.bernoulli(k_flip, params.get("prob_hflip", 0.5))
        clip = jnp.where(do_flip, clip[:, :, ::-1, :], clip)

        if random_crop:
            # y/x offsets from independent keys — kornia RandomCrop samples
            # them independently (reference data/augmentation.py:11).
            y0 = jax.random.randint(k_crop_y, (), 0, 17)
            x0 = jax.random.randint(k_crop_x, (), 0, 17)
            clip = jax.lax.dynamic_slice(
                clip, (0, y0, x0, 0), (clip.shape[0], img_size, img_size, 3)
            )

        # Enabled jitter ops, each (adjust_fn, sampled factor). Applied below
        # in a random per-clip order, matching torchvision/kornia ColorJitter
        # semantics (reference data/augmentation.py:12-13).
        ops = []
        b = params.get("brightness", 0.0)
        if b:
            factor = jax.random.uniform(k_b, (), minval=max(0.0, 1 - b), maxval=1 + b)
            ops.append((_adjust_brightness, factor))
        c = params.get("contrast", 0.0)
        if c:
            factor = jax.random.uniform(k_c, (), minval=max(0.0, 1 - c), maxval=1 + c)
            ops.append((_adjust_contrast, factor))
        s = params.get("saturation", 0.0)
        if s:
            factor = jax.random.uniform(k_s, (), minval=max(0.0, 1 - s), maxval=1 + s)
            ops.append((_adjust_saturation, factor))
        h = params.get("hue", 0.0)
        if h:
            shift = jax.random.uniform(k_h, (), minval=-h, maxval=h)
            ops.append((_adjust_hue, shift))

        if len(ops) == 1:
            fn, factor = ops[0]
            clip = fn(clip, factor)
        elif len(ops) > 1:
            branches = [lambda cur, fn=fn, f=factor: fn(cur, f) for fn, factor in ops]
            perm = jax.random.permutation(k_order, len(ops))

            def _apply(i, cur):
                return jax.lax.switch(perm[i], branches, cur)

            clip = jax.lax.fori_loop(0, len(ops), _apply, clip)

    return (clip - 0.5) / 0.5


def build_augment(img_size: int, params: dict | None, random_crop: bool, train: bool):
    """Returns jitted fn: (uint8 batch (B,T,H,W,3), key) → float32 (B,T,H,W,3)
    in [-1,1], one independent transform per clip."""
    params = dict(params or {})

    @jax.jit
    def augment(batch_u8, key):
        x = batch_u8.astype(jnp.float32) / 255.0
        keys = jax.random.split(key, x.shape[0])
        fn = partial(
            _augment_clip,
            img_size=img_size,
            params=params,
            random_crop=random_crop,
            train=train,
        )
        return jax.vmap(fn)(x, keys)

    return augment
