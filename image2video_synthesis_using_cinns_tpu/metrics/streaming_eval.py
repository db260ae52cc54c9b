"""Streaming accumulators for the offline eval CLIs.

The reference eval protocol (``/root/reference/eval_synthesis_quality.py:
41-113``) materialises the ENTIRE eval set — real + generated clips — as fp32
host arrays before scoring; at iPER scale (1000 clips × 17×3×128², real +
fake + realizations) that is multiple GB of host RSS. These accumulators keep
only per-frame/per-clip backbone ACTIVATIONS (a few hundred KB–MB) and
reproduce the reference's reductions — including its deliberate
tail-dropping batch populations — at ``results()`` time:

  * FID: InceptionV3 rows per frame; population = first ``(N//bs)*bs`` frames
    with ``bs = min(50, N)`` (``metrics/FID/FID_Score.py:192-200`` via
    ``fid.get_activations``).
  * LPIPS: per-frame distances; reference reduction is mean-of-batch-means
    over batches of exactly 10, tail dropped
    (``eval_synthesis_quality.py:80-92``).
  * DTFVD: DT-I3D rows per clip (16f tile×3 prep), population = first
    ``(N//bs)*bs`` clips with ``bs = min(40, N)``.
  * FVD (official protocol): kinetics-I3D logit rows per clip, population =
    first ``(N//16)*16`` clips (the ×16 grouping, then batch 16 — no further
    drop; ``eval_synthesis_quality.py:108-113``, ``metrics/FVD/FVD.py:89``).

Per-row activations are independent of how clips/frames were batched, so the
streamed values match the materialised path to float noise; the value-parity
test is ``tests/test_streaming_eval.py``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .frechet import frechet_from_activations


def _to_cl(x: np.ndarray) -> np.ndarray:
    """(…, C, H, W) torch layout → channels-last."""
    return np.moveaxis(np.asarray(x), -3, -1)


class _Pairs:
    """Accumulated (fake, real) activation rows."""

    def __init__(self):
        self.fake: list[np.ndarray] = []
        self.real: list[np.ndarray] = []

    def add(self, f, r):
        self.fake.append(np.asarray(f))
        self.real.append(np.asarray(r))

    def cat(self):
        return np.concatenate(self.fake, 0), np.concatenate(self.real, 0)

    @property
    def nbytes(self) -> int:
        return sum(a.nbytes for a in self.fake) + sum(a.nbytes for a in self.real)


class SynthesisQualityStream:
    """Per-batch streaming version of the eval CLI's metric block.

    ``add_batch(fake, real)`` takes the post-protocol torch-layout clips
    (B, T, C, H, W) in [-1, 1] — i.e. AFTER the dataset-specific frame
    concatenation — and immediately reduces them to activation rows on
    device; ``results()`` applies the reference reductions.
    """

    def __init__(self, want_fid=False, want_lpips=False, want_fvd=False,
                 want_dtfvd=False, seq_length: int = 16,
                 weights_root: str = "models"):
        self.seq_length = seq_length
        self._acc: dict[str, _Pairs] = {}
        self._fns = {}
        if want_fid:
            from .fid import load_inception

            module, variables = load_inception(weights_root)
            fid_run = jax.jit(lambda x, m=module, v=variables: m.apply(v, x))
            self._fns["FID"] = lambda f, r, run=fid_run: (run(f), run(r))
            self._acc["FID"] = _Pairs()
        if want_lpips:
            from .lpips_eval import load_lpips

            module, variables = load_lpips(weights_root)
            self._fns["LPIPS"] = jax.jit(
                lambda a, b, m=module, v=variables: jnp.reshape(
                    m.apply(v, a, b), (-1,)))
            self._acc["LPIPS"] = _Pairs()  # fake column used for distances
        if want_fvd:
            from . import fvd as fvd_mod

            model = fvd_mod.load_model("kinetics", weights_root)
            act = fvd_mod.activation_fn(model, (-1.0, 1.0))
            self._fns["FVD"] = lambda f, r, a=act, m=model: (
                a(m.variables, f), a(m.variables, r))
            self._acc["FVD"] = _Pairs()
        if want_dtfvd:
            from . import fvd as fvd_mod

            kind = "dt32" if seq_length > 16 else "dt16"
            model = fvd_mod.load_model(kind, weights_root)
            act = fvd_mod.activation_fn(model, (-1.0, 1.0))
            dt_len = 32 if seq_length > 16 else 16

            def dt(f, r, a=act, m=model, ln=dt_len):
                f = fvd_mod.prep_dt_time(f, ln)
                r = fvd_mod.prep_dt_time(r, ln)
                return a(m.variables, f), a(m.variables, r)

            self._fns["DTFVD"] = dt
            self._acc["DTFVD"] = _Pairs()

    def add_batch(self, fake, real) -> None:
        fake = np.asarray(fake)
        real = np.asarray(real)
        assert fake.shape == real.shape, (fake.shape, real.shape)
        f_cl = jnp.asarray(_to_cl(fake))
        r_cl = jnp.asarray(_to_cl(real))
        if "FID" in self._fns or "LPIPS" in self._fns:
            ff = f_cl.reshape((-1,) + f_cl.shape[2:])
            rf = r_cl.reshape((-1,) + r_cl.shape[2:])
            if "FID" in self._fns:
                self._acc["FID"].add(*self._fns["FID"](ff, rf))
            if "LPIPS" in self._fns:
                self._acc["LPIPS"].add(self._fns["LPIPS"](ff, rf),
                                       np.zeros((0,), np.float32))
        if "FVD" in self._fns:
            self._acc["FVD"].add(*self._fns["FVD"](f_cl, r_cl))
        if "DTFVD" in self._fns:
            self._acc["DTFVD"].add(*self._fns["DTFVD"](f_cl, r_cl))

    # -- reference reductions -------------------------------------------
    @staticmethod
    def _tail_drop(n: int, ref_bs: int) -> int:
        bs = min(ref_bs, n)
        return (n // bs) * bs if n else 0

    def results(self) -> dict[str, float]:
        out: dict[str, float] = {}
        if "FID" in self._acc:
            a1, a2 = self._acc["FID"].cat()
            keep = self._tail_drop(a1.shape[0], 50)
            out["FID"] = float(frechet_from_activations(a1[:keep], a2[:keep]))
        if "LPIPS" in self._acc:
            d = np.concatenate(self._acc["LPIPS"].fake, 0)
            n_batches = d.shape[0] // 10
            if n_batches:
                # mean of per-batch-of-10 means (eval_synthesis_quality.py:80-92)
                out["LPIPS"] = float(
                    d[: n_batches * 10].reshape(n_batches, 10).mean(axis=1).mean())
            else:
                out["LPIPS"] = float(d.mean()) if d.size else 0.0
        if "FVD" in self._acc:
            a1, a2 = self._acc["FVD"].cat()
            keep = a1.shape[0] // 16 * 16
            out["FVD"] = float(frechet_from_activations(a1[:keep], a2[:keep]))
        if "DTFVD" in self._acc:
            a1, a2 = self._acc["DTFVD"].cat()
            keep = self._tail_drop(a1.shape[0], 40)
            out["DTFVD"] = float(frechet_from_activations(a1[:keep], a2[:keep]))
        return out

    @property
    def retained_bytes(self) -> int:
        """Host bytes held by the accumulators — the streaming guarantee."""
        return sum(p.nbytes for p in self._acc.values())


class DiversityStream:
    """Streaming diversity accumulators (batch-major loop over the eval set,
    realisations inner — the materialised reference path is realisation-major
    which forces the full (B, n_realiz, T, C, H, W) fp32 array into RAM,
    ``/root/reference/eval_diversity.py`` / ``metrics/Diversity/*``).

    ``add_batch(stack)`` takes (B, n_realiz, T, C, H, W) in [-1, 1] for one
    eval batch. Retains: VGG pairwise scalars, I3D/DTI3D embedding rows.
    """

    def __init__(self, n_realiz: int, want_vgg=False, want_i3d=False,
                 want_dti3d=False, seq_length: int = 16,
                 weights_root: str = "models"):
        self.n = n_realiz
        self._vgg_scores: list[float] | None = [] if want_vgg else None
        self._i3d_rows: list[np.ndarray] | None = [] if want_i3d else None
        self._dt_rows: list[np.ndarray] | None = [] if want_dti3d else None
        self._vgg_fn = None
        if want_vgg:
            from ..models.backbones.vgg16 import VGG16Features
            from ..ops.resize import resize_bilinear

            vgg = VGG16Features()
            variables = jax.jit(vgg.init)(
                {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 224, 224, 3)))
            mean = np.asarray([0.485, 0.456, 0.406])
            std = np.asarray([0.229, 0.224, 0.225])

            @jax.jit
            def feats(frames):
                x = (frames - mean) / std
                x = resize_bilinear(x, (224, 224))
                return vgg.apply(variables, x)

            self._vgg_fn = feats
        if want_i3d:
            from . import fvd as fvd_mod

            m = fvd_mod.load_model("kinetics", weights_root)
            self._i3d_fn = fvd_mod.activation_fn(m, (-1.0, 1.0))
            self._i3d_model = m
        if want_dti3d:
            from . import fvd as fvd_mod

            kind = "dt32" if seq_length > 16 else "dt16"
            m = fvd_mod.load_model(kind, weights_root)
            self._dt_fn = fvd_mod.activation_fn(m, (-1.0, 1.0))
            self._dt_model = m
            self._dt_len = 32 if seq_length > 16 else 16

    def add_batch(self, stack) -> None:
        stack = np.asarray(stack)  # (B, n, T, C, H, W) in [-1, 1]
        b, n, t = stack.shape[:3]
        assert n == self.n
        if self._vgg_scores is not None:
            vids01 = (stack + 1.0) / 2.0
            for video in vids01:  # (n, T, C, H, W) — same per-video unit as
                # metrics/diversity.py::compute_vgg_diversity
                frames = _to_cl(video.reshape((-1,) + video.shape[2:]))
                fmap = self._vgg_fn(jnp.asarray(frames))
                for level in range(5):
                    f = np.asarray(fmap[level]).reshape(
                        (n, t) + fmap[level].shape[1:])
                    for i in range(n):
                        for j in range(n):
                            if i != j:
                                self._vgg_scores.append(
                                    float(np.mean((f[i] - f[j]) ** 2)))
        if self._i3d_rows is not None:
            flat = _to_cl(stack.reshape((-1,) + stack.shape[2:]))
            rows = np.asarray(
                self._i3d_fn(self._i3d_model.variables, jnp.asarray(flat)))
            self._i3d_rows.append(rows.reshape(b, n, -1))
        if self._dt_rows is not None:
            from . import fvd as fvd_mod

            flat = _to_cl(stack.reshape((-1,) + stack.shape[2:]))
            flat = fvd_mod.prep_dt_time(jnp.asarray(flat), self._dt_len)
            rows = np.asarray(self._dt_fn(self._dt_model.variables, flat))
            self._dt_rows.append(rows.reshape(b, n, -1))

    @staticmethod
    def _pairwise(embed: np.ndarray, n: int) -> float:
        return float(np.mean([
            np.mean((embed[:, i] - embed[:, j]) ** 2)
            for i in range(n) for j in range(n) if i != j
        ]))

    def results(self) -> dict[str, float]:
        out: dict[str, float] = {}
        if self._vgg_scores is not None:
            out["VGG"] = float(np.mean(self._vgg_scores))
        if self._i3d_rows is not None:
            embed = np.concatenate(self._i3d_rows, 0)  # (B, n, d)
            input_b = embed.shape[0] // 16 * 16  # ×16 grouping population
            out["I3D"] = self._pairwise(embed[:input_b], self.n)
        if self._dt_rows is not None:
            embed = np.concatenate(self._dt_rows, 0)
            keep = (embed.shape[0] // min(20, max(embed.shape[0], 1))) * min(
                20, max(embed.shape[0], 1))
            out["DTI3D"] = self._pairwise(embed[:keep], self.n) * 1000.0
        return out

    @property
    def retained_bytes(self) -> int:
        total = 0
        if self._vgg_scores is not None:
            total += 8 * len(self._vgg_scores)
        for rows in (self._i3d_rows, self._dt_rows):
            if rows is not None:
                total += sum(a.nbytes for a in rows)
        return total
