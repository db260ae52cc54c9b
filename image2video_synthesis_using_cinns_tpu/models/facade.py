"""User-facing ``Model`` facade: checkpoint-dir in, videos out.

Parity with reference ``get_model.py``:
  * configs are discovered by chaining: ``model_path/config_stage2.yaml`` →
    ``First_stage_model`` → ``config_stage1.yaml`` (decoder/encoder) and
    ``Conditioning_Model`` → ``config_stage2_AE.yaml`` (frozen embedder)
    (reference lines 14-45);
  * ``forward(x0, cond)``: draw ν ~ N(0,I), flow⁻¹ → z, decode, and extend
    autoregressively from the last frame until ``vid_length`` (lines 51-75);
  * ``transfer(seq_query, x0)``: encode query motion → flow → ν, flow⁻¹ under
    the new start frame, decode (lines 77-103).

Array API stays in the torch layout the reference CLIs use — x0 (B,C,H,W),
videos (B,T,C,H,W), all in [-1,1] — while everything inside runs channels-last
under one jitted function per (batch, length) signature.

Note: reference line 75 returns ``seq[:self.vid_length]`` which slices the
*batch* axis (a latent bug, harmless at the default 16-frame setting); we
implement the documented intent — time-axis truncation.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from .. import config as cfg
from ..utils import checkpoint as ckpt_io
from ..utils import compile_cache
from .stage1.decoder import Generator
from .stage1.resnet3d import Encoder
from .stage2.inn import SupervisedTransformer


def _join(*parts: str) -> str:
    return os.path.join(*[p for p in parts if p])


class Model:
    def __init__(
        self,
        model_path: str,
        vid_length: int,
        transfer: bool = False,
        seed: int = 0,
        use_pallas: bool = True,
        allow_random_init: bool = False,
        compute_dtype: str = "float32",
        data_parallel: bool = False,
        spatial_shard: bool | int = False,
    ):
        """``compute_dtype='bfloat16'`` runs the decoder in bf16 (the
        TPU-native serving dtype, ~3-4x faster); the flow inverse stays fp32
        for exact invertibility. Outputs are always fp32.

        ``data_parallel=True`` serves ``forward`` over ALL visible devices:
        weights replicated, the batch sharded on a 1-D ``data`` mesh (XLA
        derives the collectives — there are none in this embarrassingly
        parallel path, so scaling is linear in chips). Batches are padded to
        a device multiple and unpadded on return; single-device behaviour is
        unchanged. DP-vs-single-device numeric parity is tested on the
        8-device CPU mesh (tests/test_parallel.py).

        ``spatial_shard`` width-shards the SPADE decoder's activations over a
        ``model`` mesh axis (``parallel/spatial.py``): DP scales throughput
        with batch, this scales the latency of a SINGLE video — GSPMD inserts
        the conv halo exchanges and norm-stat all-reduces. ``True`` uses all
        visible devices; an int uses that many. Composes with
        ``data_parallel`` via a 2-D (data, model) mesh — then an explicit int
        is required (``spatial_shard=2`` with 8 devices → 4-way DP x 2-way
        spatial). Numerics match single-device to reassociation noise
        (tests/test_parallel.py); multi-chip latency scaling is a conditional
        GO pending real multi-chip measurement (BASELINE.md)."""
        compile_cache.enable_persistent_cache()  # no-op if already configured
        self.config = cfg.load(_join(model_path, "config_stage2.yaml"))
        opt = self.config
        path_stage1 = _join(
            opt.First_stage_model["model_path"], opt.First_stage_model["model_name"]
        )
        self.config_stage1 = cfg.load(_join(path_stage1, "config_stage1.yaml"))

        self.z_dim = self.config_stage1.Decoder["z_dim"]
        self.vid_length = vid_length
        self._rng = jax.random.PRNGKey(seed)
        self.compute_dtype = jnp.dtype(compute_dtype)

        img_size = 64
        if "Data" in self.config_stage1:
            img_size = self.config_stage1.Data.get("img_size", 64)

        # ---- decoder ------------------------------------------------------
        self.decoder = Generator.from_config(self.config_stage1.Decoder)
        dec_ckpt = ckpt_io.find(
            _join(path_stage1, opt.First_stage_model["checkpoint_decoder"])
        )
        self.decoder_vars = self._load_or_init(
            self.decoder,
            dec_ckpt,
            allow_random_init,
            init_args=lambda m: (
                jnp.zeros((1, img_size, img_size, 3)),
                jnp.zeros((1, self.z_dim)),
            ),
        )

        # ---- stage1 encoder (transfer only) -------------------------------
        self.encoder = None
        if transfer:
            self.encoder = Encoder.from_config(self.config_stage1.Encoder)
            enc_ckpt = ckpt_io.find(
                _join(path_stage1, opt.First_stage_model["checkpoint_encoder"])
            )
            self.encoder_vars = self._load_or_init(
                self.encoder,
                enc_ckpt,
                allow_random_init,
                init_args=lambda m: (jnp.zeros((1, 16, img_size, img_size, 3)),),
                init_rngs={"sample": jax.random.PRNGKey(0)},
            )

        # ---- cINN + frozen embedder ---------------------------------------
        cond_dic = opt.Conditioning_Model
        ae_dir = _join(cond_dic["model_path"], cond_dic["model_name"])
        ae_cfg_path = _join(ae_dir, "config_stage2_AE.yaml")
        ae_cfg = cfg.load(ae_cfg_path).AE if os.path.exists(ae_cfg_path) else None
        self.flow = SupervisedTransformer.from_configs(
            opt, self.config_stage1.Decoder, ae_cfg, use_pallas=use_pallas
        )

        flow_init_args = lambda m: (  # noqa: E731
            jnp.zeros((1, self.z_dim)),
            [jnp.zeros((1, img_size, img_size, 3))]
            + ([jnp.zeros((1, 3))] if m.control else []),
        )
        flow_ckpt = ckpt_io.find(_join(model_path, "cINN"))
        self.flow_vars = self._load_or_init(
            self.flow, flow_ckpt, allow_random_init, init_args=flow_init_args
        )
        # the frozen embedder ships separately (AE checkpoint); splice it in
        emb_ckpt = ckpt_io.find(_join(ae_dir, cond_dic.get("checkpoint_name", "")))
        if emb_ckpt is not None:
            emb_payload = ckpt_io.load(emb_ckpt)
            emb_vars = emb_payload.get("state_dict", emb_payload)
            self.flow_vars = _splice(self.flow_vars, "embedder", emb_vars)

        self._fn_cache: dict = {}

        # ---- optional data-parallel / spatial serving mesh -----------------
        self.mesh = None
        self._spatial = bool(spatial_shard)
        self._fold_div = 1  # conv3d fold gate: per-DEVICE batch under DP
        if data_parallel or spatial_shard:
            import numpy as _np

            from jax.sharding import Mesh
            from ..parallel.mesh import make_mesh, replicate

            if spatial_shard:
                devs = jax.devices()
                if spatial_shard is True:
                    if data_parallel:
                        raise ValueError(
                            "composing data_parallel with spatial_shard needs "
                            "an explicit spatial axis size: pass "
                            "spatial_shard=<int> (devices are split into a "
                            "2-D (data, model) mesh)"
                        )
                    n_sp = len(devs)
                else:
                    n_sp = int(spatial_shard)
                if n_sp < 2 or len(devs) % n_sp:
                    raise ValueError(
                        f"spatial_shard={n_sp} must be >=2 and divide the "
                        f"device count ({len(devs)})"
                    )
                n_dp = len(devs) // n_sp if data_parallel else 1
                self.mesh = Mesh(
                    _np.asarray(devs[: n_dp * n_sp]).reshape(n_dp, n_sp),
                    ("data", "model"),
                )
            else:
                self.mesh = make_mesh()
            self._fold_div = self.mesh.shape["data"]
            self.decoder_vars = replicate(self.mesh, self.decoder_vars)
            self.flow_vars = replicate(self.mesh, self.flow_vars)
            if self.encoder is not None:
                self.encoder_vars = replicate(self.mesh, self.encoder_vars)

    def _shard_rows(self, *arrays):
        """Pad each array's leading (batch) axis to a multiple of the mesh's
        ``data`` axis and shard it over it (replication over a ``model`` axis
        when spatial sharding is on). Returns (padded arrays, true batch)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        n_dev = self.mesh.shape["data"]
        b = arrays[0].shape[0]
        rem = (-b) % n_dev
        out = []
        for a in arrays:
            if rem:
                a = jnp.concatenate([a, jnp.repeat(a[-1:], rem, axis=0)], axis=0)
            out.append(
                jax.device_put(a, NamedSharding(self.mesh, P("data")))
            )
        return out, b

    # ------------------------------------------------------------------
    def _load_or_init(self, module, ckpt_path, allow_random_init, init_args, init_rngs=None):
        if ckpt_path is not None:
            payload = ckpt_io.load(ckpt_path)
            variables = payload.get("state_dict", payload)
            if isinstance(variables, dict) and not (
                "params" in variables or "buffers" in variables
            ):
                raise ValueError(
                    f"{ckpt_path} is not a native variables checkpoint (it "
                    "looks like a raw torch state_dict); convert it first: "
                    "python scripts/convert_weights.py <kind> --src <file>"
                )
            return variables
        if not allow_random_init:
            raise FileNotFoundError(
                f"no checkpoint found for {type(module).__name__}; pass "
                "allow_random_init=True to run with random weights (benchmarks)"
            )
        rngs = {"params": jax.random.PRNGKey(0)}
        if init_rngs:
            rngs.update(init_rngs)
        # jit the init: XLA dead-code-eliminates the forward compute, so this
        # compiles in seconds where eager init would compile each conv op.
        return jax.jit(module.init)(rngs, *init_args(module))

    def _next_key(self):
        self._rng, key = jax.random.split(self._rng)
        return key

    def _spatial_scope(self):
        """Trace-time width-sharding scope for the decoder (identity context
        when ``spatial_shard`` is off — see parallel/spatial.py)."""
        import contextlib

        if not self._spatial:
            return contextlib.nullcontext()
        from ..parallel.spatial import spatial_sharding

        # batch_axis keeps the DP row sharding through the decoder anchors
        # when composing with data_parallel (a 2-D mesh) — without it the
        # first constrain_spatial would all-gather the batch over 'data' and
        # every data-row of devices would redundantly decode the full batch.
        return spatial_sharding(self.mesh, "model", batch_axis="data")

    # ------------------------------------------------------------------
    # compiled kernels (cached per input signature)
    # ------------------------------------------------------------------
    def _decode(self, dec_vars, img, z):
        dt = self.compute_dtype
        if dt == jnp.float32:
            return self.decoder.apply(dec_vars, img, z)
        cast = jax.tree.map(
            lambda a: a.astype(dt)
            if hasattr(a, "dtype") and a.dtype == jnp.float32 else a,
            dec_vars,
        )
        out = self.decoder.apply(cast, img.astype(dt), z.astype(dt))
        return out.astype(jnp.float32)

    @property
    def _base_frames(self) -> int:
        """Frames per decoder application: T = 8 * prod(upsample_t) (seed T=1,
        three fixed x2 temporal upsamples, then the per-axis factors)."""
        t = 8
        for f in self.decoder.upsample_t:
            t *= f
        return t

    def _extend_traced(self, dec_vars, seq, z):
        """Autoregressive extension INSIDE a traced program: re-decode from
        the last frame via ``lax.scan`` until ``vid_length`` is covered, then
        truncate. The reference re-dispatches the decoder per 16-frame chunk
        on the host (``get_model.py:71-74`` forward, ``:99-101`` transfer);
        fusing the loop costs one launch instead of one relay RPC per chunk.
        The host-loop equivalent (:meth:`_extend`) is kept as the numerics
        reference for the parity test."""
        n_repeats = max(0, -(-self.vid_length // self._base_frames) - 1)
        if n_repeats > 0:
            def ext(last_frame, _):
                s1 = self._decode(dec_vars, last_frame, z)
                return s1[:, -1], s1

            _, exts = jax.lax.scan(ext, seq[:, -1], None, length=n_repeats)
            # (n, B, T, H, W, C) → concat on time after the base clip
            exts = jnp.concatenate([exts[i] for i in range(n_repeats)], axis=1)
            seq = jnp.concatenate([seq, exts], axis=1)
        return seq[:, : self.vid_length] if seq.shape[1] > self.vid_length else seq

    def _sample_fn(self):
        """Sampling + autoregressive extension fused into ONE program: the
        reference re-dispatches the decoder per 16-frame chunk
        (``get_model.py:71-74``); here the extension is a ``lax.scan`` inside
        the jit, so long sequences cost one launch (significant when each
        dispatch pays relay RPC latency)."""
        if "sample" not in self._fn_cache:
            from .layers import conv3d_fold_divisor

            @jax.jit
            def sample(flow_vars, dec_vars, x0_cl, cond_extra, residual):
                # fold gate sees per-DEVICE batch under DP (global shape / mesh)
                with conv3d_fold_divisor(self._fold_div), self._spatial_scope():
                    cond = [x0_cl] if cond_extra is None else [x0_cl, cond_extra]
                    z = self.flow.apply(flow_vars, residual, cond, reverse=True)
                    z = z.reshape(x0_cl.shape[0], -1)
                    seq = self._decode(dec_vars, x0_cl, z)
                    return self._extend_traced(dec_vars, seq, z), z

            self._fn_cache["sample"] = sample
        return self._fn_cache["sample"]

    def _decode_fn(self):
        if "decode" not in self._fn_cache:
            from .layers import conv3d_fold_divisor

            def decode(dec_vars, img, z):
                with conv3d_fold_divisor(self._fold_div), self._spatial_scope():
                    return self._decode(dec_vars, img, z)

            self._fn_cache["decode"] = jax.jit(decode)
        return self._fn_cache["decode"]

    # ------------------------------------------------------------------
    def __call__(self, x_0, cond=None):
        return self.forward(x_0, cond)

    def draw_residual(self, batch_size: int) -> jax.Array:
        """Draw the next ν from the facade's key stream — the same stream
        ``forward`` consumes when ``residual`` is None. Lets callers reorder
        generation loops (e.g. the batch-major streaming diversity CLI)
        without changing which noise pairs with which input."""
        return jax.random.normal(self._next_key(), (batch_size, self.z_dim))

    def forward(self, x_0, cond=None, residual=None):
        """x_0: (B,C,H,W) in [-1,1] → video (B,T,C,H,W).

        ``residual`` lets callers inject a recorded ν for fixed-seed parity
        tests; by default ν ~ N(0, I) from the facade's key stream.
        """
        x_0 = jnp.asarray(x_0)
        b = x_0.shape[0]
        x0_cl = jnp.transpose(x_0, (0, 2, 3, 1))
        if residual is None:
            residual = jax.random.normal(self._next_key(), (b, self.z_dim))
        cond_extra = None if cond is None else jnp.asarray(cond)

        if self.mesh is not None:
            if cond_extra is None:
                (x0_cl, residual), true_b = self._shard_rows(x0_cl, residual)
            else:
                (x0_cl, residual, cond_extra), true_b = self._shard_rows(
                    x0_cl, residual, cond_extra
                )
        seq, _ = self._sample_fn()(
            self.flow_vars, self.decoder_vars, x0_cl, cond_extra, residual
        )
        if self.mesh is not None and seq.shape[0] != b:
            seq = seq[:true_b]
        return jnp.transpose(seq, (0, 1, 4, 2, 3))  # (B,T,C,H,W)

    def _extend(self, seq, z):
        """Host-loop autoregressive extension (the reference's pattern,
        ``get_model.py:71-74``). No longer on any production path — kept as
        the dispatch-per-chunk numerics reference for the fused
        :meth:`_extend_traced` parity test."""
        decode = self._decode_fn()
        while seq.shape[1] < self.vid_length:
            seq1 = decode(self.decoder_vars, seq[:, -1], z)
            seq = jnp.concatenate((seq, seq1), axis=1)
        return seq[:, : self.vid_length] if seq.shape[1] > self.vid_length else seq

    def transfer(self, seq_query, x_0):
        """seq_query: (1,T,C,H,W) — ONE query video per call (the reference
        CLI loops queries one at a time, generate_transfer.py:40-59, and its
        ``residual.repeat(N, 1)`` at get_model.py:96 assumes the same);
        x_0: (N,C,H,W) → (N,T',C,H,W)."""
        assert self.encoder is not None, "construct Model(..., transfer=True)"
        seq_query = jnp.asarray(seq_query)
        x_0 = jnp.asarray(x_0)
        q_cl = jnp.transpose(seq_query, (0, 1, 3, 4, 2))  # (B,T,H,W,C)
        x0_cl = jnp.transpose(x_0, (0, 2, 3, 1))

        if "transfer" not in self._fn_cache:
            from .layers import conv3d_fold_divisor

            @jax.jit
            def run(enc_vars, flow_vars, dec_vars, q_cl, x0_cl, key):
                with conv3d_fold_divisor(self._fold_div), self._spatial_scope():
                    # dynamics of the query video (frames after the first)
                    _, z, _ = self.encoder.apply(
                        enc_vars, q_cl[:, 1:], rngs={"sample": key}
                    )
                    res, _ = self.flow.apply(flow_vars, z, [q_cl[:, 0]])
                    res = jnp.tile(res.reshape(z.shape[0], -1), (x0_cl.shape[0], 1))
                    z_ref = self.flow.apply(flow_vars, res, [x0_cl], reverse=True)
                    z_ref = z_ref.reshape(x0_cl.shape[0], -1)
                    seq = self._decode(dec_vars, x0_cl, z_ref)
                    # autoregressive extension fused into the same program —
                    # one dispatch per transfer call regardless of seq_length
                    # (the reference loops on the host, get_model.py:99-101)
                    return self._extend_traced(dec_vars, seq, z_ref), z_ref

            self._fn_cache["transfer"] = run

        n = x0_cl.shape[0]
        true_n = n
        if self.mesh is not None:
            # DP transfer: the (few) start frames are the parallel axis; the
            # query video rides along replicated (its encoder/flow-forward
            # pass is tiny next to the N decodes).
            (x0_cl,), true_n = self._shard_rows(x0_cl)
        seq_gen, z_ref = self._fn_cache["transfer"](
            self.encoder_vars, self.flow_vars, self.decoder_vars, q_cl, x0_cl,
            self._next_key(),
        )
        if seq_gen.shape[0] != true_n:
            seq_gen = seq_gen[:true_n]
        return jnp.transpose(seq_gen, (0, 1, 4, 2, 3))


def _splice(variables, key: str, sub_vars) -> dict:
    """Replace ``variables[col][key]`` sub-trees with those from ``sub_vars``.

    ``sub_vars`` is a variables dict of the standalone embedder (collections →
    trees); each collection's tree is grafted under ``key`` in the composite
    model's matching collection.
    """
    out = {c: dict(v) for c, v in variables.items()}
    for col, tree in (sub_vars or {}).items():
        if not isinstance(tree, dict):
            continue
        sub = tree.get(key, tree)  # accept both wrapped and bare sub-trees
        out.setdefault(col, {})
        out[col] = dict(out[col])
        out[col][key] = sub
    return out
