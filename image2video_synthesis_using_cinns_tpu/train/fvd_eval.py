"""Training-time FVD evaluation (posterior for stage-1, prior for stage-2).

Parity with reference ``utils/auxiliaries.py:66-112``: run the whole eval set
through (encoder→decoder) reconstruction or (ν→flow⁻¹→decoder) sampling,
collect generated + real clips, score with the I3D Fréchet machinery
(kinetics 'FVD' or DTDB 'DTFVD' per config).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..metrics import fvd as fvd_mod
from ..metrics.frechet import frechet_from_activations


def _stream_fvd(run, loader, model, max_batches=None, keep_clips=0):
    """Stream I3D activations from on-device clips, one jitted program per
    eval batch, fetching only the (N, 400/1024) activations at the end.

    The round-1 path collected every generated + real clip to the host and
    re-uploaded them for scoring — ~60 MB of relay traffic per eval batch;
    streaming fetches ~100 KB instead. Per-sample activations are identical
    (I3D is deterministic per clip), but the sample POPULATION differs from
    the batched ``metrics.fvd.get_activations`` path: that path drops the
    N % batch_size trailing clips (reference FID-matching behaviour,
    FVD_logging.py:100-127) while streaming scores every clip — so FVD/PFVD
    values are only comparable across runs using the same path when the eval
    set size is not a multiple of the activation batch size (noted in
    BASELINE.md). ``keep_clips`` additionally keeps host copies of the first
    clips for the per-epoch sample-video dump.
    """
    act_fn = fvd_mod.activation_fn(model, (-1.0, 1.0))
    dt_len = {"dt16": 16, "dt32": 32}.get(model.kind)
    acts_g, acts_o, host_g, host_o, kept = [], [], [], [], 0
    for i, batch in enumerate(loader.epoch_iter(0)):
        if max_batches and i >= max_batches:
            break
        g, o = run(batch)
        if kept < keep_clips:  # raw (untiled) clips for the GIF dump
            host_g.append(g)
            host_o.append(o)
            kept += int(g.shape[0])
        if dt_len is not None:
            g = fvd_mod.prep_dt_time(g, dt_len)
            o = fvd_mod.prep_dt_time(o, dt_len)
        acts_g.append(act_fn(model.variables, g))
        acts_o.append(act_fn(model.variables, o))
    # single sync: all dispatches above overlap, fetched together here
    act1 = np.concatenate([np.asarray(a) for a in acts_g], 0)
    act2 = np.concatenate([np.asarray(a) for a in acts_o], 0)
    if jax.process_count() > 1:
        # multi-host: each process streamed activations for ITS slice of
        # every eval batch (per-host loader, parallel/distributed.py); pool
        # them so all hosts score the full eval set and best-checkpoint
        # selection stays consistent across processes. Frechet stats are
        # permutation-invariant, so host-block order is fine.
        from jax.experimental import multihost_utils

        act1 = np.asarray(multihost_utils.process_allgather(act1))
        act2 = np.asarray(multihost_utils.process_allgather(act2))
        act1 = act1.reshape(-1, act1.shape[-1])
        act2 = act2.reshape(-1, act2.shape[-1])
    host_g = np.concatenate([np.asarray(a) for a in host_g], 0) if host_g else None
    host_o = np.concatenate([np.asarray(a) for a in host_o], 0) if host_o else None
    return act1, act2, host_g, host_o


def evaluate_FVD_posterior(loader, aug, bundle, state, mode: str = "FVD",
                           max_batches=None) -> float:
    model = fvd_mod.load_model("kinetics" if mode == "FVD" else "dt16")

    @jax.jit
    def recon(dec_vars, enc_vars, seq, rng):
        motion, _, _ = bundle.encoder.apply(enc_vars, seq[:, 1:], rngs={"sample": rng})
        return bundle.decoder.apply(dec_vars, seq[:, 0], motion)

    def run(batch):
        seq = aug(jnp.asarray(batch["seq_raw"]), jax.random.PRNGKey(0))
        g = recon(state.dec_vars, state.enc_vars, seq, jax.random.PRNGKey(1))
        return g, seq[:, 1:]

    act1, act2, _, _ = _stream_fvd(run, loader, model, max_batches=max_batches)
    return float(frechet_from_activations(act1, act2))


def evaluate_FVD_prior(loader, aug, network, net_vars, generator, gen_vars,
                       z_dim: int, opt, epoch: int, mode: str = "FVD",
                       control: bool = False, max_batches=None,
                       wandb_sink=None) -> float:
    model = fvd_mod.load_model("kinetics" if mode == "FVD" else "dt16")

    @jax.jit
    def sample(net_v, gen_v, seq, cond_pos, rng):
        res = jax.random.normal(rng, (seq.shape[0], z_dim))
        cond = [seq[:, 0]] + ([cond_pos] if control else [])
        z = network.apply(net_v, res, cond, reverse=True)
        z = z.reshape(seq.shape[0], -1)
        return generator.apply(gen_v, seq[:, 0], z)

    def run(batch):
        seq = aug(jnp.asarray(batch["seq_raw"]), jax.random.PRNGKey(0))
        cond_pos = (
            jnp.asarray(batch["cond"]) if control else jnp.zeros((seq.shape[0], 3))
        )
        g = sample(net_vars, gen_vars, seq, cond_pos, jax.random.PRNGKey(epoch))
        return g, seq[:, 1:]

    act1, act2, gen, orig = _stream_fvd(
        run, loader, model, max_batches=max_batches, keep_clips=40
    )

    # dump a few random sampled clips next to ground truth (reference
    # utils/auxiliaries.py:105-108 logs 10 random samples per epoch; drawn
    # from the first ~40 clips here — the rest stay on device). Multi-host:
    # this function runs on EVERY process (process_allgather above is a
    # collective), but only process 0 may touch the filesystem — concurrent
    # writes to the same GIF path would race (parallel/distributed.py).
    if jax.process_index() == 0:
        try:
            from ..utils.video import plot_vid

            sel = np.random.randint(0, gen.shape[0], min(10, gen.shape[0]))
            gif = plot_vid(
                opt,
                [
                    np.transpose(gen[sel], (0, 1, 4, 2, 3)),
                    np.transpose(orig[sel], (0, 1, 4, 2, 3)),
                ],
                epoch,
                mode="eval",
            )
            if wandb_sink is not None:
                # reference pushes the sampled clips too (utils/auxiliaries.py:108)
                wandb_sink.log_video("eval_video", gif)
        except Exception as e:  # GIF export is best-effort; say so, once each
            import warnings

            warnings.warn(f"per-epoch sample-video dump failed: {e!r}")

    return float(frechet_from_activations(act1, act2))
