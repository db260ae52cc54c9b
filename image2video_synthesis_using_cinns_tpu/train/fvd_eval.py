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


def _to_host_batches(fn, loader, aug, *args, max_batches=None):
    gen, orig = [], []
    for i, batch in enumerate(loader.epoch_iter(0)):
        if max_batches and i >= max_batches:
            break
        g, o = fn(batch, *args)
        gen.append(np.asarray(g))
        orig.append(np.asarray(o))
    return np.concatenate(gen, 0), np.concatenate(orig, 0)


def evaluate_FVD_posterior(loader, aug, bundle, state, mode: str = "FVD",
                           batch_size: int = 20, max_batches=None) -> float:
    model = fvd_mod.load_model("kinetics" if mode == "FVD" else "dt16")

    @jax.jit
    def recon(dec_vars, enc_vars, seq, rng):
        motion, _, _ = bundle.encoder.apply(enc_vars, seq[:, 1:], rngs={"sample": rng})
        return bundle.decoder.apply(dec_vars, seq[:, 0], motion)

    def run(batch):
        seq = aug(jnp.asarray(batch["seq_raw"]), jax.random.PRNGKey(0))
        g = recon(state.dec_vars, state.enc_vars, seq, jax.random.PRNGKey(1))
        return g, seq[:, 1:]

    gen, orig = _to_host_batches(run, loader, aug, max_batches=max_batches)
    bs = batch_size if mode == "FVD" else 40
    return float(fvd_mod.calculate_FVD(model, gen, orig, bs))


def evaluate_FVD_prior(loader, aug, network, net_vars, generator, gen_vars,
                       z_dim: int, opt, epoch: int, mode: str = "FVD",
                       control: bool = False, batch_size: int = 20,
                       max_batches=None, wandb_sink=None) -> float:
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

    gen, orig = _to_host_batches(run, loader, aug, max_batches=max_batches)

    # dump a few random sampled clips next to ground truth (reference
    # utils/auxiliaries.py:105-108 logs 10 random samples per epoch)
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
    except Exception:
        pass

    bs = batch_size if mode == "FVD" else 40
    return float(fvd_mod.calculate_FVD(model, gen, orig, bs))
