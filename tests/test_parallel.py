"""Mesh parallelism: DP train-step semantics and 2-D data x model sharding
of the flow, on the 8 virtual CPU devices from conftest."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from image2video_synthesis_using_cinns_tpu.losses.flow_loss import flow_loss
from image2video_synthesis_using_cinns_tpu.models.stage2.flow import (
    control_mask,
    flow_forward,
    init_flow_blocks,
    init_shuffle_buffers,
)
from image2video_synthesis_using_cinns_tpu.parallel.mesh import (
    data_parallel_sharding,
    make_mesh,
    pad_to_multiple,
    replicate,
    shard_batch,
)
from image2video_synthesis_using_cinns_tpu.parallel.tp import (
    batch_sharded,
    flow_param_specs,
    make_2d_mesh,
    replicated,
    shard_flow_params,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)

C, E, H, NF = 16, 16, 64, 4


def _flow_setup():
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    blocks = init_flow_blocks(k1, C, E, H, 2, NF)
    buffers = init_shuffle_buffers(k2, C, NF)
    mask = control_mask(NF, False)
    return blocks, buffers, mask


def test_dp_step_matches_single_device():
    blocks, buffers, mask = _flow_setup()
    x = jax.random.normal(jax.random.PRNGKey(1), (16, C))
    emb = jax.random.normal(jax.random.PRNGKey(2), (16, E))

    def loss(blocks, x, emb):
        out, logdet = flow_forward(blocks, buffers, x, emb, mask)
        return flow_loss(out, logdet)[0]

    g_single = jax.grad(loss)(blocks, x, emb)

    mesh = make_mesh(8)
    blocks_r = replicate(mesh, blocks)
    batch = shard_batch(mesh, {"x": x, "emb": emb})
    g_dp = jax.jit(jax.grad(loss))(blocks_r, batch["x"], batch["emb"])

    for a, b in zip(jax.tree.leaves(g_single), jax.tree.leaves(g_dp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5)


def test_tp_sharded_flow_matches_replicated():
    """data x model mesh: flow forward + grads under TP shardings must equal
    the unsharded computation (XLA inserts the collectives)."""
    blocks, buffers, mask = _flow_setup()
    x = jax.random.normal(jax.random.PRNGKey(3), (8, C))
    emb = jax.random.normal(jax.random.PRNGKey(4), (8, E))

    ref_out, ref_logdet = flow_forward(blocks, buffers, x, emb, mask)

    mesh = make_2d_mesh(2, 4)
    blocks_tp = shard_flow_params(mesh, blocks)
    buffers_r = replicated(mesh, buffers)
    x_s = batch_sharded(mesh, x)
    emb_s = batch_sharded(mesh, emb)

    out, logdet = jax.jit(flow_forward, static_argnames=())(
        blocks_tp, buffers_r, x_s, emb_s, mask
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(logdet), np.asarray(ref_logdet), rtol=2e-5, atol=2e-4)

    # hidden-layer weights actually live sharded over the 'model' axis
    w1 = blocks_tp["coupling"]["s0"]["l1"]["w"]
    assert "model" in str(w1.sharding.spec)

    # one Adam step under TP shardings stays finite and sharded
    def loss(b):
        o, ld = flow_forward(b, buffers_r, x_s, emb_s, mask)
        return flow_loss(o, ld)[0]

    opt = optax.adam(1e-3)
    state = opt.init(blocks_tp)

    @jax.jit
    def step(b, s):
        g = jax.grad(loss)(b)
        u, s = opt.update(g, s, b)
        return optax.apply_updates(b, u), s

    new_blocks, _ = step(blocks_tp, state)
    assert np.isfinite(float(loss(new_blocks)))
    w1n = new_blocks["coupling"]["s0"]["l1"]["w"]
    assert "model" in str(w1n.sharding.spec)


@pytest.mark.slow
def test_stage1_dp_step_matches_single_device():
    """The full three-optimiser adversarial step (GP double-grad, pretrain
    gating, spectral refresh) under batch sharding must match a single-device
    run — the riskiest program under DP (reference behaviour guarded:
    stage1_VAE/modules/loss.py:94-151)."""
    from image2video_synthesis_using_cinns_tpu.testing import PRESETS, stage1_config
    from image2video_synthesis_using_cinns_tpu.train.stage1 import build_stage1
    from image2video_synthesis_using_cinns_tpu.train.stage1_step import (
        Stage1State,
        make_stage1_train_step,
    )

    P = PRESETS["tiny"]
    opt = stage1_config(P)
    tr = opt.Training
    bundle, dec_vars, enc_vars, dt_vars, ds_vars = build_stage1(
        opt, jax.random.PRNGKey(0)
    )
    # SGD (not the trainer's Adam) so param deltas are proportional to the
    # gradients — Adam's g/sqrt(g^2) normalisation turns reduction-order fp
    # noise on mathematically-zero gradients into full +-lr sign flips, which
    # would mask exactly the collective bugs this test exists to catch.
    opts = (optax.sgd(tr["lr"]),) * 3

    def fresh_state():
        return Stage1State(
            jax.tree.map(jnp.array, dec_vars),
            jax.tree.map(jnp.array, enc_vars),
            jax.tree.map(jnp.array, dt_vars),
            jax.tree.map(jnp.array, ds_vars),
            opts[0].init((dec_vars["params"], enc_vars["params"])),
            opts[1].init(dt_vars["params"]),
            opts[2].init(ds_vars["params"]),
        )

    step = make_stage1_train_step(bundle, tr, opts)
    B, T, img = 8, P["seq_length"], P["img_size"]
    seq = jax.random.uniform(jax.random.PRNGKey(5), (B, T, img, img, 3), minval=-1, maxval=1)
    epoch = jnp.int32(tr["pretrain"])  # gate open: all three updates fire
    rng = jax.random.PRNGKey(7)

    new_single, m_single, _ = step(fresh_state(), seq, epoch, rng)

    mesh = make_mesh(8)
    state_r = Stage1State(*[replicate(mesh, x) for x in fresh_state()])
    seq_s = shard_batch(mesh, {"seq": seq})["seq"]
    new_dp, m_dp, _ = step(state_r, seq_s, epoch, rng)

    for k in m_single:
        np.testing.assert_allclose(
            float(m_single[k]), float(m_dp[k]), rtol=2e-4, atol=2e-4, err_msg=k
        )
    for part in ("dec_vars", "enc_vars", "disc_t_vars", "disc_s_vars"):
        a_tree = getattr(new_single, part)
        b_tree = getattr(new_dp, part)
        # rtol 3e-3: the patch-disc ActNorm data-dependent init computes
        # 1/std from batch stats, amplifying sharded-reduction fp noise;
        # real DP bugs (per-shard stats / missing all-reduce) are >>10x this.
        for a, b in zip(jax.tree.leaves(a_tree), jax.tree.leaves(b_tree)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=3e-3, atol=1e-4, err_msg=part
            )


@pytest.mark.slow
def test_stage2_ae_dp_step_matches_single_device():
    """AE VAE-GAN step under batch sharding: two generator backwards, the
    adaptive d_weight from colorize-leaf gradient norms, the d_loss>0-gated
    disc update and the BN/spectral refresh must all match a single-device
    run (reference behaviour guarded: stage2_cINN/AE/modules/loss.py:8-86)."""
    from image2video_synthesis_using_cinns_tpu.models.backbones.lpips import LPIPS
    from image2video_synthesis_using_cinns_tpu.models.stage1.patch_disc import (
        NLayerDiscriminator,
    )
    from image2video_synthesis_using_cinns_tpu.models.stage2.biggan import BigAE
    from image2video_synthesis_using_cinns_tpu.testing import PRESETS, stage2_ae_config
    from image2video_synthesis_using_cinns_tpu.train.stage2_ae import make_ae_step

    opt = stage2_ae_config(PRESETS["tiny"])
    opt.AE["in_size"] = 64
    opt.AE["z_dim"] = 64
    opt.AE["chn"] = 8
    opt.AE["encoder_type"] = "resnet18"

    network = BigAE(config=dict(opt.AE))
    gen_vars = jax.jit(network.init)(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 64, 64, 3))
    )
    disc = NLayerDiscriminator.from_config(opt.Discriminator_Patch)
    disc_vars = jax.jit(disc.init)(
        {"params": jax.random.PRNGKey(1)}, jnp.zeros((1, 64, 64, 3))
    )
    lpips = LPIPS()
    lpips_vars = jax.jit(lpips.init)(
        {"params": jax.random.PRNGKey(2)},
        jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64, 3)),
    )
    # SGD for the same reason as the stage-1 DP test above
    opt_gen, opt_disc = optax.sgd(1e-4), optax.sgd(1e-4)
    train_step, _ = make_ae_step(
        network, disc, lpips, lpips_vars, opt_gen, opt_disc,
        w_kl=1e-5, pretrain=0,
    )

    img = jax.random.uniform(jax.random.PRNGKey(5), (8, 64, 64, 3), minval=-1, maxval=1)
    epoch = jnp.int32(1)

    def fresh():
        gv = jax.tree.map(jnp.array, gen_vars)
        dv = jax.tree.map(jnp.array, disc_vars)
        return (gv, jnp.zeros(()), dv,
                opt_gen.init((gv["params"], jnp.zeros(()))),
                opt_disc.init(dv["params"]))

    gv, lv, dv, og, od = fresh()
    out_single = train_step(gv, lv, dv, og, od, img, epoch)

    mesh = make_mesh(8)
    gv, lv, dv, og, od = [replicate(mesh, x) for x in fresh()]
    img_s = shard_batch(mesh, {"img": img})["img"]
    out_dp = train_step(gv, lv, dv, og, od, img_s, epoch)

    m_single, m_dp = out_single[5], out_dp[5]
    for k in m_single:
        np.testing.assert_allclose(
            float(m_single[k]), float(m_dp[k]), rtol=3e-4, atol=3e-4, err_msg=k
        )
    for a, b in zip(jax.tree.leaves(out_single[0]), jax.tree.leaves(out_dp[0])):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-3, atol=1e-4, err_msg="gen_vars"
        )
    # disc update: the hinge relu(1 +- logit) gradient flips discretely for
    # logits within fp noise of the kink, so a few elements legitimately
    # diverge under sharded reduction order; a real DP bug (per-shard stats /
    # missing all-reduce) shifts essentially every element at O(1)
    for a, b in zip(jax.tree.leaves(out_single[2]), jax.tree.leaves(out_dp[2])):
        a, b = np.asarray(a), np.asarray(b)
        bad = np.abs(a - b) > (1e-4 + 3e-3 * np.abs(b))
        assert bad.mean() < 0.10, f"disc_vars: {bad.mean():.1%} elements diverged"


def test_facade_data_parallel_matches_single(tmp_path):
    """Model(data_parallel=True): batch sharded over the 8-device mesh,
    weights replicated; at identical injected ν the videos must match the
    single-device facade — including a batch (3) that does not divide the
    mesh (pad + unpad round-trip)."""
    from image2video_synthesis_using_cinns_tpu.models.facade import Model
    from image2video_synthesis_using_cinns_tpu.testing import make_model_dir

    d = make_model_dir(str(tmp_path), preset="tiny") + "/"
    m_single = Model(d, vid_length=8, seed=3)
    m_dp = Model(d, vid_length=8, seed=3, data_parallel=True)

    rng = np.random.default_rng(0)
    x0 = rng.uniform(-1, 1, (3, 3, 32, 32)).astype(np.float32)
    nu = rng.standard_normal((3, m_single.z_dim)).astype(np.float32)

    v_single = np.asarray(m_single.forward(x0, residual=nu))
    v_dp = np.asarray(m_dp.forward(x0, residual=nu))
    assert v_dp.shape == v_single.shape == (3, 8, 3, 32, 32)
    # batch-8 (padded) vs batch-3 programs fuse differently → ~1e-5 noise
    np.testing.assert_allclose(v_dp, v_single, rtol=1e-3, atol=1e-4)


def test_facade_transfer_data_parallel_matches_single(tmp_path):
    """Model(transfer=True, data_parallel=True): the start-frame batch is the
    sharded axis (query replicated); at the same facade seed the transferred
    videos must match the single-device run — including a start-frame count
    (3) that does not divide the 8-device mesh (pad + unpad round-trip)."""
    from image2video_synthesis_using_cinns_tpu.models.facade import Model
    from image2video_synthesis_using_cinns_tpu.testing import make_model_dir

    d = make_model_dir(str(tmp_path), preset="tiny") + "/"
    m_single = Model(d, vid_length=8, seed=3, transfer=True)
    m_dp = Model(d, vid_length=8, seed=3, transfer=True, data_parallel=True)

    rng = np.random.default_rng(0)
    q = rng.uniform(-1, 1, (1, 9, 3, 32, 32)).astype(np.float32)
    x0 = rng.uniform(-1, 1, (3, 3, 32, 32)).astype(np.float32)

    v_single = np.asarray(m_single.transfer(q, x0))
    v_dp = np.asarray(m_dp.transfer(q, x0))
    assert v_dp.shape == v_single.shape == (3, 8, 3, 32, 32)
    # batch-8 (padded) vs batch-3 programs fuse differently → ~1e-5 noise
    np.testing.assert_allclose(v_dp, v_single, rtol=1e-3, atol=1e-4)


def test_facade_spatial_shard_matches_single(tmp_path):
    """Model(spatial_shard=True): the decoder's activations are width-sharded
    over all 8 devices (the single-video latency axis — parallel/spatial.py);
    at identical injected ν the videos must match the single-device facade to
    norm-stat reassociation noise."""
    from image2video_synthesis_using_cinns_tpu.models.facade import Model
    from image2video_synthesis_using_cinns_tpu.testing import make_model_dir

    d = make_model_dir(str(tmp_path), preset="tiny") + "/"
    m_single = Model(d, vid_length=8, seed=3)
    m_sp = Model(d, vid_length=8, seed=3, spatial_shard=True)
    assert dict(m_sp.mesh.shape) == {"data": 1, "model": 8}

    rng = np.random.default_rng(0)
    x0 = rng.uniform(-1, 1, (2, 3, 32, 32)).astype(np.float32)
    nu = rng.standard_normal((2, m_single.z_dim)).astype(np.float32)

    v_single = np.asarray(m_single.forward(x0, residual=nu))
    v_sp = np.asarray(m_sp.forward(x0, residual=nu))
    assert v_sp.shape == v_single.shape == (2, 8, 3, 32, 32)
    np.testing.assert_allclose(v_sp, v_single, rtol=1e-3, atol=1e-4)


def test_facade_spatial_shard_composes_with_dp(tmp_path):
    """Model(data_parallel=True, spatial_shard=2): 2-D (data=4, model=2) mesh
    — rows sharded over 'data', decoder width over 'model' — matching the
    single-device facade at a batch (3) that does not divide the data axis."""
    from image2video_synthesis_using_cinns_tpu.models.facade import Model
    from image2video_synthesis_using_cinns_tpu.testing import make_model_dir

    d = make_model_dir(str(tmp_path), preset="tiny") + "/"
    m_single = Model(d, vid_length=8, seed=3)
    m_2d = Model(d, vid_length=8, seed=3, data_parallel=True, spatial_shard=2)
    assert dict(m_2d.mesh.shape) == {"data": 4, "model": 2}

    rng = np.random.default_rng(0)
    x0 = rng.uniform(-1, 1, (3, 3, 32, 32)).astype(np.float32)
    nu = rng.standard_normal((3, m_single.z_dim)).astype(np.float32)

    v_single = np.asarray(m_single.forward(x0, residual=nu))
    v_2d = np.asarray(m_2d.forward(x0, residual=nu))
    assert v_2d.shape == v_single.shape == (3, 8, 3, 32, 32)
    np.testing.assert_allclose(v_2d, v_single, rtol=1e-3, atol=1e-4)


def test_facade_spatial_dp_extension_matches_single(tmp_path):
    """vid_length past the base clip: the autoregressive extension re-decodes
    inside a lax.scan (models/facade.py::_extend_traced) — under the 2-D
    (data, model) mesh the constrain_spatial anchors fire inside the scan
    body, so this pins the composed sharding through the extension path the
    vid_length=8 tests never reach (tiny preset base clip is 8 frames)."""
    from image2video_synthesis_using_cinns_tpu.models.facade import Model
    from image2video_synthesis_using_cinns_tpu.testing import make_model_dir

    d = make_model_dir(str(tmp_path), preset="tiny") + "/"
    m_single = Model(d, vid_length=12, seed=3)
    m_2d = Model(d, vid_length=12, seed=3, data_parallel=True, spatial_shard=2)

    rng = np.random.default_rng(0)
    x0 = rng.uniform(-1, 1, (3, 3, 32, 32)).astype(np.float32)
    nu = rng.standard_normal((3, m_single.z_dim)).astype(np.float32)

    v_single = np.asarray(m_single.forward(x0, residual=nu))
    v_2d = np.asarray(m_2d.forward(x0, residual=nu))
    assert v_2d.shape == v_single.shape == (3, 12, 3, 32, 32)
    np.testing.assert_allclose(v_2d, v_single, rtol=1e-3, atol=1e-4)


def test_facade_spatial_shard_flag_validation(tmp_path):
    """spatial_shard=True with data_parallel is ambiguous (how to split the
    devices) — must raise and name the fix; non-dividing int must raise."""
    from image2video_synthesis_using_cinns_tpu.models.facade import Model
    from image2video_synthesis_using_cinns_tpu.testing import make_model_dir

    d = make_model_dir(str(tmp_path), preset="tiny") + "/"
    with pytest.raises(ValueError, match="spatial_shard=<int>"):
        Model(d, vid_length=8, data_parallel=True, spatial_shard=True)
    with pytest.raises(ValueError, match="divide"):
        Model(d, vid_length=8, spatial_shard=3)


def test_pad_to_multiple():
    batch = {"x": jnp.ones((5, 3))}
    padded, true_b = pad_to_multiple(batch, 4)
    assert padded["x"].shape == (8, 3)
    assert true_b == 5
    # divisible batch: no padding, true_b None (jit-static slice no-op that
    # keeps the common case on a single compile-cache entry)
    same, true_b = pad_to_multiple(batch, 5)
    assert same["x"].shape == (5, 3) and true_b is None


@pytest.mark.slow
def test_stage1_dp_step_nondivisible_batch_matches_true_batch():
    """THE round-2 verdict gap: at a batch that does not divide the mesh
    (B=10 on 8 devices, the shipped stage-1 default), the padded DP step must
    produce the SAME update as the plain step on the true 10-row batch — the
    jitted step slices the padding off before any loss/metric/GP term
    (reference averages over the actual batch, stage1_VAE/modules/
    loss.py:94-151). Before the true_b threading, the last clip carried 7/16
    of every gradient here."""
    import optax as _optax

    from image2video_synthesis_using_cinns_tpu.testing import PRESETS, stage1_config
    from image2video_synthesis_using_cinns_tpu.train.stage1 import build_stage1
    from image2video_synthesis_using_cinns_tpu.train.stage1_step import (
        Stage1State,
        make_stage1_train_step,
    )

    Pt = PRESETS["tiny"]
    opt = stage1_config(Pt)
    tr = opt.Training
    bundle, dec_vars, enc_vars, dt_vars, ds_vars = build_stage1(
        opt, jax.random.PRNGKey(0)
    )
    opts = (_optax.sgd(tr["lr"]),) * 3  # SGD: see test_stage1_dp_step_matches_single_device

    def fresh_state():
        return Stage1State(
            jax.tree.map(jnp.array, dec_vars),
            jax.tree.map(jnp.array, enc_vars),
            jax.tree.map(jnp.array, dt_vars),
            jax.tree.map(jnp.array, ds_vars),
            opts[0].init((dec_vars["params"], enc_vars["params"])),
            opts[1].init(dt_vars["params"]),
            opts[2].init(ds_vars["params"]),
        )

    step = make_stage1_train_step(bundle, tr, opts)
    B, T, img = 10, Pt["seq_length"], Pt["img_size"]
    seq = jax.random.uniform(jax.random.PRNGKey(5), (B, T, img, img, 3), minval=-1, maxval=1)
    epoch = jnp.int32(tr["pretrain"])  # gate open: all three updates fire
    rng = jax.random.PRNGKey(7)

    new_true, m_true, gen_true = step(fresh_state(), seq, epoch, rng)

    mesh = make_mesh(8)
    state_r = Stage1State(*[replicate(mesh, x) for x in fresh_state()])
    padded, true_b = pad_to_multiple({"seq": seq}, 8)
    assert true_b == 10 and padded["seq"].shape[0] == 16
    seq_s = shard_batch(mesh, padded)["seq"]
    new_dp, m_dp, gen_dp = step(state_r, seq_s, epoch, rng, true_b=true_b)

    assert gen_dp.shape[0] == 10  # step output sliced to the true batch
    for k in m_true:
        np.testing.assert_allclose(
            float(m_true[k]), float(m_dp[k]), rtol=2e-4, atol=2e-4, err_msg=k
        )
    for part in ("dec_vars", "enc_vars", "disc_t_vars", "disc_s_vars"):
        a_tree = getattr(new_true, part)
        b_tree = getattr(new_dp, part)
        for a, b in zip(jax.tree.leaves(a_tree), jax.tree.leaves(b_tree)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=3e-3, atol=1e-4, err_msg=part
            )


def test_stage2_ae_dp_step_nondivisible_batch_matches_true_batch():
    """AE VAE-GAN step at B=10 on the 8-device mesh (padded to 16): the
    adaptive d_weight, d_loss>0 gate and the BN/spectral refresh must all
    match the plain step on the true 10-row batch (reference averages over
    the actual batch, stage2_cINN/AE/modules/loss.py:45-86)."""
    import optax as _optax

    from image2video_synthesis_using_cinns_tpu.models.backbones.lpips import LPIPS
    from image2video_synthesis_using_cinns_tpu.models.stage1.patch_disc import (
        NLayerDiscriminator,
    )
    from image2video_synthesis_using_cinns_tpu.models.stage2.biggan import BigAE
    from image2video_synthesis_using_cinns_tpu.testing import PRESETS, stage2_ae_config
    from image2video_synthesis_using_cinns_tpu.train.stage2_ae import make_ae_step

    opt = stage2_ae_config(PRESETS["tiny"])
    opt.AE["in_size"] = 64
    opt.AE["z_dim"] = 64
    opt.AE["chn"] = 8
    opt.AE["encoder_type"] = "resnet18"

    network = BigAE(config=dict(opt.AE))
    gen_vars = jax.jit(network.init)(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 64, 64, 3))
    )
    disc = NLayerDiscriminator.from_config(opt.Discriminator_Patch)
    disc_vars = jax.jit(disc.init)(
        {"params": jax.random.PRNGKey(1)}, jnp.zeros((1, 64, 64, 3))
    )
    lpips = LPIPS()
    lpips_vars = jax.jit(lpips.init)(
        {"params": jax.random.PRNGKey(2)},
        jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64, 3)),
    )
    opt_gen, opt_disc = _optax.sgd(1e-4), _optax.sgd(1e-4)
    train_step, _ = make_ae_step(
        network, disc, lpips, lpips_vars, opt_gen, opt_disc,
        w_kl=1e-5, pretrain=0,
    )

    img = jax.random.uniform(jax.random.PRNGKey(5), (10, 64, 64, 3), minval=-1, maxval=1)
    epoch = jnp.int32(1)

    def fresh():
        gv = jax.tree.map(jnp.array, gen_vars)
        dv = jax.tree.map(jnp.array, disc_vars)
        return (gv, jnp.zeros(()), dv,
                opt_gen.init((gv["params"], jnp.zeros(()))),
                opt_disc.init(dv["params"]))

    gv, lv, dv, og, od = fresh()
    out_true = train_step(gv, lv, dv, og, od, img, epoch)

    mesh = make_mesh(8)
    gv, lv, dv, og, od = [replicate(mesh, x) for x in fresh()]
    padded, true_b = pad_to_multiple({"img": img}, 8)
    assert true_b == 10
    img_s = shard_batch(mesh, padded)["img"]
    out_dp = train_step(gv, lv, dv, og, od, img_s, epoch, true_b=true_b)

    assert out_dp[6].shape[0] == 10  # recon sliced to the true batch
    m_true, m_dp = out_true[5], out_dp[5]
    for k in m_true:
        np.testing.assert_allclose(
            float(m_true[k]), float(m_dp[k]), rtol=3e-4, atol=3e-4, err_msg=k
        )
    for a, b in zip(jax.tree.leaves(out_true[0]), jax.tree.leaves(out_dp[0])):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-3, atol=1e-4, err_msg="gen_vars"
        )
    # hinge-kink tolerance as in the divisible-batch AE DP test above
    for a, b in zip(jax.tree.leaves(out_true[2]), jax.tree.leaves(out_dp[2])):
        a, b = np.asarray(a), np.asarray(b)
        bad = np.abs(a - b) > (1e-4 + 3e-3 * np.abs(b))
        assert bad.mean() < 0.10, f"disc_vars: {bad.mean():.1%} elements diverged"


# ---------------------------------------------------------------------------
# Spatial (width-axis) decoder sharding — parallel/spatial.py prototype
# ---------------------------------------------------------------------------


def test_spatial_sharded_decoder_matches_single_device():
    """Width-sharding the SPADE decoder over the 8-device mesh reproduces the
    single-device forward (GSPMD halo-exchange convs are exact; only the
    norm-stat reductions reassociate), and the compiled program really does
    run sharded (halo collective-permutes present, sharded output)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from image2video_synthesis_using_cinns_tpu.models.stage1.decoder import (
        Generator,
    )
    from image2video_synthesis_using_cinns_tpu.parallel.spatial import (
        spatial_sharding,
    )

    dec = Generator(channel_factor=8, z_dim=64, upsample_s=(2, 1),
                    upsample_t=(1, 2), spectral_norm=True)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32))
    z = jnp.asarray(rng.normal(size=(1, 64)).astype(np.float32))
    variables = jax.jit(dec.init)({"params": jax.random.PRNGKey(0)}, img, z)
    ref = np.asarray(jax.jit(dec.apply)(variables, img, z))
    assert ref.shape == (1, 16, 64, 64, 3)

    mesh = make_mesh(8, "model")
    rep = NamedSharding(mesh, P())
    out_sh = NamedSharding(mesh, P(None, None, None, "model", None))

    def fwd(v, img, z):
        with spatial_sharding(mesh, "model"):
            return dec.apply(v, img, z)

    f = jax.jit(fwd, in_shardings=(rep, rep, rep), out_shardings=out_sh)
    out = f(variables, img, z)
    assert not out.sharding.is_fully_replicated
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)

    # the halo exchange is real: conv over a W-sharded operand requires
    # one column slab per neighbour per 3^3/3x3 conv
    hlo = f.lower(variables, img, z).compile().as_text()
    assert "collective-permute" in hlo


def test_constrain_spatial_identity_outside_scope():
    from image2video_synthesis_using_cinns_tpu.parallel.spatial import (
        constrain_spatial,
    )

    x = jnp.ones((2, 4, 8, 8, 3))
    assert constrain_spatial(x) is x

    # inside the scope, non-divisible widths are left alone
    mesh = make_mesh(8, "model")
    from image2video_synthesis_using_cinns_tpu.parallel.spatial import (
        spatial_sharding,
    )

    with spatial_sharding(mesh, "model"):
        y = constrain_spatial(jnp.ones((1, 2, 4, 4, 8)))  # W=4 < 8 devices
    assert isinstance(y, jax.Array)


def test_constrain_spatial_preserves_dp_batch_axis():
    """Under a 2-D (data, model) mesh with ``batch_axis='data'`` the anchor
    keeps the DP row sharding on dim 0 while width-sharding dim 3 — a spec
    without the batch axis would all-gather the batch over 'data' (specs are
    hard: unmentioned mesh axes mean replicated) and make every data-row of
    devices decode the full batch redundantly."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from image2video_synthesis_using_cinns_tpu.parallel.spatial import (
        constrain_spatial,
        spatial_sharding,
    )

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(4, 2), ("data", "model"))
    x = jax.device_put(
        jnp.ones((4, 2, 8, 8, 3)), NamedSharding(mesh, P("data"))
    )

    def fwd(x):
        with spatial_sharding(mesh, "model", batch_axis="data"):
            return constrain_spatial(x)

    f = jax.jit(fwd)
    y = f(x)
    assert y.sharding.spec == P("data", None, None, "model")  # trailing None trimmed
    # and the constraint itself moved no batch rows: no all-gather compiled
    assert "all-gather" not in f.lower(x).compile().as_text()

    # batch not divisible by the data axis (or axis size 1) → width-only spec
    x3 = jax.device_put(jnp.ones((3, 2, 8, 8, 3)), NamedSharding(mesh, P()))
    y3 = jax.jit(fwd)(x3)
    assert y3.sharding.spec == P(None, None, None, "model")
