"""StyleGAN2(-ADA) trainer (models/stylegan2/train.py): loss VALUE and
GRADIENT parity vs the torch oracle for all four phases, Adam-step
parity through the pickle converter, ADA pipe semantics, EMA buffer
handling, and sharded==single training steps.

The reference consumes checkpoints from NVIDIA's external trainer
(reference README.md:55-59); the parity regime here (noise_mode='const',
no mixing, no augmentation, all randomness injected explicitly) makes
both sides deterministic so a wrong loss normalization, sign, interval
folding, or mb_ratio Adam adjustment fails loudly.
"""

import copy

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from latentaugment_tpu.models.stylegan2 import networks, train
from latentaugment_tpu.models.stylegan2.ada import (
    AdaController, apply_ada, pipe_config)

import reference_oracles as oracle
from test_torch_parity import _build_torch_pair, _convert_via_pickle

BATCH = 4
# Parameters the torch trainer never updates (buffers) or that are
# torch-buffers but live in our param tree (noise_const: trained only
# under noise_mode='const', which real training never uses).
SKIP_LEAVES = ('w_avg', 'resample_filter', 'noise_const')


def _cfg(**kw):
    base = dict(batch_size=BATCH, style_mixing_prob=0.0,
                noise_mode='const', aug='noaug', r1_gamma=2.5,
                pl_batch_shrink=1, ema_rampup=None)
    base.update(kw)
    return train.train_config(**base)


@pytest.fixture(scope='module')
def setup():
    g_t, d_t = _build_torch_pair(seed=11)
    g_params, g_cfg, d_params, d_cfg = _convert_via_pickle(g_t, d_t)
    g_params = jax.tree_util.tree_map(jnp.asarray, g_params)
    d_params = jax.tree_util.tree_map(jnp.asarray, d_params)
    rng = np.random.RandomState(7)
    z = rng.randn(BATCH, 64).astype(np.float32)
    real = (rng.rand(BATCH, 2, 32, 32).astype(np.float32) * 2 - 1)
    return g_t, d_t, g_params, g_cfg, d_params, d_cfg, z, real


def _torch_params_as_tree(g_t, d_t, from_grads=False):
    """Map torch params (or their .grad) onto our JAX tree layout by
    running grad-holding clones through the pickle converter — valid
    because the converter is purely structural (rename/nest, no
    algebraic transforms; convert.py generator_tree_from_state)."""
    g2, d2 = copy.deepcopy(g_t), copy.deepcopy(d_t)
    if from_grads:
        with torch.no_grad():
            for p2, p in zip(g2.parameters(), g_t.parameters()):
                p2.copy_(p.grad if p.grad is not None
                         else torch.zeros_like(p))
            for p2, p in zip(d2.parameters(), d_t.parameters()):
                p2.copy_(p.grad if p.grad is not None
                         else torch.zeros_like(p))
    gp, _, dp, _ = _convert_via_pickle(g2, d2)
    return gp, dp


def _assert_tree_close(ours, theirs, rtol=2e-3, atol=2e-5, what=''):
    flat_a = jax.tree_util.tree_flatten_with_path(ours)[0]
    flat_b = jax.tree_util.tree_flatten_with_path(theirs)[0]
    assert len(flat_a) == len(flat_b)
    for (path_a, a), (path_b, b) in zip(flat_a, flat_b):
        name = jax.tree_util.keystr(path_a)
        assert name == jax.tree_util.keystr(path_b)
        if any(s in name for s in SKIP_LEAVES):
            continue
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=rtol, atol=atol,
            err_msg=f'{what}: {name}')


def _keys():
    return jax.random.split(jax.random.PRNGKey(0), 4)


# ---------------------------------------------------------------------------
# Loss VALUE + GRADIENT parity, all four phases


@pytest.mark.slow  # >60 s measured on the one-core box (round-4 fast-lane diet)
def test_g_main_loss_and_grads_match_torch(setup):
    g_t, d_t, gp, g_cfg, dp, d_cfg, z, real = setup
    fns = train.make_train_fns(g_cfg, d_cfg, _cfg())
    k = _keys()
    (loss, _), grads = jax.value_and_grad(fns.loss_g_main, has_aux=True)(
        gp, dp, jnp.asarray(z), jnp.asarray(z), None, k[0], k[1], k[2], 0.0)

    g_t = copy.deepcopy(g_t)
    d_t = copy.deepcopy(d_t)
    loss_t = oracle.sg2_g_main_torch(g_t, d_t, torch.as_tensor(z))
    loss_t.backward()
    np.testing.assert_allclose(float(loss), loss_t.item(), rtol=1e-4)
    grads_t, _ = _torch_params_as_tree(g_t, d_t, from_grads=True)
    _assert_tree_close(grads, grads_t, what='g_main grads')


@pytest.mark.slow  # 30-60 s on the one-core box (round-4 fast-lane diet)
def test_g_pl_loss_and_grads_match_torch(setup):
    g_t, d_t, gp, g_cfg, dp, d_cfg, z, real = setup
    fns = train.make_train_fns(g_cfg, d_cfg, _cfg())
    k = _keys()
    pl_mean0 = 0.3
    (loss, (new_pl_mean, pl_lengths)), grads = jax.value_and_grad(
        fns.loss_g_pl, has_aux=True)(
            gp, jnp.float32(pl_mean0), jnp.asarray(z), jnp.asarray(z),
            None, k[0], k[1], k[3])
    # Reproduce the in-graph pl_noise draw on host for the oracle.
    pl_noise = np.asarray(jax.random.normal(k[3], (BATCH, 2, 32, 32))) / \
        np.sqrt(32 * 32)

    g_t = copy.deepcopy(g_t)
    loss_t, new_pl_mean_t, pl_lengths_t = oracle.sg2_g_pl_torch(
        g_t, torch.as_tensor(z), pl_noise, torch.tensor(pl_mean0))
    loss_t.backward()
    np.testing.assert_allclose(np.asarray(pl_lengths),
                               pl_lengths_t.detach().numpy(), rtol=1e-3)
    np.testing.assert_allclose(float(new_pl_mean), new_pl_mean_t.item(),
                               rtol=1e-4)
    np.testing.assert_allclose(float(loss), loss_t.item(), rtol=1e-3)
    grads_t, _ = _torch_params_as_tree(g_t, copy.deepcopy(d_t),
                                       from_grads=True)
    # Double-backprop chains accumulate more fp32 noise; keep rtol sane.
    _assert_tree_close(grads, grads_t, rtol=5e-3, atol=5e-5,
                       what='g_pl grads')


def test_d_main_loss_and_grads_match_torch(setup):
    g_t, d_t, gp, g_cfg, dp, d_cfg, z, real = setup
    fns = train.make_train_fns(g_cfg, d_cfg, _cfg())
    k = _keys()
    (loss, (lg, lr_, rt)), grads = jax.value_and_grad(
        fns.loss_d_main, has_aux=True)(
            dp, gp, jnp.asarray(real), jnp.asarray(z), jnp.asarray(z),
            None, k[0], k[1], k[2], k[3], 0.0)

    g_t = copy.deepcopy(g_t)
    d_t = copy.deepcopy(d_t)
    loss_t, lg_t, lr_t, rt_t = oracle.sg2_d_main_torch(
        g_t, d_t, torch.as_tensor(z), torch.as_tensor(real))
    loss_t.backward()
    np.testing.assert_allclose(float(lg), lg_t.item(), rtol=1e-4)
    np.testing.assert_allclose(float(lr_), lr_t.item(), rtol=1e-4)
    np.testing.assert_allclose(float(rt), rt_t.item(), atol=1e-6)
    _, grads_t = _torch_params_as_tree(g_t, d_t, from_grads=True)
    _assert_tree_close(grads, grads_t, what='d_main grads')


def test_d_r1_loss_and_grads_match_torch(setup):
    g_t, d_t, gp, g_cfg, dp, d_cfg, z, real = setup
    cfg = _cfg()
    fns = train.make_train_fns(g_cfg, d_cfg, cfg)
    (loss, penalty), grads = jax.value_and_grad(
        fns.loss_d_r1, has_aux=True)(dp, jnp.asarray(real), None)

    d_t = copy.deepcopy(d_t)
    loss_t, penalty_t = oracle.sg2_d_r1_torch(
        d_t, torch.as_tensor(real), r1_gamma=cfg.r1_gamma)
    loss_t.backward()
    np.testing.assert_allclose(float(penalty), penalty_t.item(), rtol=1e-3)
    np.testing.assert_allclose(float(loss), loss_t.item(), rtol=1e-3)
    _, grads_t = _torch_params_as_tree(copy.deepcopy(g_t), d_t,
                                       from_grads=True)
    _assert_tree_close(grads, grads_t, rtol=5e-3, atol=5e-5,
                       what='d_r1 grads')


# ---------------------------------------------------------------------------
# One full Adam phase step vs torch (catches the mb_ratio lr/beta folding)


def test_g_main_adam_step_matches_torch(setup):
    g_t, d_t, gp, g_cfg, dp, d_cfg, z, real = setup
    cfg = _cfg()
    fns = train.make_train_fns(g_cfg, d_cfg, cfg)
    state = fns.state_from_params(gp, dp)
    k = jax.random.PRNGKey(0)
    state, _ = fns.g_main(state, jnp.asarray(z), jnp.asarray(z), None,
                          k, jnp.float32(0.0))

    g_t = copy.deepcopy(g_t)
    d_t = copy.deepcopy(d_t)
    ratio = cfg.g_reg_interval / (cfg.g_reg_interval + 1.0)
    opt = torch.optim.Adam(g_t.parameters(), lr=cfg.lr * ratio,
                           betas=(cfg.beta1 ** ratio, cfg.beta2 ** ratio),
                           eps=cfg.eps)
    loss_t = oracle.sg2_g_main_torch(g_t, d_t, torch.as_tensor(z))
    opt.zero_grad()
    loss_t.backward()
    opt.step()
    new_gp_t, _ = _torch_params_as_tree(g_t, d_t)
    _assert_tree_close(state['g'], new_gp_t, rtol=1e-3, atol=1e-6,
                       what='g_main adam step')
    # w_avg buffer: ours lerps toward the batch w mean (torch mapping
    # buffer semantics, w_avg_beta) — torch's eval-mode oracle doesn't.
    w1 = networks.mapping_apply(gp['mapping'], g_cfg, jnp.asarray(z),
                                broadcast=False)
    expect = np.asarray(jnp.mean(w1, axis=0) * (1 - cfg.w_avg_beta)
                        + gp['mapping']['w_avg'] * cfg.w_avg_beta)
    np.testing.assert_allclose(np.asarray(state['g']['mapping']['w_avg']),
                               expect, rtol=1e-5, atol=1e-7)


def test_d_main_adam_step_matches_torch(setup):
    g_t, d_t, gp, g_cfg, dp, d_cfg, z, real = setup
    cfg = _cfg()
    fns = train.make_train_fns(g_cfg, d_cfg, cfg)
    state = fns.state_from_params(gp, dp)
    k = jax.random.PRNGKey(0)
    state, _ = fns.d_main(state, jnp.asarray(real), jnp.asarray(z),
                          jnp.asarray(z), None, k, jnp.float32(0.0))

    g_t = copy.deepcopy(g_t)
    d_t = copy.deepcopy(d_t)
    ratio = cfg.d_reg_interval / (cfg.d_reg_interval + 1.0)
    opt = torch.optim.Adam(d_t.parameters(), lr=cfg.lr * ratio,
                           betas=(cfg.beta1 ** ratio, cfg.beta2 ** ratio),
                           eps=cfg.eps)
    loss_t, *_ = oracle.sg2_d_main_torch(
        g_t, d_t, torch.as_tensor(z), torch.as_tensor(real))
    opt.zero_grad()
    loss_t.backward()
    opt.step()
    _, new_dp_t = _torch_params_as_tree(g_t, d_t)
    _assert_tree_close(state['d'], new_dp_t, rtol=1e-3, atol=1e-6,
                       what='d_main adam step')


# ---------------------------------------------------------------------------
# Perturbation sensitivity: the parity above must FAIL on a wrong formula


def test_parity_detects_wrong_interval_folding(setup):
    g_t, d_t, gp, g_cfg, dp, d_cfg, z, real = setup
    cfg = _cfg()
    fns = train.make_train_fns(g_cfg, d_cfg, cfg)
    (loss, _), _ = jax.value_and_grad(fns.loss_d_r1, has_aux=True)(
        dp, jnp.asarray(real), None)
    loss_t, _ = oracle.sg2_d_r1_torch(
        copy.deepcopy(d_t), torch.as_tensor(real), r1_gamma=cfg.r1_gamma,
        d_reg_interval=cfg.d_reg_interval + 1)  # wrong lazy interval
    assert not np.allclose(float(loss), loss_t.item(), rtol=1e-3)


# ---------------------------------------------------------------------------
# ADA pipe semantics


def test_ada_identity_at_p0():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(3, 2, 16, 16).astype(np.float32))
    out = apply_ada(x, jax.random.PRNGKey(1), 0.0, pipe_config('bgcfnc'))
    np.testing.assert_allclose(np.asarray(out), np.asarray(x),
                               rtol=1e-5, atol=1e-5)


def test_ada_xflip_at_p1():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(3, 2, 16, 16).astype(np.float32))
    out = apply_ada(x, jax.random.PRNGKey(1), 1.0,
                    pipe_config(None, xflip=1))
    np.testing.assert_allclose(np.asarray(out), np.asarray(x)[..., ::-1],
                               rtol=1e-4, atol=1e-5)


def test_ada_differentiable_wrt_image():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 2, 16, 16).astype(np.float32))

    def f(img):
        return jnp.sum(apply_ada(img, jax.random.PRNGKey(3), 0.7,
                                 pipe_config('bgc')) ** 2)

    g = jax.grad(f)(x)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_ada_controller_direction():
    up = AdaController(target=0.6, interval=2, ada_kimg=1)
    for _ in range(4):
        p_up = up.update(1.0, 16)      # D confident on reals -> augment more
    assert p_up > 0
    down = AdaController(target=0.6, interval=2, ada_kimg=1, p_init=0.5)
    for _ in range(4):
        p_down = down.update(-1.0, 16)
    assert p_down < 0.5
    floor = AdaController(target=0.6, interval=2, ada_kimg=0.001)
    for _ in range(4):
        p_floor = floor.update(-1.0, 16)
    assert p_floor == 0.0              # clipped at 0


def test_ada_deferred_flush_equals_eager():
    """train_loop defers the per-step rt host fetch to tick boundaries
    (~44 ms/step saved on the relay): the deferred-flush policy must
    produce the IDENTICAL p trajectory and controller state as eager
    per-step updates, including across a mid-window flush (the snapshot
    path) and a mid-window resume."""
    rng = np.random.RandomState(0)
    rts = rng.uniform(-1, 1, size=23).tolist()
    kw = dict(target=0.6, interval=4, ada_kimg=0.01, p_init=0.1)
    eager = AdaController(**kw)
    deferred = AdaController(**kw)
    pending = []
    p_deferred = deferred.p
    for i, rt in enumerate(rts):
        p_eager = eager.update(rt, 16)
        pending.append(rt)
        if deferred.will_tick(len(pending)):
            p_deferred = train._flush_ada(deferred, pending, 16)
        assert p_deferred == p_eager, i
        if i == 9:  # mid-window snapshot: flush, then state must match
            p_deferred = train._flush_ada(deferred, pending, 16)
            assert deferred.state_dict() == eager.state_dict()
            # ...and a resume from that state continues identically.
            deferred = AdaController(**kw)
            deferred.load_state_dict(eager.state_dict())
    train._flush_ada(deferred, pending, 16)
    assert deferred.state_dict() == eager.state_dict()


# ---------------------------------------------------------------------------
# EMA semantics


def test_ema_lerps_params_copies_buffers(setup):
    _, _, gp, g_cfg, dp, d_cfg, _, _ = setup
    fns = train.make_train_fns(g_cfg, d_cfg, _cfg())
    state = fns.state_from_params(gp, dp)
    # Make g differ from g_ema.
    state['g'] = jax.tree_util.tree_map(lambda x: x + 1.0, state['g'])
    state = fns.ema(state, 0.75)
    new_ema = state['g_ema']
    np.testing.assert_allclose(
        np.asarray(new_ema['mapping']['fc0']['weight']),
        np.asarray(gp['mapping']['fc0']['weight'] + 1.0 * 0.25),
        rtol=1e-4, atol=1e-6)
    # Buffers copied, not lerped.
    np.testing.assert_allclose(
        np.asarray(new_ema['mapping']['w_avg']),
        np.asarray(gp['mapping']['w_avg'] + 1.0), rtol=1e-4, atol=1e-6)


def test_ema_beta_rampup():
    cfg = _cfg(ema_kimg=10.0, ema_rampup=0.05)
    early = train.ema_beta(cfg, cur_nimg=100)
    late = train.ema_beta(cfg, cur_nimg=10_000_000)
    assert early < late < 1.0  # ramp makes early EMA track faster
    assert late == pytest.approx(0.5 ** (BATCH / 10_000.0))


# ---------------------------------------------------------------------------
# Sharded == single-device training step (8-device CPU mesh)


@pytest.mark.slow
def test_train_step_sharded_equals_single(setup):
    """Loss and GRADIENT parity between the 8-device DP mesh and a single
    device. Post-Adam params are NOT compared strictly: the first Adam
    step with beta1=0 is ±lr'*sign(grad) per component, so reduction-
    order fp noise on a near-zero gradient flips whole components by
    2*lr' — the gradients are the mathematically meaningful check."""
    from latentaugment_tpu.parallel import mesh as pmesh
    _, _, gp, g_cfg, dp, d_cfg, _, _ = setup
    cfg = _cfg(batch_size=8)
    rng = np.random.RandomState(3)
    z = jnp.asarray(rng.randn(8, 64).astype(np.float32))
    real = jnp.asarray(rng.rand(8, 2, 32, 32).astype(np.float32) * 2 - 1)
    k = jax.random.PRNGKey(5)

    fns1 = train.make_train_fns(g_cfg, d_cfg, cfg)
    (loss1, _), grads_g1 = jax.value_and_grad(
        fns1.loss_g_main, has_aux=True)(gp, dp, z, z, None, k, k, k, 0.0)
    (dloss1, _), grads_d1 = jax.value_and_grad(
        fns1.loss_d_main, has_aux=True)(dp, gp, real, z, z, None,
                                        k, k, k, k, 0.0)

    mesh = pmesh.get_mesh(8)
    fns8 = train.make_train_fns(g_cfg, d_cfg, cfg, mesh=mesh)
    gp8, dp8 = fns8.replicate(gp), fns8.replicate(dp)
    z8, real8 = fns8.shard_batch(z), fns8.shard_batch(real)
    (loss8, _), grads_g8 = jax.jit(jax.value_and_grad(
        fns8.loss_g_main, has_aux=True))(
            gp8, dp8, z8, z8, None, k, k, k, jnp.float32(0.0))
    (dloss8, _), grads_d8 = jax.jit(jax.value_and_grad(
        fns8.loss_d_main, has_aux=True))(
            dp8, gp8, real8, z8, z8, None, k, k, k, k, jnp.float32(0.0))

    np.testing.assert_allclose(float(loss1), float(loss8), rtol=1e-5)
    np.testing.assert_allclose(float(dloss1), float(dloss8), rtol=1e-5)
    _assert_tree_close(grads_g1, grads_g8, rtol=2e-3, atol=1e-5,
                       what='sharded g grads')
    _assert_tree_close(grads_d1, grads_d8, rtol=2e-3, atol=1e-5,
                       what='sharded d grads')

    # The full phase steps still run under the mesh (end-to-end check;
    # params agree within the 2*lr' Adam sign-flip bound). The g_main
    # step is lowered once so its collective census rides the same
    # compile: the trainer's DP contract is the walk's (batch sharded
    # end-to-end, no activation all-gathers) plus param-gradient
    # all-reduces, which at these shapes stay under the walk's reduce
    # ceiling.
    from latentaugment_tpu.parallel import audit
    s8 = fns8.replicate(fns8.state_from_params(gp, dp))
    compiled_gm = fns8.g_main.lower(
        s8, z8, z8, None, k, jnp.float32(0.0)).compile()
    audit.audit_walk_collectives(
        audit.collective_census(compiled_gm.as_text()))
    s8, _ = compiled_gm(s8, z8, z8, None, k, jnp.float32(0.0))
    s8, _ = fns8.d_main(s8, real8, z8, z8, None, k, jnp.float32(0.0))
    s1 = fns1.state_from_params(gp, dp)
    s1, _ = fns1.g_main(s1, z, z, None, k, jnp.float32(0.0))
    s1, _ = fns1.d_main(s1, real, z, z, None, k, jnp.float32(0.0))
    lr_eff = cfg.lr * cfg.g_reg_interval / (cfg.g_reg_interval + 1.0)
    _assert_tree_close(s1['g'], s8['g'], rtol=1.0, atol=2.1 * lr_eff,
                       what='sharded g step')


# ---------------------------------------------------------------------------
# End-to-end: a trained snapshot feeds the policy-side loaders


@pytest.mark.slow
def test_train_loop_snapshot_consumable(tmp_path):
    g_cfg = networks.generator_config(
        z_dim=32, w_dim=32, img_resolution=16, img_channels=2,
        channel_base=512, channel_max=32, num_mapping_layers=2,
        num_fp16_res=0)
    d_cfg = networks.discriminator_config(
        img_resolution=16, img_channels=2, channel_base=512,
        channel_max=32, num_fp16_res=0)
    cfg = train.train_config(batch_size=4, aug='ada', aug_pipe='bgc',
                             ada_interval=1, ada_kimg=0.01,
                             noise_mode='random')

    def data_iter():
        rng = np.random.RandomState(0)
        while True:
            yield rng.rand(4, 2, 16, 16).astype(np.float32) * 2 - 1, None

    state = train.train_loop(
        g_cfg, d_cfg, data_iter(), cfg, total_kimg=0.012,
        run_dir=str(tmp_path), snapshot_kimg=0.012, log_every=1)
    # Losses stayed finite, pl_mean moved off its init.
    assert np.isfinite(float(state['pl_mean']))

    from latentaugment_tpu.models.stylegan2 import convert
    snaps = sorted(tmp_path.glob('network-snapshot-*.pkl'))
    assert snaps, 'no snapshot written'
    g_params, g_cfg2, d_params, d_cfg2 = convert.load_stylegan(str(snaps[-1]))
    img = networks.generator_apply(
        jax.tree_util.tree_map(jnp.asarray, g_params), g_cfg2,
        jnp.zeros((2, 32)))
    assert img.shape == (2, 2, 16, 16)
    logits = networks.discriminator_apply(
        jax.tree_util.tree_map(jnp.asarray, d_params), d_cfg2, img)
    assert logits.shape == (2, 1)
    # log.jsonl carries the phase losses.
    log = (tmp_path / 'log.jsonl').read_text().strip().splitlines()
    assert 'Loss/G/loss' in log[-1] and 'Loss/D/real' in log[-1]


@pytest.mark.slow  # >60 s measured on the one-core box (round-4 fast-lane diet)
def test_train_loop_on_snapshot_hook(tmp_path):
    """on_snapshot fires once per written checkpoint with its real path —
    the hook snapshot-time metric evaluation rides (scripts/train_sg2.py
    --metrics)."""
    import os

    # Same shapes/cfg as test_train_loop_snapshot_consumable so the
    # in-process jit cache is reused.
    g_cfg = networks.generator_config(
        z_dim=32, w_dim=32, img_resolution=16, img_channels=2,
        channel_base=512, channel_max=32, num_mapping_layers=2,
        num_fp16_res=0)
    d_cfg = networks.discriminator_config(
        img_resolution=16, img_channels=2, channel_base=512,
        channel_max=32, num_fp16_res=0)
    cfg = train.train_config(batch_size=4, aug='ada', aug_pipe='bgc',
                             ada_interval=1, ada_kimg=0.01,
                             noise_mode='random')

    def data_iter():
        rng = np.random.RandomState(0)
        while True:
            yield rng.rand(4, 2, 16, 16).astype(np.float32) * 2 - 1, None

    calls = []
    train.train_loop(
        g_cfg, d_cfg, data_iter(), cfg, total_kimg=0.012,
        run_dir=str(tmp_path), snapshot_kimg=0.012, log_every=1,
        on_snapshot=lambda path, state, nimg: calls.append((path, nimg)))
    assert calls, 'on_snapshot never fired'
    for path, nimg in calls:
        assert os.path.exists(path)
        assert nimg > 0


@pytest.mark.slow
def test_train_sg2_snapshot_metrics(tmp_path, monkeypatch):
    """scripts/train_sg2.py --metrics scores each snapshot against the
    real dataset zip through the live-generator FID path and appends
    metric-<mode>-<metric>.jsonl per modality (the torch trainer's
    snapshot-metric protocol)."""
    import importlib.util
    import json
    import os
    import sys

    from synthetic import build_workspace

    monkeypatch.setenv('LATENTAUGMENT_CACHE_DIR',
                       str(tmp_path / 'det_cache'))
    ws = build_workspace(tmp_path)

    from latentaugment_tpu.metrics import (
        frechet_inception_distance as fid_mod,
        metric_main_mi_multimodal as mm,
    )
    if not mm.is_valid_metric('fid_tiny_test'):
        @mm.register_metric
        def fid_tiny_test(opts):
            return dict(fid_tiny_test=fid_mod.compute_fid(
                opts, max_real=16, num_gen=8))

    spec = importlib.util.spec_from_file_location(
        'train_sg2_mod', os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            'scripts', 'train_sg2.py'))
    train_sg2 = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(train_sg2)

    run_dir = str(tmp_path / 'run')
    train_sg2.main([
        '--cpu', '--data', ws['img_zip'], '--outdir', run_dir,
        '--resolution', '32', '--batch', '4', '--kimg', '0.008',
        '--snap', '0.008', '--metrics', 'fid_tiny_test',
        '--channel_base', '512', '--channel_max', '32',
        '--fp16_res', '0', '--aug', 'noaug'])

    files = sorted(
        f for f in os.listdir(run_dir)
        if f.startswith('metric-') and f.endswith('fid_tiny_test.jsonl'))
    assert files == ['metric-MR_MR_T2-fid_tiny_test.jsonl',
                     'metric-MR_nonrigid_CT-fid_tiny_test.jsonl'], files
    for f in files:
        row = json.loads(open(os.path.join(run_dir, f)).read()
                         .strip().splitlines()[-1])
        assert np.isfinite(row['results']['fid_tiny_test'])
        assert row['snapshot_pkl'].startswith('network-snapshot-')


def test_d_reg_r1_chunks_exact(setup):
    """r1_chunks=N computes the SAME R1 loss/penalty/gradients as the
    unchunked path (equal chunks -> chunk-mean of losses and grads is
    the full-batch mean, up to fp32 reduction order); it only bounds
    the double-backprop's peak memory. mbstd_group_size=1 here: with
    groups >1, minibatch-stddev couples samples through strided
    cross-batch groups that chunking recomposes (a data-order artifact,
    not an objective change — documented in r1_value_and_grads).
    Gradients, not post-Adam params, are compared: Adam's first step is
    ~lr*sign(grad), which amplifies reduction-order noise on near-zero
    gradients to full lr flips."""
    _, _, gp, g_cfg, dp, d_cfg, z, real = setup
    d_cfg = type(d_cfg)(dict(d_cfg), mbstd_group_size=1)
    outs = []
    for chunks in (1, 2):
        fns = train.make_train_fns(g_cfg, d_cfg,
                                   _cfg(aug='noaug', r1_chunks=chunks))
        state = fns.state_from_params(gp, dp)
        (loss, penalty), grads = fns.r1_value_and_grads(
            state['d'], jnp.asarray(real), None)
        outs.append((float(loss), float(penalty), grads))
    (l1, p1, grads1), (l2, p2, grads2) = outs
    np.testing.assert_allclose(l1, l2, rtol=2e-3, atol=1e-6)
    np.testing.assert_allclose(p1, p2, rtol=2e-3, atol=1e-6)
    scale = max(float(jnp.max(jnp.abs(leaf)))
                for leaf in jax.tree_util.tree_leaves(grads1))
    for (k1, a), (k2, b) in zip(
            jax.tree_util.tree_leaves_with_path(grads1),
            jax.tree_util.tree_leaves_with_path(grads2)):
        assert k1 == k2
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=1e-5 * scale,
                                   err_msg=str(k1))


@pytest.mark.slow  # >60 s measured on the one-core box (round-4 fast-lane diet)
def test_buffers_frozen_through_training_steps(setup):
    """resample_filter / noise_const / w_avg are torch BUFFERS: a full
    g_main + g_reg + d_main + d_reg sequence must not move them through
    Adam (w_avg only moves via its own EMA in _update_w_avg). Catches
    the round-3 bug where Adam trained the FIR taps (~lr drift/step,
    silently deforming the blur kernels; SKIP_LEAVES hid it from the
    torch grad-parity tests)."""
    _, _, gp, g_cfg, dp, d_cfg, z, real = setup
    fns = train.make_train_fns(g_cfg, d_cfg,
                               _cfg(w_avg_beta=1.0))  # freeze w_avg EMA too
    state = fns.state_from_params(gp, dp)
    before = {
        k: np.asarray(v)
        for k, v in _iter_buffer_leaves(state['g'], state['d'])}
    k = jax.random.PRNGKey(5)
    state, _ = fns.g_main(state, jnp.asarray(z), jnp.asarray(z), None, k,
                          jnp.float32(0.0))
    state, _ = fns.g_reg(state, jnp.asarray(z), jnp.asarray(z), None, k,
                         jnp.float32(0.0))
    state, _ = fns.d_main(state, jnp.asarray(real), jnp.asarray(z),
                          jnp.asarray(z), None, k, jnp.float32(0.0))
    state, _ = fns.d_reg(state, jnp.asarray(real), None, k,
                         jnp.float32(0.0))
    after = dict(_iter_buffer_leaves(state['g'], state['d']))
    assert before.keys() == after.keys() and before, 'no buffer leaves found'
    for name, b in before.items():
        if 'w_avg' in name:
            # w_avg updates through its own lerp; beta=1.0 makes it an
            # fp identity (w_mean + (w_avg - w_mean)*1), exact only to
            # one ulp.
            np.testing.assert_allclose(b, np.asarray(after[name]),
                                       rtol=0, atol=1e-7, err_msg=name)
        else:
            np.testing.assert_array_equal(b, np.asarray(after[name]),
                                          err_msg=name)


def _iter_buffer_leaves(g, d):
    for prefix, tree in (('g', g), ('d', d)):
        for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
            if train._is_buffer(path):
                yield prefix + jax.tree_util.keystr(path), leaf


def test_prefetch_iter_yields_in_order_and_propagates_errors():
    from latentaugment_tpu.models.stylegan2.train import prefetch_iter

    def gen():
        yield 1
        yield 2
        raise RuntimeError('loader boom')

    it = prefetch_iter(gen(), depth=1)
    assert next(it) == 1
    assert next(it) == 2
    with pytest.raises(RuntimeError, match='loader boom'):
        next(it)


def _resume_cfgs():
    # Same shapes as test_train_loop_snapshot_consumable (jit cache reuse),
    # but ADA on a short interval so the controller accumulator state is
    # actually exercised across the save/restore boundary.
    g_cfg = networks.generator_config(
        z_dim=32, w_dim=32, img_resolution=16, img_channels=2,
        channel_base=512, channel_max=32, num_mapping_layers=2,
        num_fp16_res=0)
    d_cfg = networks.discriminator_config(
        img_resolution=16, img_channels=2, channel_base=512,
        channel_max=32, num_fp16_res=0)
    cfg = train.train_config(batch_size=4, aug='ada', aug_pipe='bgc',
                             ada_interval=3, ada_kimg=0.01,
                             noise_mode='random')
    return g_cfg, d_cfg, cfg


def _resume_data_iter(start_batch=0):
    """Deterministic per-index batches so the resumed run can replay the
    stream from the interruption point (per-batch seeded, not stateful)."""
    i = start_batch
    while True:
        rng = np.random.RandomState(1000 + i)
        yield rng.rand(4, 2, 16, 16).astype(np.float32) * 2 - 1, None
        i += 1


@pytest.mark.slow
def test_training_state_resume_bitexact(tmp_path):
    """Interrupt-and-resume == uninterrupted, bit for bit: params, EMA,
    Adam moments, pl_mean, ADA controller and the PRNG stream all
    continue through training-state-*.pkl (the stylegan3 trainer's
    training-state-*.pt contract; stylegan2-ada cannot do this)."""
    g_cfg, d_cfg, cfg = _resume_cfgs()

    # Uninterrupted: 4 steps (16 imgs).
    ref = train.train_loop(
        g_cfg, d_cfg, _resume_data_iter(), cfg, total_kimg=0.016,
        run_dir=str(tmp_path / 'a'), snapshot_kimg=0, log_every=100,
        seed=7)

    # Interrupted at 2 steps; snapshot_kimg=0.008 writes the training
    # state exactly there.
    train.train_loop(
        g_cfg, d_cfg, _resume_data_iter(), cfg, total_kimg=0.008,
        run_dir=str(tmp_path / 'b'), snapshot_kimg=0.008, log_every=100,
        seed=7)
    states = sorted((tmp_path / 'b').glob('training-state-*.pkl'))
    assert states, 'no training state written'

    # Resume for the remaining 2 steps, data stream replayed from batch 2;
    # a different seed proves the saved key wins.
    out = train.train_loop(
        g_cfg, d_cfg, _resume_data_iter(start_batch=2), cfg,
        total_kimg=0.016, run_dir=str(tmp_path / 'b'),
        snapshot_kimg=0, log_every=100, seed=999,
        resume_state=str(states[-1]))

    ref_leaves = jax.tree_util.tree_leaves(ref)
    out_leaves = jax.tree_util.tree_leaves(out)
    assert len(ref_leaves) == len(out_leaves)
    for a, b in zip(ref_leaves, out_leaves):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_training_state_rejects_mismatched_cfg(tmp_path):
    """A training state saved under one network shape must refuse to load
    into another (leaf shape validation), not silently mis-assign.
    Exercises save/validate directly (no training steps — cheap)."""
    g_cfg, d_cfg, cfg = _resume_cfgs()
    fns = train.make_train_fns(g_cfg, d_cfg, cfg)
    state = fns.init_state(jax.random.PRNGKey(0))
    train.save_training_state(
        str(tmp_path), state, g_cfg=g_cfg, d_cfg=d_cfg, cfg=cfg,
        cur_nimg=8, step=2, key=jax.random.PRNGKey(1), p=0.1)
    states = sorted(tmp_path.glob('training-state-*.pkl'))
    assert states
    g_big = networks.generator_config(
        z_dim=32, w_dim=32, img_resolution=16, img_channels=2,
        channel_base=1024, channel_max=64, num_mapping_layers=2,
        num_fp16_res=0)
    with pytest.raises(ValueError, match='leaf|leaves'):
        train.train_loop(
            g_big, d_cfg, _resume_data_iter(start_batch=2), cfg,
            total_kimg=0.016, snapshot_kimg=0,
            resume_state=str(states[-1]))


def _load_train_sg2():
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        'train_sg2_mod', os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            'scripts', 'train_sg2.py'))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_training_state_restricted_load_and_cfg_restore(tmp_path):
    """The training-state pickle round-trips through the exact-name
    allowlist unpickler (a --resume-state file is an ingestion surface),
    and scripts/train_sg2.resolve_train_cfg restores the SAVED
    hyperparameters — r1_chunks, gamma, aug mode — with explicit CLI
    flags overriding (the exact-continuation contract: an un-restored
    r1_chunks=1 default would compile-OOM the 256² b32 recipe)."""
    g_cfg, d_cfg, _ = _resume_cfgs()
    cfg = train.train_config(batch_size=16, r1_gamma=10.0, aug='fixed',
                             aug_p=0.2, r1_chunks=2, lr=1e-3)
    fns = train.make_train_fns(g_cfg, d_cfg, cfg)
    state = fns.init_state(jax.random.PRNGKey(0))
    train.save_training_state(
        str(tmp_path), state, g_cfg=g_cfg, d_cfg=d_cfg, cfg=cfg,
        cur_nimg=32, step=2, key=jax.random.PRNGKey(1), p=0.2)
    path = sorted(tmp_path.glob('training-state-*.pkl'))[-1]

    rs = train.load_training_state(str(path))  # restricted unpickler
    assert rs['cur_nimg'] == 32 and rs['train_cfg']['r1_chunks'] == 2

    train_sg2 = _load_train_sg2()
    # No explicit flags: every saved hyperparameter is restored.
    argv = ['--synthetic']
    cfg2 = train_sg2.resolve_train_cfg(
        train, train_sg2.parse_args(argv), rs, argv)
    assert cfg2.batch_size == 16 and cfg2.r1_gamma == 10.0
    assert cfg2.aug == 'fixed' and cfg2.aug_p == 0.2
    assert cfg2.r1_chunks == 2 and cfg2.lr == 1e-3
    # Explicit flags win; untouched saved values survive.
    argv = ['--synthetic', '--batch', '8', '--aug', 'ada']
    cfg3 = train_sg2.resolve_train_cfg(
        train, train_sg2.parse_args(argv), rs, argv)
    assert cfg3.batch_size == 8 and cfg3.aug == 'ada'
    assert cfg3.r1_chunks == 2 and cfg3.r1_gamma == 10.0


def test_training_state_load_blocks_tampered_pickle(tmp_path):
    """A crafted training-state referencing a non-allowlisted callable
    raises instead of executing (same posture as network-pickle
    ingestion, convert.py)."""
    import pickle

    class Evil:
        def __reduce__(self):
            return (eval, ("1+1",))

    path = tmp_path / 'training-state-000000001.pkl'
    path.write_bytes(pickle.dumps({'format_version': 1, 'x': Evil()}))
    with pytest.raises(pickle.UnpicklingError, match='Blocked'):
        train.load_training_state(str(path))


@pytest.mark.slow
def test_train_sg2_cli_resume_state(tmp_path):
    """CLI-level interrupt/resume: `--resume-state <pkl>` alone (no other
    recipe flags) continues with the SAVED batch size / aug config — the
    resumed run's log advances in the saved batch-size increments."""
    import json

    train_sg2 = _load_train_sg2()
    run = tmp_path / 'run'
    train_sg2.main([
        '--cpu', '--synthetic', '--outdir', str(run), '--batch', '2',
        '--aug', 'noaug', '--kimg', '0.008', '--snap', '0.004',
        '--seed', '3'])
    states = sorted(run.glob('training-state-*.pkl'))
    assert states, 'no training state written'

    run2 = tmp_path / 'run2'
    train_sg2.main([
        '--cpu', '--synthetic', '--outdir', str(run2),
        '--resume-state', str(states[-1]), '--kimg', '0.012',
        '--snap', '0'])
    rows = [json.loads(l) for l in
            (run2 / 'log.jsonl').read_text().strip().splitlines()]
    # Restored batch_size=2 (not the CLI default 32): kimg advances in
    # 0.002 steps from the interruption point.
    assert rows[-1]['kimg'] > 0.004
    kimgs = [r['kimg'] for r in rows]
    assert all(abs(round(k / 0.002) * 0.002 - k) < 1e-9 for k in kimgs), \
        kimgs


def test_training_state_pruning(tmp_path):
    """Only the newest `keep` training-state files survive; other run
    artifacts (network snapshots) are untouched by the prune glob."""
    g_cfg, d_cfg, cfg = _resume_cfgs()
    fns = train.make_train_fns(g_cfg, d_cfg, cfg)
    state = fns.init_state(jax.random.PRNGKey(0))
    (tmp_path / 'network-snapshot-000000.pkl').write_bytes(b'keepme')
    for nimg in (4, 8, 12, 16):
        train.save_training_state(
            str(tmp_path), state, g_cfg=g_cfg, d_cfg=d_cfg, cfg=cfg,
            cur_nimg=nimg, step=nimg // 4, key=jax.random.PRNGKey(1),
            p=0.0, keep=2)
    states = sorted(p.name for p in tmp_path.glob('training-state-*.pkl'))
    assert states == ['training-state-000000012.pkl',
                      'training-state-000000016.pkl']
    assert (tmp_path / 'network-snapshot-000000.pkl').exists()


@pytest.mark.slow
def test_training_state_resume_mesh(tmp_path):
    """Resume on a DP mesh == uninterrupted mesh run, bit for bit: the
    saved leaves come off replicated sharded arrays and the restored
    state is re-replicated onto the mesh (the multi-process save path
    gathers the same way; tests/test_multihost.py covers the real
    2-process cluster)."""
    from latentaugment_tpu.parallel import mesh as pmesh
    g_cfg, d_cfg, cfg = _resume_cfgs()
    mesh = pmesh.get_mesh(2)

    ref = train.train_loop(
        g_cfg, d_cfg, _resume_data_iter(), cfg, total_kimg=0.016,
        run_dir=str(tmp_path / 'a'), snapshot_kimg=0, log_every=100,
        seed=7, mesh=mesh)
    train.train_loop(
        g_cfg, d_cfg, _resume_data_iter(), cfg, total_kimg=0.008,
        run_dir=str(tmp_path / 'b'), snapshot_kimg=0.008, log_every=100,
        seed=7, mesh=mesh)
    states = sorted((tmp_path / 'b').glob('training-state-*.pkl'))
    assert states, 'no training state written under the mesh'
    out = train.train_loop(
        g_cfg, d_cfg, _resume_data_iter(start_batch=2), cfg,
        total_kimg=0.016, run_dir=str(tmp_path / 'b'),
        snapshot_kimg=0, log_every=100, seed=999, mesh=mesh,
        resume_state=str(states[-1]))

    for a, b in zip(jax.tree_util.tree_leaves(ref),
                    jax.tree_util.tree_leaves(out)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
