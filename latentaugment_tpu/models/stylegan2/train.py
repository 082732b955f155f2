"""TPU-native StyleGAN2(-ADA) training loop.

The reference framework *consumes* StyleGAN2 checkpoints but cannot
produce them: its README (reference README.md:55-59) sends users to
NVIDIA's external stylegan2-ada-pytorch trainer, exactly as it sends
them to the external projector for inversion (closed natively by
models/stylegan2/projector.py). This module closes the training
dependency the TPU way, so the full workflow — train G/D, invert the
dataset, run the LatentAugment policy — is self-contained:

- Four phase steps (Gmain, Gpl, Dmain, Dr1), each ONE jitted
  value_and_grad + Adam update. The lazy-regularization schedule is
  driven by a host-side counter over *static* intervals, so no phase
  ever retraces; regularizer strength folds into the loss (x interval)
  and the Adam hyperparameters fold the mb_ratio adjustment, matching
  stylegan2-ada's formulation.
- The loss formulas are the published StyleGAN2 objectives (Karras et
  al. 2019/2020): non-saturating logistic GAN loss, lazy R1 gradient
  penalty on (augmented) reals, lazy path-length regularization with an
  EMA'd target; ADA augmentation (ada.py) sits between every image and
  D with a *traced* probability p so host-side p adaptation never
  recompiles.
- R1 and PL are second-order: JAX composes `jax.grad` through
  `value_and_grad` directly — no `create_graph=True` machinery.
- Data-parallel by construction: batches are sharded over the mesh's
  'data' axis, params/opt-state replicated; the batch-mean losses
  become single all-reduces under GSPMD (same design as the walk,
  augments/engine.py).
- G_ema is a jitted tree-lerp; buffers (w_avg, resample filters) are
  copied, parameters EMA'd, mirroring the torch trainer's
  copy_buffers/lerp split.
- Checkpoints go out in the framework's native format
  (convert.save_checkpoint), so a trained run feeds straight into the
  policy (`backbone_latentaugment.py --model_dir <run>/ckpt.pkl`) and
  the projector.

Deliberate deviations, documented:
- No per-layer noise-buffer regularization and no imgfilter ADA group
  (see ada.py); mixed precision uses the networks' num_fp16_res bf16
  blocks instead of torch AMP.

All device state lives in PLAIN dict pytrees passed as jit ARGUMENTS
(never closures) so the compile relay accepts the HLO (CLAUDE.md: 413
limit) and params stay device-resident buffers.
"""

import glob
import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp
import optax

from . import networks
from .ada import AdaController, apply_ada, pipe_config
from ...utils.util_easydict import EasyDict

_BUFFER_NAMES = ('w_avg', 'resample_filter', 'noise_const')


def _is_buffer(path):
    return any(str(getattr(p, 'key', getattr(p, 'name', p)))
               in _BUFFER_NAMES for p in path)


def _freeze_buffer_grads(grads):
    """Zero gradients on torch-buffer leaves. The torch trainer never
    optimizes w_avg (updated by its own EMA), resample_filter (fixed
    FIR taps — Adam drift here silently deforms the blur kernels and
    thus the architecture) or noise_const (per-layer noise images);
    the autodiff param tree carries them, so mask them out of every
    optimizer step."""
    return jax.tree_util.tree_map_with_path(
        lambda path, g: jnp.zeros_like(g) if _is_buffer(path) else g, grads)


def train_config(**overrides):
    """Hyperparameters, defaulting to stylegan2-ada's 'auto' config."""
    cfg = EasyDict(
        batch_size=32,
        lr=2.5e-3,
        beta1=0.0,
        beta2=0.99,
        eps=1e-8,
        r1_gamma=None,            # None -> 0.0002 * res^2 / batch (auto)
        pl_weight=2.0,
        pl_decay=0.01,
        pl_batch_shrink=2,
        g_reg_interval=4,
        d_reg_interval=16,
        style_mixing_prob=0.9,
        w_avg_beta=0.995,
        ema_kimg=10.0,
        ema_rampup=0.05,          # None disables the ramp-up
        aug='ada',                # 'ada' | 'noaug' | 'fixed'
        aug_pipe='bgc',
        ada_target=0.6,
        ada_interval=4,
        ada_kimg=500,
        aug_p=0.0,                # initial (or fixed) augmentation p
        noise_mode='random',
        remat=False,
        r1_chunks=1,              # sequential half-batches inside d_reg:
                                  # R1's double-backprop temps dominate HBM
                                  # at 256² (512 MB single temps at b32 —
                                  # compile-time OOM on a 16 GB chip);
                                  # chunk-mean of losses/grads is exact.
    )
    cfg.update(overrides)
    return cfg


def _adjusted_adam(lr, beta1, beta2, eps, reg_interval):
    """Lazy-regularization hyperparameter folding (mb_ratio): one
    optimizer serves the main+reg phases with interval-corrected
    lr/betas, as in the torch trainer's setup."""
    ratio = reg_interval / (reg_interval + 1.0)
    return optax.adam(learning_rate=lr * ratio, b1=beta1 ** ratio,
                      b2=beta2 ** ratio, eps=eps, eps_root=0.0)


def make_train_fns(g_cfg, d_cfg, cfg, mesh=None):
    """Build the jitted phase steps. Returns an EasyDict of functions:

      init_state(key) -> state
      g_main(state, z, z2, c, key, p)       -> (state, logs)
      g_reg(state, z, z2, c, key, p)        -> (state, logs)
      d_main(state, real, z, z2, c, key, p) -> (state, logs)
      d_reg(state, real, c, key, p)         -> (state, logs)
      ema(state, beta) -> state

    state is a plain-dict pytree: g, d, g_ema, opt_g, opt_d, pl_mean.
    """
    cfg = EasyDict(cfg)
    if cfg.r1_gamma is None:
        cfg.r1_gamma = 0.0002 * (g_cfg.img_resolution ** 2) / cfg.batch_size
    aug_cfg = None
    if cfg.aug != 'noaug':
        aug_cfg = pipe_config(cfg.aug_pipe)

    opt_g = _adjusted_adam(cfg.lr, cfg.beta1, cfg.beta2, cfg.eps,
                           cfg.g_reg_interval)
    opt_d = _adjusted_adam(cfg.lr, cfg.beta1, cfg.beta2, cfg.eps,
                           cfg.d_reg_interval)

    def init_state(key):
        kg, kd = jax.random.split(key)
        g = networks.generator_init(kg, g_cfg)
        d = networks.discriminator_init(kd, d_cfg)
        return {
            'g': g, 'd': d,
            'g_ema': jax.tree_util.tree_map(jnp.copy, g),
            'opt_g': opt_g.init(g), 'opt_d': opt_d.init(d),
            'pl_mean': jnp.zeros((), jnp.float32)}

    def _maybe_aug(img, key, p):
        if aug_cfg is None:
            return img
        return apply_ada(img, key, p, aug_cfg)

    def _map_mix(gp, z, z2, c, key):
        """Mapping + batch-level style mixing -> (ws, batch_w_mean).

        One traced cutoff per batch (the torch trainer's convention),
        realised as a num_ws mask — static shapes, no retrace."""
        k_gate, k_cut = jax.random.split(key)
        w1 = networks.mapping_apply(gp['mapping'], g_cfg, z, c,
                                    broadcast=False)
        w_mean = jnp.mean(w1, axis=0)
        ws = jnp.repeat(w1[:, None, :], g_cfg.num_ws, axis=1)
        if cfg.style_mixing_prob > 0:
            w2 = networks.mapping_apply(gp['mapping'], g_cfg, z2, c,
                                        broadcast=False)
            ws2 = jnp.repeat(w2[:, None, :], g_cfg.num_ws, axis=1)
            cutoff = jax.random.randint(k_cut, (), 1, g_cfg.num_ws)
            gate = jax.random.bernoulli(k_gate, cfg.style_mixing_prob)
            cutoff = jnp.where(gate, cutoff, g_cfg.num_ws)
            mix = jnp.arange(g_cfg.num_ws)[None, :, None] >= cutoff
            ws = jnp.where(mix, ws2, ws)
        return ws, w_mean

    def _synth(gp, ws, k_noise):
        rng = k_noise if cfg.noise_mode == 'random' else None
        return networks.synthesis_apply(gp['synthesis'], g_cfg, ws,
                                        noise_mode=cfg.noise_mode, rng=rng,
                                        remat=cfg.remat)

    def _update_w_avg(gp, w_mean):
        """Torch mapping's running w_avg buffer (lerp toward batch mean)."""
        w_avg = gp['mapping']['w_avg']
        new = w_mean + (w_avg - w_mean) * cfg.w_avg_beta
        return {**gp, 'mapping': {**gp['mapping'], 'w_avg': new}}

    # ---- phase losses (exposed on fns.* for oracle parity tests) ---------
    def loss_g_main(gp, dp, z, z2, c, k_mix, k_noise, k_aug, p):
        """Non-saturating logistic G loss: E[softplus(-D(aug(G(z))))]."""
        ws, w_mean = _map_mix(gp, z, z2, c, k_mix)
        img = _synth(gp, ws, k_noise)
        logits = networks.discriminator_apply(
            dp, d_cfg, _maybe_aug(img, k_aug, p), c, remat=cfg.remat)
        loss = jnp.mean(jax.nn.softplus(-logits))
        return loss, w_mean

    def loss_g_pl(gp, pl_mean, z, z2, c, k_mix, k_noise, k_pl):
        """Path-length penalty (lazy, x g_reg_interval folded in)."""
        ws, _ = _map_mix(gp, z, z2, c, k_mix)

        def img_dot_noise(ws_):
            img = _synth(gp, ws_, k_noise)
            pl_noise = jax.random.normal(k_pl, img.shape) / \
                np.sqrt(img.shape[2] * img.shape[3])
            return jnp.sum(img * pl_noise)

        pl_grads = jax.grad(img_dot_noise)(ws)
        pl_lengths = jnp.sqrt(
            jnp.mean(jnp.sum(jnp.square(pl_grads), axis=2), axis=1))
        new_pl_mean = pl_mean + cfg.pl_decay * \
            (jnp.mean(pl_lengths) - pl_mean)
        pl_penalty = jnp.square(
            pl_lengths - jax.lax.stop_gradient(new_pl_mean))
        loss = jnp.mean(pl_penalty) * cfg.pl_weight * cfg.g_reg_interval
        return loss, (new_pl_mean, pl_lengths)

    def loss_d_main(dp, gp, real, z, z2, c, k_mix, k_noise, k_aug_f,
                    k_aug_r, p):
        """D logistic loss on fake + real (both through the ADA pipe)."""
        ws, _ = _map_mix(gp, z, z2, c, k_mix)
        img = _synth(gp, ws, k_noise)
        gen_logits = networks.discriminator_apply(
            dp, d_cfg, _maybe_aug(img, k_aug_f, p), c, remat=cfg.remat)
        real_logits = networks.discriminator_apply(
            dp, d_cfg, _maybe_aug(real, k_aug_r, p), c, remat=cfg.remat)
        loss_gen = jnp.mean(jax.nn.softplus(gen_logits))
        loss_real = jnp.mean(jax.nn.softplus(-real_logits))
        # r_t = E[sign(D(real))] feeds the host-side ADA controller.
        rt = jnp.mean(jnp.sign(real_logits))
        # Negative-control seam (never set in production): flips the
        # OPTIMIZED objective only — the logged losses stay honest — so
        # scripts/check_train_run.py can be proven to FAIL a run whose D
        # unlearns (the checker's thresholds were originally tuned on a
        # single healthy run; tests/test_train_dynamics.py).
        flip = os.environ.get("LATAUG_NEGCTRL_FLIP_D_SIGN", "") \
            .strip().lower() not in ("", "0", "false", "off", "no")
        sign = -1.0 if flip else 1.0
        return sign * (loss_gen + loss_real), (loss_gen, loss_real, rt)

    def loss_d_r1(dp, aug_real, c):
        """R1 gradient penalty on the (already augmented) reals
        (lazy, x d_reg_interval and gamma/2 folded in)."""
        def d_sum(img):
            return jnp.sum(networks.discriminator_apply(
                dp, d_cfg, img, c, remat=cfg.remat))
        r1_grads = jax.grad(d_sum)(aug_real)
        penalty = jnp.sum(jnp.square(r1_grads), axis=(1, 2, 3))
        loss = jnp.mean(penalty) * (cfg.r1_gamma / 2.0) * cfg.d_reg_interval
        return loss, jnp.mean(penalty)

    # ---- phase: Gmain ----------------------------------------------------
    def g_main(state, z, z2, c, key, p):
        k_mix, k_noise, k_aug = jax.random.split(key, 3)
        (loss, w_mean), grads = jax.value_and_grad(
            loss_g_main, has_aux=True)(
                state['g'], state['d'], z, z2, c, k_mix, k_noise, k_aug, p)
        grads = _freeze_buffer_grads(grads)
        updates, new_opt = opt_g.update(grads, state['opt_g'], state['g'])
        g = optax.apply_updates(state['g'], updates)
        g = _update_w_avg(g, jax.lax.stop_gradient(w_mean))
        state = dict(state, g=g, opt_g=new_opt)
        return state, {'Loss/G/loss': loss}

    # ---- phase: G path-length regularization -------------------------------
    def g_reg(state, z, z2, c, key, p):
        k_mix, k_noise, k_pl = jax.random.split(key, 3)
        del p  # PL never sees D or the augmentation pipe
        # Batch already shrunk by the caller (pl_batch_shrink).
        (loss, (new_pl_mean, _)), grads = jax.value_and_grad(
            loss_g_pl, has_aux=True)(
                state['g'], state['pl_mean'], z, z2, c, k_mix, k_noise, k_pl)
        grads = _freeze_buffer_grads(grads)
        updates, new_opt = opt_g.update(grads, state['opt_g'], state['g'])
        g = optax.apply_updates(state['g'], updates)
        state = dict(state, g=g, opt_g=new_opt,
                     pl_mean=jax.lax.stop_gradient(new_pl_mean))
        return state, {'Loss/pl_penalty': loss}

    # ---- phase: Dmain ------------------------------------------------------
    def d_main(state, real, z, z2, c, key, p):
        k_mix, k_noise, k_aug_f, k_aug_r = jax.random.split(key, 4)
        (_, (loss_gen, loss_real, rt)), grads = jax.value_and_grad(
            loss_d_main, has_aux=True)(
                state['d'], state['g'], real, z, z2, c, k_mix, k_noise,
                k_aug_f, k_aug_r, p)
        grads = _freeze_buffer_grads(grads)
        updates, new_opt = opt_d.update(grads, state['opt_d'], state['d'])
        d = optax.apply_updates(state['d'], updates)
        state = dict(state, d=d, opt_d=new_opt)
        return state, {'Loss/D/gen': loss_gen, 'Loss/D/real': loss_real,
                       'Progress/rt': rt}

    # ---- phase: D R1 regularization -----------------------------------------
    def r1_value_and_grads(dp, aug_real, c):
        """(loss, penalty), grads of the R1 term — in cfg.r1_chunks
        sequential sub-batches when >1: bounds the double-backprop's
        peak HBM to one chunk's temps; with equal chunks the chunk-mean
        of losses/penalties/grads equals the full-batch values (up to
        fp32 reduction order). One caveat: minibatch-stddev couples
        samples through strided cross-batch groups, so chunking
        recomposes those groups — the same class of stochasticity as
        shuffling the batch order (group membership is a data-order
        artifact), not a change to the R1 objective."""
        n_chunks = int(cfg.get('r1_chunks', 1) or 1)
        if n_chunks > 1 and aug_real.shape[0] % n_chunks != 0:
            # Falling back to the unchunked path here would silently
            # reintroduce the compile-time HBM OOM the flag exists to
            # avoid (256² b32 — see module notes).
            raise ValueError(
                f"r1_chunks={n_chunks} must divide the R1 batch "
                f"{aug_real.shape[0]}")
        if n_chunks > 1:
            xs = aug_real.reshape(n_chunks, aug_real.shape[0] // n_chunks,
                                  *aug_real.shape[1:])
            if c is None:
                def chunk(x):
                    return jax.value_and_grad(
                        loss_d_r1, has_aux=True)(dp, x, None)
                (losses, penalties), grads = jax.lax.map(chunk, xs)
            else:
                cs = c.reshape(n_chunks, c.shape[0] // n_chunks,
                               *c.shape[1:])
                def chunk(args):
                    x, cc = args
                    return jax.value_and_grad(
                        loss_d_r1, has_aux=True)(dp, x, cc)
                (losses, penalties), grads = jax.lax.map(chunk, (xs, cs))
            return (jnp.mean(losses), jnp.mean(penalties)), \
                jax.tree_util.tree_map(lambda g: jnp.mean(g, axis=0), grads)
        return jax.value_and_grad(loss_d_r1, has_aux=True)(dp, aug_real, c)

    def d_reg(state, real, c, key, p):
        # R1 penalizes D's gradient w.r.t. the image D actually sees —
        # the AUGMENTED real (augmentation outside the penalty grad).
        aug_real = _maybe_aug(real, key, p)
        (loss, penalty), grads = r1_value_and_grads(state['d'], aug_real, c)
        grads = _freeze_buffer_grads(grads)
        updates, new_opt = opt_d.update(grads, state['opt_d'], state['d'])
        d = optax.apply_updates(state['d'], updates)
        state = dict(state, d=d, opt_d=new_opt)
        return state, {'Loss/r1_penalty': penalty, 'Loss/D/reg': loss}

    # ---- G_ema ---------------------------------------------------------------
    def ema(state, beta):
        new_ema = jax.tree_util.tree_map_with_path(
            lambda path, e, g: g if _is_buffer(path)
            else g + (e - g) * beta,
            state['g_ema'], state['g'])
        return dict(state, g_ema=new_ema)

    def state_from_params(g_params, d_params, pl_mean=0.0):
        """State around pre-existing (e.g. converted-from-torch) params —
        used by resume paths and the oracle parity tests. Params are
        COPIED in: the phase steps donate the state's buffers, which
        must never consume arrays the caller still holds."""
        g = jax.tree_util.tree_map(jnp.copy, g_params)
        d = jax.tree_util.tree_map(jnp.copy, d_params)
        return {
            'g': g, 'd': d,
            'g_ema': jax.tree_util.tree_map(jnp.copy, g),
            'opt_g': opt_g.init(g), 'opt_d': opt_d.init(d),
            'pl_mean': jnp.float32(pl_mean)}

    fns = EasyDict(init_state=init_state, cfg=cfg,
                   state_from_params=state_from_params,
                   loss_g_main=loss_g_main, loss_g_pl=loss_g_pl,
                   loss_d_main=loss_d_main, loss_d_r1=loss_d_r1,
                   r1_value_and_grads=r1_value_and_grads)
    if mesh is not None:
        from ...parallel import mesh as pmesh
        from ...ops.upfirdn2d import set_allow_pallas_blur
        set_allow_pallas_blur(False)  # GSPMD cannot partition pallas_call
        batch = pmesh.batch_sharding(mesh)
        repl = pmesh.replicated(mesh)
        fns.shard_batch = lambda x: jax.device_put(x, batch)
        fns.replicate = lambda tree: jax.device_put(
            tree, jax.tree_util.tree_map(lambda _: repl, tree))
    # The input state is DONATED: its buffers are reused for the output
    # state (saves ~one full state copy of HBM per phase call — params,
    # EMA and both Adam moments; material at 256² where activations
    # already crowd the 16 GB chip). Donation is honored on CPU too:
    # callers must rebind (`state, _ = fns.g_main(state, ...)`) and must
    # not hold outside references into the state tree — init_state and
    # state_from_params hand out freshly-copied buffers for exactly
    # this reason.
    fns.g_main = jax.jit(g_main, donate_argnums=0)
    fns.g_reg = jax.jit(g_reg, donate_argnums=0)
    fns.d_main = jax.jit(d_main, donate_argnums=0)
    fns.d_reg = jax.jit(d_reg, donate_argnums=0)
    fns.ema = jax.jit(ema, donate_argnums=0)
    return fns



class _PrefetchError:
    def __init__(self, exc):
        self.exc = exc


def prefetch_iter(it, depth=2):
    """Run `it` on a background daemon thread, keeping up to `depth`
    batches ready. The measured TPU loop spends ~2 s/step reading and
    normalizing 32 pickles synchronously while the device sits idle
    (BENCH_NOTES.md round 3) — overlapping host IO with the 1.25 s
    device step recovers most of it. Exceptions re-raise at the
    consuming end."""
    import queue
    import threading

    q = queue.Queue(maxsize=depth)

    def worker():
        try:
            for item in it:
                q.put(item)
        except BaseException as e:  # surface, don't hang the consumer
            q.put(_PrefetchError(e))

    threading.Thread(target=worker, daemon=True).start()
    while True:
        item = q.get()
        if isinstance(item, _PrefetchError):
            raise item.exc
        yield item


def _flush_ada(ada, pending, batch_size):
    """Apply deferred per-step rt values to the ADA controller (ONE
    device→host sync for the whole window) and clear the queue. After a
    flush the controller state equals the eager per-step-update state
    exactly — p never changes between ticks, so deferral is invisible
    to the p trajectory, and flushing before each training-state save
    keeps interrupt/resume bit-exact."""
    p = ada.p
    for rt in pending:
        p = ada.update(float(rt), batch_size)
    pending.clear()
    return p


def ema_beta(cfg, cur_nimg):
    """Per-step EMA decay: half-life ema_kimg kimg, with the torch
    trainer's startup ramp (ema_rampup limits the half-life to a
    fraction of images seen so early snapshots aren't frozen at init)."""
    ema_nimg = cfg.ema_kimg * 1000.0
    if cfg.ema_rampup is not None:
        ema_nimg = min(ema_nimg, max(cur_nimg, 1) * cfg.ema_rampup)
    return float(0.5 ** (cfg.batch_size / max(ema_nimg, 1e-8)))


def train_loop(g_cfg, d_cfg, data_iter, cfg, *, total_kimg=25000,
               run_dir=None, mesh=None, seed=0, snapshot_kimg=50,
               log_every=10, callbacks=None, state=None, on_snapshot=None,
               resume_state=None, keep_states=2):
    """Drive the phase schedule. `data_iter` yields (real_imgs [B,C,H,W]
    float32 in [-1,1], labels [B,c_dim] or None) on host.

    Returns the final state. Writes log.jsonl + native checkpoints
    (consumable by the policy engine and the projector) to run_dir.
    `on_snapshot(path, state, cur_nimg)` fires after each checkpoint is
    written — the hook the snapshot-time metric evaluation rides (the
    torch trainer computes its --metrics there, training_loop.py of
    stylegan2-ada; reference defers training entirely, README.md:55-59).

    `resume_state` (path or the dict from load_training_state) continues
    an interrupted run EXACTLY: raw G + D, G_ema, both Adam moment trees,
    pl_mean, loop counters, the evolved PRNG key and the ADA controller
    are all restored (test: device state matches an uninterrupted run
    bit-for-bit). Only the data iterator restarts — the same contract as
    NVIDIA's stylegan3 training-state-*.pt resume. Each snapshot also
    writes a training-state pickle (pruned to the newest `keep_states`).

    Multi-process clusters: process 0 is the sole writer (log.jsonl,
    snapshots, training states); a barrier after each snapshot orders
    the other ranks behind the writes. Resume re-replicates the restored
    host state onto the global mesh. Each process must feed the SAME
    global batch stream through `data_iter` (device_put global
    semantics) — tests/multihost_worker.py is the worked example.
    """
    cfg = EasyDict(cfg)
    fns = make_train_fns(g_cfg, d_cfg, cfg, mesh=mesh)
    data_iter = prefetch_iter(data_iter, depth=2)
    key = jax.random.PRNGKey(seed)

    ada = None
    if cfg.aug == 'ada':
        ada = AdaController(target=cfg.ada_target, interval=cfg.ada_interval,
                            ada_kimg=cfg.ada_kimg, p_init=cfg.aug_p)
    p = float(cfg.aug_p)

    cur_nimg = 0
    step = 0
    if resume_state is not None:
        assert state is None, 'pass either state or resume_state, not both'
        rs = resume_state if isinstance(resume_state, dict) \
            else load_training_state(resume_state)
        state = _state_from_leaves(fns, rs['state_leaves'])
        key = jnp.asarray(rs['key'])
        cur_nimg = int(rs['cur_nimg'])
        step = int(rs['step'])
        p = float(rs['p'])
        if ada is not None and rs.get('ada') is not None:
            ada.load_state_dict(rs['ada'])
        if int(rs['train_cfg'].get('batch_size', cfg.batch_size)) \
                != cfg.batch_size:
            print(f"[train] WARNING: resuming with batch_size="
                  f"{cfg.batch_size} != saved "
                  f"{rs['train_cfg']['batch_size']}; continuation is no "
                  f"longer step-exact")
    if state is None:
        key, k_init = jax.random.split(key)
        state = fns.init_state(k_init)
    if mesh is not None:
        state = fns.replicate(state)

    log_path = os.path.join(run_dir, 'log.jsonl') if run_dir else None
    if run_dir:
        os.makedirs(run_dir, exist_ok=True)

    t_start = time.time()
    logs_acc = {}
    ada_pending = []  # un-fetched per-step rt device scalars (see below)
    while cur_nimg < total_kimg * 1000:
        real, c = next(data_iter)
        real = jnp.asarray(real, jnp.float32)
        c = None if c is None else jnp.asarray(c, jnp.float32)
        key, kz, kz2, k1, k2, k3, k4 = jax.random.split(key, 7)
        z = jax.random.normal(kz, (cfg.batch_size, g_cfg.z_dim))
        z2 = jax.random.normal(kz2, (cfg.batch_size, g_cfg.z_dim))
        if mesh is not None:
            real, z, z2 = (fns.shard_batch(v) for v in (real, z, z2))
            if c is not None:
                c = fns.shard_batch(c)
        p_dev = jnp.float32(p)

        state, lg = fns.g_main(state, z, z2, c, k1, p_dev)
        logs_acc.update(lg)
        if step % cfg.g_reg_interval == 0 and cfg.pl_weight > 0:
            nb = max(cfg.batch_size // cfg.pl_batch_shrink, 1)
            state, lg = fns.g_reg(
                state, z[:nb], z2[:nb], None if c is None else c[:nb],
                k2, p_dev)
            logs_acc.update(lg)
        state, lg = fns.d_main(state, real, z, z2, c, k3, p_dev)
        logs_acc.update(lg)
        if step % cfg.d_reg_interval == 0 and cfg.r1_gamma != 0:
            state, lg = fns.d_reg(state, real, c, k4, p_dev)
            logs_acc.update(lg)
        state = fns.ema(state, ema_beta(cfg, cur_nimg))

        if ada is not None:
            # Defer the device→host rt fetch to tick boundaries: p only
            # changes when the controller ticks, so accumulating the
            # per-step rt means as DEVICE scalars and flushing them at
            # the tick yields the identical p trajectory and controller
            # state while paying the ~44 ms/step host sync once per
            # ada_interval steps instead of every step (BENCH_NOTES.md
            # measured the per-step sync at 3.5% of step time).
            ada_pending.append(logs_acc['Progress/rt'])
            if ada.will_tick(len(ada_pending)):
                p = _flush_ada(ada, ada_pending, cfg.batch_size)
        cur_nimg += cfg.batch_size
        step += 1

        if step % log_every == 0 or cur_nimg >= total_kimg * 1000:
            row = {k: float(v) for k, v in logs_acc.items()}
            row.update(step=step, kimg=cur_nimg / 1000.0, aug_p=p,
                       sec=round(time.time() - t_start, 3))
            if jax.process_index() == 0:  # one writer per cluster
                print('[train] ' + json.dumps(row))
                if log_path:
                    with open(log_path, 'a') as f:
                        f.write(json.dumps(row) + '\n')
            # Each row reports only phases that ran since the last row;
            # without this, a reg loss from up to d_reg_interval steps
            # ago would be re-emitted as if current. rt stays: the ADA
            # controller reads it every step.
            logs_acc = {'Progress/rt': logs_acc['Progress/rt']} \
                if 'Progress/rt' in logs_acc else {}
        if callbacks:
            for cb in callbacks:
                cb(step, cur_nimg, state, p)
        snap_interval = max(int(snapshot_kimg * 1000), cfg.batch_size) \
            if snapshot_kimg else 0
        if run_dir and snap_interval and \
                (cur_nimg % snap_interval < cfg.batch_size
                 or cur_nimg >= total_kimg * 1000):
            if ada is not None and ada_pending:
                # Mid-window snapshot: fold the deferred rt values in so
                # the saved controller state matches the eager-update
                # state at this step (resume bit-exactness).
                p = _flush_ada(ada, ada_pending, cfg.batch_size)
            snap_path = save_snapshot(run_dir, state, g_cfg, d_cfg, cur_nimg)
            save_training_state(run_dir, state, g_cfg=g_cfg, d_cfg=d_cfg,
                                cfg=cfg, cur_nimg=cur_nimg, step=step,
                                key=key, p=p, ada=ada, keep=keep_states)
            if jax.process_count() > 1:
                # Order non-writer ranks behind process 0's file writes
                # before anyone (on_snapshot metrics, a later resume)
                # reads the paths just returned.
                from jax.experimental import multihost_utils
                multihost_utils.sync_global_devices(
                    f'latentaugment_snapshot_{int(cur_nimg)}')
            if on_snapshot is not None:
                on_snapshot(snap_path, state, cur_nimg)
    return state


def save_snapshot(run_dir, state, g_cfg, d_cfg, cur_nimg):
    """Native checkpoint (G = EMA weights, as the torch trainer pickles
    G_ema) — directly consumable by the policy engine/projector.
    Multi-process runs: replicated state, one writer (process 0); the
    path is returned on every rank."""
    from . import convert
    path = os.path.join(
        run_dir, f'network-snapshot-{int(cur_nimg // 1000):06d}.pkl')
    if jax.process_index() != 0:
        return path
    g_host = jax.tree_util.tree_map(np.asarray, state['g_ema'])
    d_host = jax.tree_util.tree_map(np.asarray, state['d'])
    convert.save_checkpoint(path, g_params=g_host, g_cfg=dict(g_cfg),
                            d_params=d_host, d_cfg=dict(d_cfg))
    return path


def save_training_state(run_dir, state, *, g_cfg, d_cfg, cfg, cur_nimg,
                        step, key, p, ada=None, keep=2):
    """Full-fidelity interruption checkpoint (NVIDIA stylegan3's
    training-state-*.pt equivalent; stylegan2-ada has none — resume
    there loses Adam moments and the ADA controller). Saves everything
    the network snapshot drops: raw G (not just EMA), both Adam moment
    trees, pl_mean, loop counters, the evolved PRNG key and the ADA
    accumulator — train_loop(resume_state=...) continues bit-exactly.

    The state tree is stored as a flat leaf list (np arrays); restore
    rebuilds the structure from an eval_shape template, so no optax/jax
    container types enter the pickle. Prunes to the newest `keep` files.

    Multi-process runs: DP state is fully replicated, so every process
    can materialize it (jax allows np.asarray on fully-replicated
    cross-process arrays) but only process 0 writes; the path is
    returned on every rank and the post-snapshot barrier in train_loop
    orders readers behind the write.
    """
    from . import convert
    from ...utils.util_io import write_pickle_atomic
    # Named by raw nimg (not kimg like the network snapshots): sub-kimg
    # snapshot intervals must not overwrite each other's resume point.
    path = os.path.join(
        run_dir, f'training-state-{int(cur_nimg):09d}.pkl')
    if jax.process_index() != 0:
        return path
    obj = dict(
        format_version=1,
        state_leaves=[np.asarray(x)
                      for x in jax.tree_util.tree_leaves(state)],
        g_cfg=convert._cfg_kwargs(g_cfg, kind='G'),
        d_cfg=convert._cfg_kwargs(d_cfg, kind='D'),
        train_cfg={k: (dict(v) if isinstance(v, dict) else v)
                   for k, v in dict(cfg).items()},
        cur_nimg=int(cur_nimg), step=int(step),
        key=np.asarray(key), p=float(p),
        ada=None if ada is None else ada.state_dict())
    write_pickle_atomic(obj, path)
    if keep:
        stale = sorted(glob.glob(
            os.path.join(run_dir, 'training-state-*.pkl')))[:-int(keep)]
        for s in stale:
            os.remove(s)
    return path


def load_training_state(path):
    """Read a training-state pickle (see save_training_state).

    Routed through the exact-name-allowlist unpickler: a --resume-state
    file is an ingestion surface like any network pickle, so a tampered
    file must raise instead of executing code (the state is only dicts /
    floats / np arrays — well inside the allowlist)."""
    from . import convert
    obj = convert.load_network_pickle(path)
    ver = obj.get('format_version')
    if ver != 1:
        raise ValueError(f'unknown training-state format_version: {ver!r}')
    return obj


def _state_from_leaves(fns, leaves):
    """Rebuild the state pytree from saved leaves, validating every
    shape/dtype against the eval_shape template of init_state (catches a
    resume against mismatched network/optimizer configs up front)."""
    template = jax.eval_shape(fns.init_state, jax.random.PRNGKey(0))
    tdef = jax.tree_util.tree_structure(template)
    tleaves = jax.tree_util.tree_leaves(template)
    if len(leaves) != len(tleaves):
        raise ValueError(f'training state has {len(leaves)} leaves, '
                         f'configs imply {len(tleaves)}')
    for i, (got, want) in enumerate(zip(leaves, tleaves)):
        if tuple(got.shape) != tuple(want.shape) or \
                np.dtype(got.dtype) != np.dtype(want.dtype):
            raise ValueError(
                f'training-state leaf {i}: saved '
                f'{got.dtype}{tuple(got.shape)} != expected '
                f'{want.dtype}{tuple(want.shape)} — cfg mismatch?')
    return jax.tree_util.tree_unflatten(
        tdef, [jnp.asarray(x) for x in leaves])
