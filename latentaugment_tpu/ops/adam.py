"""Bias-corrected Adam micro-step for w-space descent.

Shared by the latent walk (augments/engine.py — reference torch.optim.Adam
over w, util_latent_aug.py:207-310) and the projector
(models/stylegan2/projector.py — NVIDIA projector.py's Adam on w), so the
two w-optimizers cannot drift apart. Parameter-tree training uses optax
(models/stylegan2/train.py); this is the scalar-hyperparameter scan-body
form those jitted walks inline.
"""

import jax.numpy as jnp

ADAM_B1 = 0.9
ADAM_B2 = 0.999
ADAM_EPS = 1e-8


def adam_step(w, m, v, g, t, lr, b1=ADAM_B1, b2=ADAM_B2, eps=ADAM_EPS):
    """One bias-corrected Adam update. `t` is the 0-based step index
    (python int or traced scalar); returns (w_new, m_new, v_new)."""
    m = b1 * m + (1.0 - b1) * g
    v = b2 * v + (1.0 - b2) * jnp.square(g)
    m_hat = m / (1.0 - jnp.power(b1, t + 1.0))
    v_hat = v / (1.0 - jnp.power(b2, t + 1.0))
    return w - lr * m_hat / (jnp.sqrt(v_hat) + eps), m, v
