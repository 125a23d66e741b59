"""GAN / reconstruction losses (reference: losses.py:6-60, train_ms.py:577-599).

All pure jnp; inputs are channel-last. Conventions match the reference:
LSGAN losses, feature loss x2 with real maps detached, masked KL normalized by
mask sum.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def feature_loss(fmap_r, fmap_g):
    """2 * sum of L1 between all real/fake feature maps. Ref: losses.py:6-14."""
    loss = 0.0
    for dr, dg in zip(fmap_r, fmap_g):
        for rl, gl in zip(dr, dg):
            rl = jax.lax.stop_gradient(rl.astype(jnp.float32))
            loss += jnp.mean(jnp.abs(rl - gl.astype(jnp.float32)))
    return loss * 2.0


def discriminator_loss(disc_real_outputs, disc_generated_outputs):
    """LSGAN D loss. Ref: losses.py:17-30."""
    loss = 0.0
    r_losses, g_losses = [], []
    for dr, dg in zip(disc_real_outputs, disc_generated_outputs):
        r_loss = jnp.mean((1.0 - dr.astype(jnp.float32)) ** 2)
        g_loss = jnp.mean(dg.astype(jnp.float32) ** 2)
        loss += r_loss + g_loss
        r_losses.append(r_loss)
        g_losses.append(g_loss)
    return loss, r_losses, g_losses


def generator_loss(disc_outputs):
    """LSGAN G loss. Ref: losses.py:33-42."""
    loss = 0.0
    gen_losses = []
    for dg in disc_outputs:
        l = jnp.mean((1.0 - dg.astype(jnp.float32)) ** 2)
        gen_losses.append(l)
        loss += l
    return loss, gen_losses


def kl_loss(z_p, logs_q, m_p, logs_p, z_mask):
    """Masked KL(q||p) between posterior and aligned prior. Ref: losses.py:45-60.

    z_p, logs_q, m_p, logs_p: [b, t, d]; z_mask: [b, t].
    """
    z_p = z_p.astype(jnp.float32)
    logs_q = logs_q.astype(jnp.float32)
    m_p = m_p.astype(jnp.float32)
    logs_p = logs_p.astype(jnp.float32)
    mask = z_mask.astype(jnp.float32)[..., None]

    kl = logs_p - logs_q - 0.5
    kl += 0.5 * ((z_p - m_p) ** 2) * jnp.exp(-2.0 * logs_p)
    return jnp.sum(kl * mask) / jnp.sum(mask)
