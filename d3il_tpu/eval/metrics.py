"""Success / behavioral-entropy / KL metrics, on device.

Formulas match the reference harness per task:
  * pushing: per-context mode distribution over successful rollouts,
    entropy normalized by log(4); score 0.5*(SR + H) (pushing_sim.py:140-172)
  * avoiding: 9-bit mode decoding, entropy base 24; score 0.8*SR + 0.2*H
    (avoiding_sim.py:126-139)
  * sorting: KL(mode_dist || demo prior); score SR - KL (sorting_sim.py:192-213)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def mode_probs_per_context(modes, successes, n_modes: int):
    """modes [C, T] int, successes [C, T] {0,1} -> normalized p(m|c) [C, M].

    Only successful rollouts count (pushing_sim.py:156-163).
    """
    onehot = jax.nn.one_hot(modes, n_modes) * successes[..., None]
    counts = onehot.sum(axis=1)  # [C, M]
    return counts / (counts.sum(axis=1, keepdims=True) + 1e-12)


def entropy(mode_probs, n_modes: int):
    """Mean normalized entropy over contexts (pushing_sim.py:167-168)."""
    h = -(mode_probs * jnp.log(mode_probs + 1e-12) / jnp.log(float(n_modes))).sum(-1)
    return h.mean()


def pushing_score(successes, modes):
    sr = successes.mean()
    probs = mode_probs_per_context(modes, successes, 4)
    h = entropy(probs, 4)
    return {"success_rate": sr, "entropy": h, "score": 0.5 * (sr + h)}


def avoiding_score(successes, mode_encodings):
    """successes [N], mode_encodings [N, 9] -> SR + pooled entropy base 24
    (avoiding_sim.py:126-139: np.unique over bit-packed encodings)."""
    sr = successes.mean()
    weights = (1 << np.arange(9)).astype(np.float32)
    dec = (mode_encodings * weights[None, :]).sum(-1)
    ok = successes > 0.5
    # histogram over the 512 possible encodings, successful rollouts only
    counts = jnp.zeros(512).at[dec.astype(jnp.int32)].add(ok.astype(jnp.float32))
    total = counts.sum()
    p = counts / (total + 1e-12)
    h = -jnp.sum(jnp.where(p > 0, p * jnp.log(p + 1e-12), 0.0)) / jnp.log(24.0)
    return {"success_rate": sr, "entropy": h, "score": 0.8 * sr + 0.2 * h}


def kl_to_prior(mode_probs, prior):
    """KL(p || prior) averaged over contexts (sorting_sim.py:192-218)."""
    p = mode_probs
    return (p * (jnp.log(p + 1e-12) - jnp.log(prior + 1e-12))).sum(-1).mean()
