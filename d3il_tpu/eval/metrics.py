"""Success / behavioral-entropy / KL metrics, on device.

Formulas match the reference harness per task:
  * pushing: per-context mode distribution over successful rollouts,
    entropy normalized by log(4); score 0.5*(SR + H) (pushing_sim.py:140-172)
  * avoiding: 9-bit mode decoding, entropy base 24; score 0.8*SR + 0.2*H
    (avoiding_sim.py:126-139)
  * aligning: 2 modes, entropy over all contexts; score 0.5*(SR + H)
    (aligning_sim.py:221-247)
  * sorting: entropy + KL(p(m|c) || demo prior) over nonzero contexts,
    both log-normalized by log(n_modes); score SR - KL
    (sorting_sim.py:192-218)
  * stacking: per-prefix (1/2/3-box) entropy + KL vs demo priors;
    score SR1 + SR2 + SR3 (stacking_sim.py:144-257)
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


def entropy_kl_nonzero(mode_probs, prior, n_modes: int):
    """Entropy and KL over contexts with at least one successful rollout.

    Mirrors sorting_sim.py:199-218 / stacking_sim.py:144-176: all-zero rows
    are dropped before averaging; both entropy and cross term are normalized
    by log(n_modes); KL = -H - mean_c sum_m p(m|c) log prior(m) / log M.
    """
    row_ok = mode_probs.sum(-1) > 1e-6
    denom = jnp.maximum(row_ok.sum(), 1)
    logM = jnp.log(float(n_modes))
    h_rows = -(mode_probs * jnp.log(mode_probs + 1e-12) / logM).sum(-1)
    x_rows = (mode_probs * jnp.log(jnp.asarray(prior) + 1e-12) / logM).sum(-1)
    h = jnp.where(row_ok, h_rows, 0.0).sum() / denom
    log_ = jnp.where(row_ok, x_rows, 0.0).sum() / denom
    return h, -h - log_


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


def aligning_score(successes, modes, mean_distance=None):
    """successes/modes [C, T]; 2 modes (inside/outside push),
    score 0.5*(SR + H) (aligning_sim.py:221-247)."""
    sr = successes.mean()
    probs = mode_probs_per_context(modes, successes, 2)
    h = entropy(probs, 2)
    out = {"success_rate": sr, "entropy": h, "score": 0.5 * (sr + h)}
    if mean_distance is not None:
        # Rollouts whose physics diverged (rod slamming the box can NaN the
        # box state) would poison a plain mean; average the finite entries
        # and report the diverged fraction alongside (the reference's plain
        # torch mean, aligning_sim.py:199, never meets NaN because MuJoCo
        # clamps instead of diverging).
        ok = jnp.isfinite(mean_distance)
        n_ok = jnp.maximum(ok.sum(), 1)
        out["mean_distance"] = jnp.where(ok, mean_distance, 0.0).sum() / n_ok
        out["nonfinite_frac"] = 1.0 - ok.mean()
    return out


def sorting_score(successes, modes, mode_keys, prior):
    """successes [C,T]; modes [C,T] = bit-packed color orders
    (sorting.py:460-462). mode_keys: the distinct encodings seen in the demo
    data; prior: their demo probabilities (sorting_sim.py:41-57).
    Rollout modes outside mode_keys count toward no bin (like the reference's
    equality tests). Score SR - KL (sorting_sim.py:210)."""
    mode_keys = jnp.asarray(mode_keys)
    n_modes = mode_keys.shape[0]
    eq = modes[..., None] == mode_keys[None, None, :]  # [C,T,M]
    counts = (eq * successes[..., None]).sum(axis=1)
    probs = counts / (counts.sum(-1, keepdims=True) + 1e-12)
    h, kl = entropy_kl_nonzero(probs, prior, n_modes)
    sr = successes.mean()
    return {"success_rate": sr, "entropy": h, "kl": kl, "score": sr - kl}


# stacking prefix encodings (stacking_sim.py:43-45):
#   1-box: r=0 g=1 b=2;  2-box & 3-box share the table
#   rg=0 rb=1 gr=2 gb=3 br=4 bg=5 (the third box is determined by the first two)
def stacking_prefix_codes(order):
    """order [..., 3] box-index arrival order (0=r,1=g,2=b; -1 unfilled) ->
    (code1 [..],  code2 [..]) with -1 where the prefix is unfilled."""
    first, second = order[..., 0], order[..., 1]
    code1 = first
    shifted = second - (second > first).astype(second.dtype)
    code2 = jnp.where((first >= 0) & (second >= 0), first * 2 + shifted, -1)
    return code1, code2


def stacking_score(order, mode_len, successes, successes_1, successes_2,
                   prior_1, prior_2, prior_3):
    """order [C,T,3], mode_len [C,T]; successes* [C,T].
    Per-prefix entropy/KL vs the demo priors; score = SR1 + SR2 + SR3
    (stacking_sim.py:227-257)."""
    code1, code2 = stacking_prefix_codes(order)
    code3 = code2  # 3-box encoding equals the 2-box code (stacking_sim.py:44-45)

    def cal(codes, succ, prior, n):
        probs = mode_probs_per_context(jnp.maximum(codes, 0), succ
                                       * (codes >= 0), n)
        return entropy_kl_nonzero(probs, prior, n)

    h1, kl1 = cal(code1, successes_1, prior_1, 3)
    h2, kl2 = cal(code2, successes_2, prior_2, 6)
    h3, kl3 = cal(code3, successes, prior_3, 6)
    sr1 = successes_1.mean()
    sr2 = successes_2.mean()
    sr = successes.mean()
    return {"success_rate": sr, "success_rate_1": sr1, "success_rate_2": sr2,
            "entropy_1": h1, "kl_1": kl1, "entropy_2": h2, "kl_2": kl2,
            "entropy_3": h3, "kl_3": kl3, "score": sr1 + sr2 + sr}


def inserting_score(successes, modes):
    """successes/modes [C, T]; modes are the reference ids 1..6 (0 while
    incomplete, gate_insertion.py:236-241). The reference ships no
    simulation/inserting_sim.py, so the composite follows the pushing
    convention: per-context entropy over the 6 orders, score 0.5*(SR + H)."""
    sr = successes.mean()
    probs = mode_probs_per_context(jnp.maximum(modes - 1, 0),
                                   successes * (modes > 0), 6)
    h = entropy(probs, 6)
    return {"success_rate": sr, "entropy": h, "score": 0.5 * (sr + h)}


def kl_to_prior(mode_probs, prior):
    """KL(p || prior) averaged over contexts (sorting_sim.py:192-218)."""
    p = mode_probs
    return (p * (jnp.log(p + 1e-12) - jnp.log(prior + 1e-12))).sum(-1).mean()
