"""End-to-end grasping lock-in: the scripted stacking expert picks, carries
and stacks all three boxes under FULL dynamics.

This chain broke three separate ways in earlier rounds (energy-pumping
asymmetric mass-matrix inverse, diverging APGD step on two-finger squeezes,
virtual-vs-physical phase gating in the expert); any regression in the
contact solver, finger force law, or joint-PD tracking shows up here as a
dropped or ejected box."""
import itertools

import numpy as np
import jax
import jax.numpy as jnp
import pytest


@pytest.mark.slow
def test_stacking_expert_grasps_and_stacks():
    from d3il_tpu.data import experts_jax as ex
    from d3il_tpu.envs import stacking

    params = stacking.StackingParams(kinematic=False)
    n = 4
    perms = np.array(list(itertools.permutations(range(3))), np.int32)
    orders = perms[np.arange(n) % 6]
    keys = jax.random.split(jax.random.PRNGKey(0), n)
    ctxs = jax.vmap(stacking.sample_context)(keys)
    init, chunk = ex.make_stacking_runner(params)
    init_v = jax.jit(jax.vmap(init))
    chunk_v = jax.jit(jax.vmap(chunk))
    ikeys = jax.random.split(jax.random.PRNGKey(1000), n)
    cw = (init_v(ctxs, ikeys), jnp.asarray(orders))
    cw, _, dones = ex.run_chunked(chunk_v, cw, params.max_steps)
    state = cw[0].env

    succ = np.asarray(state.success)
    assert np.isfinite(np.asarray(state.scene.free_pos)).all(), \
        "box state diverged (grasp ejection regression)"
    # full 3-box stacks; 8/8 observed at fix time — 3/4 leaves seed room
    assert succ.sum() >= 3, (succ, np.asarray(state.mode_len))
