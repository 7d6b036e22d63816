"""Reference fixed-context / prior loading (eval/contexts.py).

The reference evaluates on shipped fixed context sets
(environments/dataset/data/*/test_contexts.pkl) and stacking demo priors
(mode_prob.pkl); these tests pin our loaders to those artifacts' shapes,
value ranges (the envs' context spaces) and normalization.
"""
import numpy as np
import jax
import jax.numpy as jnp

from d3il_tpu.eval import contexts, sims


def test_pushing_contexts_shapes_and_ranges():
    ctx = contexts.pushing_contexts()
    assert ctx is not None
    red, red_q, green, green_q = ctx
    assert red.shape == (60, 2) and red_q.shape == (60, 4)
    # context spaces (pushing.py:54-59)
    assert (red[:, 0] >= 0.4 - 1e-5).all() and (red[:, 0] <= 0.5 + 1e-5).all()
    assert (green[:, 0] >= 0.55 - 1e-5).all() and (green[:, 0] <= 0.65 + 1e-5).all()
    assert np.allclose(np.linalg.norm(red_q, axis=1), 1.0, atol=1e-5)


def test_aligning_contexts():
    box, box_q, tgt, tgt_q = contexts.aligning_contexts()
    assert box.shape == (60, 2) and tgt_q.shape == (60, 4)
    assert np.allclose(np.linalg.norm(box_q, axis=1), 1.0, atol=1e-5)


def test_stacking_contexts_and_priors():
    xy, quat = contexts.stacking_contexts()
    assert xy.shape == (100, 4, 2) and quat.shape == (100, 4, 4)
    p1, p2, p3 = contexts.stacking_mode_priors()
    assert np.isclose(p1.sum(), 1.0, atol=1e-3)
    assert np.isclose(p3.sum(), 1.0, atol=1e-3)
    # p1 = adjacent-pair sums of p3 (stacking_sim.py:58)
    assert np.allclose(p1, [p3[0] + p3[1], p3[2] + p3[3], p3[4] + p3[5]])
    # 2-box prior reuses the 3-box vector (stacking_sim.py:55-57)
    assert np.allclose(p2, p3)


def test_fixed_or_sampled_uses_reference_set():
    from d3il_tpu.envs import pushing
    ctxs = sims._fixed_or_sampled(contexts.pushing_contexts,
                                  pushing.sample_context, 30, True)
    ref = contexts.pushing_contexts()
    assert np.allclose(np.asarray(ctxs[0]), ref[0][:30])
    # tiling beyond the fixed set
    big = sims._fixed_or_sampled(contexts.pushing_contexts,
                                 pushing.sample_context, 70, True)
    assert np.allclose(np.asarray(big[0])[60:], ref[0][:10])
    # sampling fallback
    rnd = sims._fixed_or_sampled(lambda: None, pushing.sample_context, 5, True)
    assert np.asarray(rnd[0]).shape == (5, 2)


def test_reset_from_reference_context():
    """A fixed reference context must reset cleanly into the batched env."""
    from d3il_tpu.envs import pushing
    params = sims.pushing_params(kinematic=True)
    ctx = jax.tree_util.tree_map(
        lambda x: jnp.asarray(x[0]), contexts.pushing_contexts())
    state = jax.jit(lambda c: pushing.reset(params, c))(ctx)
    np.testing.assert_allclose(np.asarray(state.scene.free_pos[0, :2]),
                               np.asarray(ctx[0]), atol=0.02)


def test_mode_prior_from_demos_scalar(tmp_path):
    import pickle
    d = tmp_path / "task"
    (d / "all_data").mkdir(parents=True)
    for i, m in enumerate([3, 3, 5]):
        with open(d / "all_data" / f"e{i}.pkl", "wb") as f:
            pickle.dump({"mode": np.asarray(m)}, f)
    with open(d / "train_files.pkl", "wb") as f:
        pickle.dump([f"e{i}.pkl" for i in range(3)], f)
    keys, probs = contexts.mode_prior_from_demos(str(d))
    assert keys.tolist() == [3, 5]
    np.testing.assert_allclose(probs, [2 / 3, 1 / 3])


def test_mode_prior_from_demos_stacking_basic(tmp_path):
    import pickle
    d = tmp_path / "task"
    (d / "all_data").mkdir(parents=True)
    orders = [[0, 1, 2], [1, 0, 2], [0, 1, 2]]
    for i, m in enumerate(orders):
        with open(d / "all_data" / f"e{i}.pkl", "wb") as f:
            pickle.dump({"mode": m}, f)
    with open(d / "train_files.pkl", "wb") as f:
        pickle.dump([f"e{i}.pkl" for i in range(3)], f)
    p1, p2, p3 = contexts.mode_prior_from_demos(str(d))
    np.testing.assert_allclose(p1, [2 / 3, 1 / 3, 0])
    # rg code = 0, gr code = 2
    np.testing.assert_allclose(p2[[0, 2]], [2 / 3, 1 / 3])


def test_mode_prior_from_demos_stacking(tmp_path):
    """Hand-counted stacking arrival-order priors: p1/p2 over all prefixes,
    p3 over complete (length-3) stacks only, in the reference mode-table
    index order (stacking_sim.py:42-46: rg,rb,gr,gb,br,bg / rgb..bgr)."""
    import os
    import pickle

    demos = [
        [0, 1, 2],   # rgb -> code2 0
        [0, 1, 2],   # rgb
        [2, 1, 0],   # bgr -> code2 5
        [1, 2],      # gb prefix only (no 3-stack)
        [0],         # r only
    ]
    task = tmp_path / "stacking"
    (task / "all_data").mkdir(parents=True)
    files = []
    for i, m in enumerate(demos):
        fn = f"env_{i:03d}.pkl"
        with open(task / "all_data" / fn, "wb") as f:
            pickle.dump({"mode": m, "robot": {}}, f)
        files.append(fn)
    with open(task / "train_files.pkl", "wb") as f:
        pickle.dump(files, f)
    with open(task / "eval_files.pkl", "wb") as f:
        pickle.dump([], f)

    p1, p2, p3 = contexts.mode_prior_from_demos(str(task))
    # first boxes: r,r,b,g,r -> counts [3,1,1]
    assert np.allclose(p1, np.array([3, 1, 1]) / 5.0)
    # pairs: rg,rg,bg,gb -> code2 indices 0,0,5,3
    assert np.allclose(p2, np.array([2, 0, 0, 1, 0, 1]) / 4.0)
    # full stacks only: rgb,rgb,bgr -> indices 0,0,5
    assert np.allclose(p3, np.array([2, 0, 0, 0, 0, 1]) / 3.0)
