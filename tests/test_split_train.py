"""Two-program training split (runtime/train.make_split_train_step,
VERDICT r3 #3): the collect program precomputes per-site backbone outputs,
the differentiated program injects them (ops.pallas.vit_block.
make_injected_op) and linearizes through the XLA paths. On CPU the kernels
are gated off, so the collected outputs ARE the XLA values and the split
step must reproduce make_train_step's update exactly."""
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "tests")

from toc3d_tpu.configs import get_config
from toc3d_tpu.models.detector import init_detector
from toc3d_tpu.models.toc3d_vit import injectable_sites
from toc3d_tpu.runtime.train import (make_optimizer, init_train_state,
                                     make_train_step, make_split_train_step,
                                     collect_backbone_outs)


def _batch(b=1, n=2, h=64, w=128):
    sys.path.insert(0, "/root/repo")
    from bench import make_train_batch
    return make_train_batch(np.random.RandomState(0), b, n, h, w, g3=4, g2=4)


def test_split_step_matches_plain_step():
    cfg = get_config("tiny")
    params = jax.jit(lambda k: init_detector(k, cfg))(jax.random.PRNGKey(0))
    tx = make_optimizer(params, base_lr=1e-4, total_iters=10, warmup_iters=0)
    batch = _batch(h=cfg.pad_shape[0], w=cfg.pad_shape[1])
    rng = jax.random.PRNGKey(7)

    # independent buffer copies: both steps donate their state, and shared
    # leaves would be deleted under the other state's feet
    params2 = jax.tree_util.tree_map(jnp.array, params)
    s_plain = init_train_state(params, tx, 1, cfg)
    s_split = init_train_state(params2, tx, 1, cfg)
    plain = jax.jit(make_train_step(cfg, tx), donate_argnums=(0,))
    split = make_split_train_step(cfg, tx)

    for i in range(2):
        k = jax.random.fold_in(rng, i)
        s_plain, m_plain = plain(s_plain, batch, k)
        s_split, m_split = split(s_split, batch, k)

    np.testing.assert_allclose(float(m_split["total_loss"]),
                               float(m_plain["total_loss"]),
                               rtol=1e-5, atol=1e-5)
    leaves_p = jax.tree_util.tree_leaves(s_plain.params)
    leaves_s = jax.tree_util.tree_leaves(s_split.params)
    worst = max(float(jnp.max(jnp.abs(a - b)))
                for a, b in zip(leaves_p, leaves_s))
    assert worst < 1e-5, worst
    assert int(m_split.get("nonfinite_skips", 0)) == 0


def test_collect_marks_injectable_sites():
    cfg = get_config("tiny")
    params = jax.jit(lambda k: init_detector(k, cfg))(jax.random.PRNGKey(0))
    tx = make_optimizer(params, base_lr=1e-4, total_iters=10, warmup_iters=0)
    state = init_train_state(params, tx, 1, cfg)
    batch = _batch(h=cfg.pad_shape[0], w=cfg.pad_shape[1])
    outs = jax.jit(lambda p, mem, bt, k: collect_backbone_outs(
        p, cfg, mem, bt, k))(state.params, state.memory, batch,
                             jax.random.PRNGKey(3))
    ok = injectable_sites(cfg.backbone)
    assert len(outs["blocks"]) == cfg.backbone.depth
    for i, o in enumerate(outs["blocks"]):
        assert (o is not None) == ok[i], i
    assert outs["patch_embed"] is not None
    # tiny has drop_path_rate 0 -> every site injectable
    assert all(ok)
