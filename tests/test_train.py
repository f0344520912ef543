"""Training-step tests: full loss assembly, gradient flow, streaming memory."""
import numpy as np
import jax
import jax.numpy as jnp

from toc3d_tpu.configs import get_config
from toc3d_tpu.models.detector import init_detector
from toc3d_tpu.runtime.train import (make_optimizer, init_train_state,
                                     make_train_step, make_lr_schedule)


def make_batch(rng, b, n, h, w, g3=4, g2=4):
    eye = np.tile(np.eye(4, dtype=np.float32), (b, n, 1, 1))
    intr = eye.copy()
    intr[..., 0, 0] = intr[..., 1, 1] = 1.2e3
    boxes = rng.randn(b, g3, 9).astype(np.float32)
    boxes[..., 3:6] = np.abs(boxes[..., 3:6]) + 1.0
    b2d = np.sort(np.abs(rng.rand(b, n, g2, 2, 2)).astype(np.float32) * 30,
                  axis=-2).reshape(b, n, g2, 4)
    return {
        "img": jnp.asarray(rng.randn(b, n, h, w, 3).astype(np.float32)),
        "intrinsics": jnp.asarray(intr),
        "img2lidar": jnp.asarray(eye),
        "timestamp": jnp.full((b,), 0.5, jnp.float32),
        "ego_pose": jnp.asarray(np.tile(np.eye(4, dtype=np.float32),
                                        (b, 1, 1))),
        "ego_pose_inv": jnp.asarray(np.tile(np.eye(4, dtype=np.float32),
                                            (b, 1, 1))),
        "prev_exists": jnp.zeros((b,), jnp.float32),
        "gt_bboxes_3d": jnp.asarray(boxes),
        "gt_labels_3d": jnp.asarray(rng.randint(0, 10, (b, g3))),
        "gt_valid_3d": jnp.asarray(np.ones((b, g3), bool)),
        "gt_bboxes_2d": jnp.asarray(b2d),
        "gt_labels_2d": jnp.asarray(rng.randint(0, 10, (b, n, g2))),
        "gt_centers_2d": jnp.asarray(rng.rand(b, n, g2, 2).astype(np.float32)
                                     * 30),
        "gt_valid_2d": jnp.asarray(np.ones((b, n, g2), bool)),
    }


def test_train_step_updates_params_and_memory():
    cfg = get_config("tiny")
    params = jax.jit(lambda k: init_detector(k, cfg))(jax.random.PRNGKey(0))
    tx = make_optimizer(params, total_iters=100)
    state = init_train_state(params, tx, 2, cfg)
    step = jax.jit(make_train_step(cfg, tx))

    rng = np.random.RandomState(0)
    batch = make_batch(rng, 2, 2, *cfg.pad_shape)
    state1, metrics = step(state, batch, jax.random.PRNGKey(1))
    total = float(metrics["total_loss"])
    assert np.isfinite(total) and total > 0
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    # all param groups updated (incl. backbone at lr x0.1)
    d_backbone = float(jnp.abs(
        state1.params["img_backbone"]["patch_embed"]["w"]
        - state.params["img_backbone"]["patch_embed"]["w"]).max())
    d_head = float(jnp.abs(
        state1.params["pts_bbox_head"]["reference_points"]
        - state.params["pts_bbox_head"]["reference_points"]).max())
    assert d_backbone > 0 and d_head > 0
    assert int(state1.step) == 1
    # memory bank written for streaming
    assert float(jnp.abs(state1.memory.embedding).sum()) > 0

    # second step with prev_exists=1 (streamed memory)
    batch2 = make_batch(rng, 2, 2, *cfg.pad_shape)
    batch2["prev_exists"] = jnp.ones((2,), jnp.float32)
    state2, metrics2 = step(state1, batch2, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics2["total_loss"]))
    # DN losses present
    assert "dn_loss_cls" in metrics2 and "semantic_loss" in metrics2


def test_lr_schedule_shape():
    s = make_lr_schedule(1e-4, warmup_iters=500, total_iters=10_000)
    assert abs(float(s(0)) - 1e-4 / 3) < 1e-9
    assert abs(float(s(500)) - 1e-4) < 1e-9
    assert float(s(10_000)) < 1.1e-7 * 1.1  # ~ min_lr_ratio * base
    assert float(s(250)) > float(s(0))


def test_optimizer_backbone_labels_cover_every_leaf():
    """Every img_backbone leaf must carry the 'backbone' (x0.1 LR) label and
    every other leaf 'rest' — a path-name typo in _is_backbone would
    silently train the backbone at full LR (ToC3D_fast.py:253-260)."""
    from toc3d_tpu.runtime.train import param_labels
    cfg = get_config("tiny")
    params = jax.jit(lambda k: init_detector(k, cfg))(jax.random.PRNGKey(0))
    labels = param_labels(params)
    flat, _ = jax.tree_util.tree_flatten_with_path(labels)
    assert flat, "no leaves"
    n_bb = 0
    for path, label in flat:
        top = getattr(path[0], "key", getattr(path[0], "name", None))
        want = "backbone" if top == "img_backbone" else "rest"
        assert label == want, (jax.tree_util.keystr(path), label)
        n_bb += label == "backbone"
    assert n_bb > 0 and n_bb < len(flat)


def test_skip_on_nonfinite_optimizer():
    """Norm-keyed skip transform: finite steps update, a NaN-grad step is
    a no-op (zero updates, untouched inner state, counter +1), and the
    next finite step proceeds normally."""
    import optax
    from toc3d_tpu.runtime.train import skip_on_nonfinite
    params = {"w": jnp.ones((4,)), "b": jnp.zeros((2,))}
    tx = skip_on_nonfinite(optax.chain(optax.clip_by_global_norm(1.0),
                                       optax.adamw(1e-2)))
    st = tx.init(params)
    g = {"w": jnp.full((4,), 0.5), "b": jnp.ones((2,))}
    u1, st1 = tx.update(g, st, params)
    assert int(st1.total_notfinite) == 0
    assert float(jnp.abs(u1["w"]).max()) > 0

    for bad in (jnp.nan, jnp.inf, -jnp.inf):
        gbad = {"w": jnp.array([bad, 0, 0, 0], jnp.float32),
                "b": jnp.ones((2,))}
        u2, st2 = tx.update(gbad, st1, params)
        assert int(st2.total_notfinite) == 1
        assert float(jnp.abs(u2["w"]).max()) == 0
        assert float(jnp.abs(u2["b"]).max()) == 0
        for a, b in zip(jax.tree_util.tree_leaves(st1.inner_state),
                        jax.tree_util.tree_leaves(st2.inner_state)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # the bad step left the inner state untouched, so the next finite step
    # must produce exactly what stepping from st1 would have
    u3, st3 = tx.update(g, st2, params)
    u3_ref, _ = tx.update(g, st1, params)
    assert int(st3.total_notfinite) == 1
    np.testing.assert_allclose(np.asarray(u3["w"]), np.asarray(u3_ref["w"]),
                               rtol=1e-6)


def test_optimizer_backbone_lr_mult_behavioral():
    """AdamW's first-step update magnitude ~= lr per element, so the
    backbone/rest update ratio must be ~backbone_lr_mult."""
    from toc3d_tpu.runtime.train import make_optimizer
    cfg = get_config("tiny")
    params = jax.jit(lambda k: init_detector(k, cfg))(jax.random.PRNGKey(0))
    tx = make_optimizer(params, base_lr=1e-4, backbone_lr_mult=0.1,
                        warmup_iters=0, total_iters=100_000)
    opt_state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, opt_state, params)
    u_bb = float(jnp.abs(
        updates["img_backbone"]["blocks"][0]["attn"]["q_proj"]["w"]).mean())
    u_head = float(jnp.abs(
        updates["pts_bbox_head"]["reference_points"]).mean())
    assert 0.05 < u_bb / u_head < 0.2, (u_bb, u_head)


def test_layer_decay_mults_per_depth():
    """Spot-check get_vit_lr_decay_rate multipliers through the exposed
    layer_decay_mults tree (eva_vit.py:574-591)."""
    from toc3d_tpu.runtime.train import layer_decay_mults
    cfg = get_config("tiny")
    params = jax.jit(lambda k: init_detector(k, cfg))(jax.random.PRNGKey(0))
    rate = 0.9
    mults = layer_decay_mults(params, rate)
    depth = len(params["img_backbone"]["blocks"])
    # patch_embed: layer_id 0 -> rate ** (depth + 1)
    assert np.isclose(mults["img_backbone"]["patch_embed"]["w"],
                      rate ** (depth + 1))
    # block i attn weights: layer_id i+1 -> rate ** (depth - i)
    for i in range(depth):
        got = mults["img_backbone"]["blocks"][i]["attn"]["q_proj"]["w"]
        assert np.isclose(got, rate ** (depth - i)), i
    # non-backbone leaves: no decay
    assert mults["pts_bbox_head"]["reference_points"] == 1.0


def test_train_step_multiframe():
    """make_train_step(multiframe=True): full update step over a T-axis
    batch (reference queue_length regime, petr3d.py:262-308) — finite
    loss, params move, memory streams out of the last frame."""
    cfg = get_config("tiny")
    params = jax.jit(lambda k: init_detector(k, cfg))(jax.random.PRNGKey(0))
    tx = make_optimizer(params, total_iters=100)
    state = init_train_state(params, tx, 1, cfg)
    step = jax.jit(make_train_step(cfg, tx, multiframe=True))

    rng = np.random.RandomState(0)
    frames = [make_batch(rng, 1, 2, *cfg.pad_shape) for _ in range(3)]
    batch = {k: jnp.stack([f[k] for f in frames], axis=1)
             for k in frames[0]}
    state1, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["total_loss"]))
    # losses keyed by frame index, only the last num_frame_losses frames
    assert any(k.startswith("frame_2_") for k in metrics)
    d = float(jnp.abs(
        state1.params["img_backbone"]["patch_embed"]["w"]
        - state.params["img_backbone"]["patch_embed"]["w"]).max())
    assert d > 0
    assert float(jnp.abs(state1.memory.embedding).sum()) > 0
