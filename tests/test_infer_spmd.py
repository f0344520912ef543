"""View-sharded SPMD inference (parallel/infer_spmd.py) must reproduce the
single-chip make_infer_fn: the backbone is per-view independent, so
sharding views across chips is a pure relayout — same numerics, streamed
memory state included. The ('data', 'view') product mesh additionally
shards the batch; per-sample independence makes that a relayout too."""
import numpy as np
import jax
import pytest
from jax.sharding import Mesh

from toc3d_tpu.models.detector import init_detector, init_state, make_infer_fn
from toc3d_tpu.parallel.infer_spmd import (make_spmd_infer_fn, product_mesh,
                                           view_mesh)

from test_models_smoke import tiny_detector, make_frame


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_detector()
    params = jax.jit(lambda k: init_detector(k, cfg))(jax.random.PRNGKey(0))
    return cfg, params


def test_view_mesh_divisor():
    # 8 virtual devices, 6 views -> largest divisor 6; 2 views -> 2
    assert view_mesh(6).devices.size == 6
    assert view_mesh(2).devices.size == 2
    assert view_mesh(6, n_devices=4).devices.size == 3
    assert view_mesh(6, n_devices=1).devices.size == 1


def test_product_mesh_shapes():
    assert dict(product_mesh(6).shape) == {"data": 1, "view": 6}
    assert dict(product_mesh(6, n_data=2).shape) == {"data": 2, "view": 3}
    assert dict(product_mesh(6, n_data=4).shape) == {"data": 4, "view": 2}
    assert dict(product_mesh(2, n_data=2).shape) == {"data": 2, "view": 2}


def _assert_streams_agree(cfg, params, spmd, b, n, frames=3):
    ref = make_infer_fn(cfg)
    s_spmd, s_ref = init_state(b, cfg), init_state(b, cfg)
    for i in range(frames):
        frame = make_frame(b=b, n=n, prev_exists=0.0 if i == 0 else 1.0,
                           seed=10 + i)
        s_spmd, d_spmd = spmd(params, s_spmd, frame)
        s_ref, d_ref = ref(params, s_ref, frame)
        for name, a, c in zip(d_spmd._fields, d_spmd, d_ref):
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(c, np.float32),
                rtol=1e-5, atol=1e-5, err_msg=f"frame {i} {name}")
        for name, a, c in zip(s_spmd.memory._fields, s_spmd.memory,
                              s_ref.memory):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(c), rtol=1e-5, atol=1e-5,
                err_msg=f"frame {i} memory.{name}")


@pytest.mark.parametrize("n_views,n_shards", [(2, 2), (6, 3), (6, 6)])
def test_streaming_parity_vs_single_chip(setup, n_views, n_shards):
    """3 streaming frames (first-frame + steady state), views sharded over
    the 'view' axis vs single-chip: outputs and memory must agree.
    Tolerance is near-exact — per-view programs are identical; only
    all-gather layout differs."""
    cfg, params = setup
    mesh = Mesh(np.asarray(jax.devices()[:n_shards]), ("view",))
    spmd = make_spmd_infer_fn(cfg, mesh)
    _assert_streams_agree(cfg, params, spmd, b=1, n=n_views)


@pytest.mark.parametrize("n_data,n_view", [(2, 2), (2, 3)])
def test_product_mesh_parity(setup, n_data, n_view):
    """('data', 'view') product mesh: batch AND views sharded, still equal
    to the single-chip stream (2x2 over 4 devices; 2x3 over 6)."""
    cfg, params = setup
    mesh = Mesh(np.asarray(jax.devices()[:n_data * n_view])
                .reshape(n_data, n_view), ("data", "view"))
    spmd = make_spmd_infer_fn(cfg, mesh)
    n_views = 6 if n_view == 3 else 2
    _assert_streams_agree(cfg, params, spmd, b=2, n=n_views)


def test_feats_sharded_head_replicated(setup):
    """The intended shardings actually materialize: decode output and
    memory replicated (one copy per chip) on the 1-D view mesh."""
    cfg, params = setup
    mesh = Mesh(np.asarray(jax.devices()[:2]), ("view",))
    spmd = make_spmd_infer_fn(cfg, mesh)
    frame = make_frame(b=1, n=2, prev_exists=0.0, seed=99)
    state, det = spmd(params, init_state(1, cfg), frame)
    assert det.scores.sharding.is_fully_replicated
    assert state.memory.embedding.sharding.is_fully_replicated


def test_product_mesh_output_batch_sharded(setup):
    """On the product mesh the decode output stays batch-sharded over
    'data' (no gratuitous gather of per-sample results)."""
    cfg, params = setup
    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(2, 2),
                ("data", "view"))
    spmd = make_spmd_infer_fn(cfg, mesh)
    frame = make_frame(b=2, n=2, prev_exists=0.0, seed=5)
    state, det = spmd(params, init_state(2, cfg), frame)
    assert not det.scores.sharding.is_fully_replicated
    assert np.isfinite(np.asarray(det.bboxes)).all()


def test_precast_cache_not_keyed_on_recycled_id(setup):
    """Swapping in a NEW params pytree must re-run precast even if Python
    recycles the old tree's id() — the cache is keyed on leaf identity.
    Regression test for the id(params) stale-weights hazard."""
    cfg, _ = setup
    ref = make_infer_fn(cfg)
    frame = make_frame(b=1, n=2, prev_exists=0.0, seed=0)

    def fresh(seed):
        return jax.jit(lambda k: init_detector(k, cfg))(
            jax.random.PRNGKey(seed))

    p1 = fresh(0)
    _, d1 = ref(p1, init_state(1, cfg), frame)
    del p1  # old tree GC'd: a new dict may land on the same id
    for seed in (1, 2, 3):
        p2 = fresh(seed)
        _, d2 = ref(p2, init_state(1, cfg), frame)
        if not np.allclose(np.asarray(d1.scores), np.asarray(d2.scores)):
            return  # new params were actually used
        del p2
    raise AssertionError("new params never changed the output — precast "
                         "cache served stale weights")


def test_gumbel_rejected(setup):
    from dataclasses import replace
    cfg, _ = setup
    cfg = replace(cfg, backbone=replace(cfg.backbone, eval_mask="gumbel"))
    mesh = Mesh(np.asarray(jax.devices()[:2]), ("view",))
    with pytest.raises(ValueError, match="single-chip"):
        make_spmd_infer_fn(cfg, mesh)
