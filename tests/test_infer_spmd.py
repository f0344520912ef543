"""View-sharded SPMD inference (parallel/infer_spmd.py) must reproduce the
single-chip make_infer_fn: the backbone is per-view independent, so
sharding views across chips is a pure relayout — same numerics, streamed
memory state included."""
import numpy as np
import jax
import pytest
from jax.sharding import Mesh

from toc3d_tpu.models.detector import init_detector, init_state, make_infer_fn
from toc3d_tpu.parallel.infer_spmd import make_spmd_infer_fn, view_mesh

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


@pytest.mark.parametrize("n_shards", [2])
def test_streaming_parity_vs_single_chip(setup, n_shards):
    """3 streaming frames (first-frame + steady state), 2 views over
    2 chips vs single-chip: outputs and memory must agree. Tolerance is
    near-exact — per-view programs are identical; only all-gather layout
    differs."""
    cfg, params = setup
    mesh = Mesh(np.asarray(jax.devices()[:n_shards]), ("view",))
    spmd = make_spmd_infer_fn(cfg, mesh)
    ref = make_infer_fn(cfg)
    s_spmd, s_ref = init_state(1, cfg), init_state(1, cfg)
    for i in range(3):
        frame = make_frame(b=1, n=2, prev_exists=0.0 if i == 0 else 1.0,
                           seed=10 + i)
        s_spmd, d_spmd = spmd(params, s_spmd, frame)
        s_ref, d_ref = ref(params, s_ref, frame)
        for name, a, b in zip(d_spmd._fields, d_spmd, d_ref):
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                rtol=1e-5, atol=1e-5, err_msg=f"frame {i} {name}")
        for name, a, b in zip(s_spmd.memory._fields, s_spmd.memory,
                              s_ref.memory):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5,
                err_msg=f"frame {i} memory.{name}")


def test_feats_sharded_head_replicated(setup):
    """The intended shardings actually materialize: backbone output is
    view-sharded, decode output replicated (one copy per chip)."""
    cfg, params = setup
    mesh = Mesh(np.asarray(jax.devices()[:2]), ("view",))
    spmd = make_spmd_infer_fn(cfg, mesh)
    frame = make_frame(b=1, n=2, prev_exists=0.0, seed=99)
    state, det = spmd(params, init_state(1, cfg), frame)
    assert det.scores.sharding.is_fully_replicated
    assert state.memory.embedding.sharding.is_fully_replicated


def test_gumbel_rejected(setup):
    from dataclasses import replace
    cfg, _ = setup
    cfg = replace(cfg, backbone=replace(cfg.backbone, eval_mask="gumbel"))
    mesh = Mesh(np.asarray(jax.devices()[:2]), ("view",))
    with pytest.raises(ValueError, match="single-chip"):
        make_spmd_infer_fn(cfg, mesh)
