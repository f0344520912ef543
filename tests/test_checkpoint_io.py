"""Orbax save/load round trip for detector params."""
import numpy as np
import jax

from toc3d_tpu.configs import get_config
from toc3d_tpu.models.detector import init_detector
from toc3d_tpu.runtime.checkpoint import save_params, load_params


def test_orbax_roundtrip(tmp_path):
    cfg = get_config("tiny")
    params = jax.jit(lambda k: init_detector(k, cfg))(jax.random.PRNGKey(0))
    params = jax.device_get(params)
    path = str(tmp_path / "ckpt")
    save_params(params, path)
    like = jax.tree_util.tree_map(np.asarray, params)
    restored = load_params(path, like)
    flat1 = jax.tree_util.tree_leaves_with_path(params)
    flat2 = {jax.tree_util.keystr(k): v
             for k, v in jax.tree_util.tree_leaves_with_path(restored)}
    assert len(flat1) == len(flat2)
    for k, v in flat1:
        np.testing.assert_array_equal(np.asarray(v),
                                      np.asarray(flat2[jax.tree_util.keystr(k)]))
