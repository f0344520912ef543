"""Alternative model components: VoVNetCP backbone, ViTSimpleFPN neck."""
import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from toc3d_tpu.models.vovnet import (VoVNetConfig, init_vovnet,
                                     vovnet_forward, _maxpool_ceil, bn)
from toc3d_tpu.models.vit_simple_fpn import (ViTSimpleFPNConfig,
                                             init_vit_simple_fpn,
                                             vit_simple_fpn_forward)


def test_vovnet99_shapes():
    cfg = VoVNetConfig("V-99-eSE", out_features=("stage4", "stage5"))
    params = jax.jit(lambda k: init_vovnet(k, cfg))(jax.random.PRNGKey(0))
    x = jnp.ones((1, 64, 96, 3))
    outs = jax.jit(lambda p, x: vovnet_forward(p, x, cfg))(params, x)
    assert len(outs) == 2
    assert outs[0].shape == (1, 4, 6, 768)    # stage4: stride 16
    assert outs[1].shape == (1, 2, 3, 1024)   # stage5: stride 32
    assert np.isfinite(np.asarray(outs[1])).all()


def test_maxpool_ceil_matches_torch():
    rng = np.random.RandomState(0)
    for h, w in [(7, 9), (8, 8), (13, 5)]:
        x = rng.randn(1, h, w, 4).astype(np.float32)
        ours = np.asarray(_maxpool_ceil(jnp.asarray(x)))
        ref = F.max_pool2d(torch.from_numpy(x).permute(0, 3, 1, 2), 3, 2,
                           ceil_mode=True).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_frozen_bn_matches_torch():
    rng = np.random.RandomState(1)
    c = 8
    p = {"scale": jnp.asarray(rng.rand(c).astype(np.float32) + 0.5),
         "bias": jnp.asarray(rng.randn(c).astype(np.float32)),
         "mean": jnp.asarray(rng.randn(c).astype(np.float32)),
         "var": jnp.asarray(rng.rand(c).astype(np.float32) + 0.1)}
    x = rng.randn(2, 4, 4, c).astype(np.float32)
    ours = np.asarray(bn(p, jnp.asarray(x)))
    tbn = torch.nn.BatchNorm2d(c).eval()
    tbn.weight.data = torch.from_numpy(np.asarray(p["scale"]))
    tbn.bias.data = torch.from_numpy(np.asarray(p["bias"]))
    tbn.running_mean = torch.from_numpy(np.asarray(p["mean"]))
    tbn.running_var = torch.from_numpy(np.asarray(p["var"]))
    ref = tbn(torch.from_numpy(x).permute(0, 3, 1, 2)).detach()
    np.testing.assert_allclose(ours, ref.permute(0, 2, 3, 1).numpy(),
                               atol=1e-5)


def test_vit_simple_fpn_shapes():
    cfg = ViTSimpleFPNConfig(in_channels=64, out_channels=32,
                             scale_factors=(2.0, 1.0, 0.5), num_outs=4)
    params = jax.jit(lambda k: init_vit_simple_fpn(k, cfg))(
        jax.random.PRNGKey(0))
    x = jnp.ones((2, 8, 12, 64))
    outs = jax.jit(lambda p, x: vit_simple_fpn_forward(p, x, cfg))(params, x)
    assert [o.shape for o in outs] == [(2, 16, 24, 32), (2, 8, 12, 32),
                                       (2, 4, 6, 32), (2, 2, 3, 32)]
