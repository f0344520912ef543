"""Pallas patchify-as-matmul kernel (ops/pallas/patch_embed.py) —
interpret-mode parity vs the XLA conv, VJP exactness, and the eva_vit
routing gate."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from toc3d_tpu.layers import conv2d, init_conv
from toc3d_tpu.ops.pallas import patch_embed as pe
from toc3d_tpu.ops.pallas.patch_embed import patchify_matmul


@pytest.mark.parametrize("b,h,w,ps,c", [
    (2, 64, 128, 16, 32),    # tiny-config shape (w not sublane-aligned)
    (1, 80, 160, 16, 64),    # h with rows=5 strips
    (1, 32, 32, 16, 48),
])
def test_patchify_matches_conv(b, h, w, ps, c):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b, h, w, 3).astype(np.float32))
    wgt = jnp.asarray(rng.randn(ps, ps, 3, c).astype(np.float32) * 0.05)
    bias = jnp.asarray(rng.randn(c).astype(np.float32))
    out = patchify_matmul(x, wgt, bias, ps, interpret=True)
    ref = conv2d({"w": wgt, "b": bias}, x, stride=ps, padding="VALID")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


def test_patch_embed_routing_and_vjp():
    """eva_vit.patch_embed routes through the kernel when forced on CPU and
    its custom VJP returns the conv path's exact gradients."""
    from toc3d_tpu.models.eva_vit import patch_embed, _patch_embed_conv
    rng = np.random.RandomState(1)
    ps, c = 16, 32
    p = init_conv(jax.random.PRNGKey(0), ps, ps, 3, c)
    x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    cot = jnp.asarray(rng.randn(1, 4, 4, c).astype(np.float32))

    ref = _patch_embed_conv(p, x, ps)
    pe.FORCE_FUSED_ON_CPU = True
    try:
        out = patch_embed(p, x, ps)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-4)
        loss = lambda f: (lambda pp, xx: jnp.vdot(f(pp, xx, ps), cot))
        g_fused = jax.grad(loss(patch_embed), argnums=(0, 1))(p, x)
        g_conv = jax.grad(loss(_patch_embed_conv), argnums=(0, 1))(p, x)
        np.testing.assert_allclose(np.asarray(g_fused[0]["w"]),
                                   np.asarray(g_conv[0]["w"]), atol=1e-6)
        np.testing.assert_allclose(np.asarray(g_fused[1]),
                                   np.asarray(g_conv[1]), atol=1e-6)
    finally:
        pe.FORCE_FUSED_ON_CPU = False

    # gate off on CPU by default: conv path, identical results
    out_cpu = patch_embed(p, x, ps)
    np.testing.assert_allclose(np.asarray(out_cpu), np.asarray(ref))
