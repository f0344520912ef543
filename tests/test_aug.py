"""GridMask aug + multi-replica sampler coverage."""
import numpy as np
import jax
import jax.numpy as jnp

from toc3d_tpu.models.grid_mask import grid_mask
from toc3d_tpu.data.sampler import InfiniteGroupEachSampleInBatchSampler


def test_grid_mask_structure():
    x = jnp.ones((2, 64, 64, 3))
    # find a key where the mask applies (prob 0.7)
    for seed in range(10):
        out = np.asarray(grid_mask(jax.random.PRNGKey(seed), x, prob=1.0))
        masked = out[0, :, :, 0]
        frac = masked.mean()
        # mode=1 keeps the union of row/col stripes: between ~40% and ~95%
        assert 0.3 <= frac <= 0.98, (seed, frac)
        # zeros appear in full rectangular cells (rows AND cols stripes off)
        zero_rows = (masked == 0).all(axis=1)
        assert not zero_rows.all()
        # mask identical across batch/channels (one grid per call)
        np.testing.assert_array_equal(out[0, :, :, 0] == 0,
                                      out[1, :, :, 2] == 0)


def test_grid_mask_prob_zero_identity():
    x = jnp.asarray(np.random.RandomState(0).randn(1, 32, 32, 3)
                    .astype(np.float32))
    out = grid_mask(jax.random.PRNGKey(0), x, prob=0.0)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))


def test_sampler_multi_replica_lanes_disjoint_groups():
    flags = np.repeat(np.arange(8), 5)   # 8 groups of 5
    samplers = [InfiniteGroupEachSampleInBatchSampler(
        flags, batch_size=2, num_replicas=2, rank=r, seed=0)
        for r in range(2)]
    iters = [iter(s) for s in samplers]
    first = [next(it) for it in iters]
    # first batch: 4 global lanes must start on 4 DIFFERENT groups
    groups = {flags[i] for batch in first for i in batch}
    assert len(groups) == 4, groups
