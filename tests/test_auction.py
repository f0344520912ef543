"""Auction assigner vs scipy optimality on random assignment problems."""
import numpy as np
import jax
import jax.numpy as jnp
from scipy.optimize import linear_sum_assignment

from toc3d_tpu.core.auction import auction_assign, hungarian_match_auction


def optimal_cost(cost, assigned, valid):
    tot = 0.0
    used = set()
    for g in range(cost.shape[0]):
        if not valid[g]:
            continue
        q = int(assigned[g])
        assert q >= 0, "valid gt unassigned"
        assert q not in used, "duplicate assignment"
        used.add(q)
        tot += cost[g, q]
    return tot


def test_auction_matches_scipy_optimum():
    rng = np.random.RandomState(0)
    gaps = []
    for trial in range(20):
        p, o = rng.randint(2, 24), rng.randint(32, 128)
        cost = rng.randn(p, o).astype(np.float32) * rng.uniform(0.5, 20)
        valid = np.ones(p, bool)
        assigned = np.asarray(auction_assign(jnp.asarray(cost),
                                             jnp.asarray(valid)))
        ours = optimal_cost(cost, assigned, valid)
        rows, cols = linear_sum_assignment(cost)
        best = cost[rows, cols].sum()
        gaps.append(ours - best)
    gaps = np.asarray(gaps)
    # eps-scaled auction: near-optimal; most trials exactly optimal
    assert np.all(gaps >= -1e-4)
    assert np.median(gaps) < 1e-3, gaps
    assert np.max(gaps) < 0.1 * 20, gaps


def test_auction_batched_with_padding():
    rng = np.random.RandomState(1)
    b, q, g = 3, 40, 8
    cost = rng.randn(b, q, g).astype(np.float32) * 5
    n_valid = np.array([8, 3, 0])
    out = np.asarray(hungarian_match_auction(jnp.asarray(cost),
                                             jnp.asarray(n_valid)))
    assert out.shape == (b, g)
    for i in range(b):
        nv = n_valid[i]
        assert (out[i, nv:] == -1).all()
        matched = out[i, :nv]
        assert (matched >= 0).all()
        assert len(set(matched.tolist())) == nv  # no duplicates
    # quality vs scipy for the full-GT sample
    rows, cols = linear_sum_assignment(cost[0].T[:8])
    best = cost[0].T[:8][rows, cols].sum()
    ours = sum(cost[0, out[0, gi], gi] for gi in range(8))
    assert ours <= best + 0.5
