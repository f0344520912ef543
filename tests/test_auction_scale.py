"""Auction-matcher fidelity at production scale (VERDICT round-1 item 5).

The auction solver (core/auction.py) is the DEFAULT on TPU (axon lacks
pure_callback), so training-on-TPU correctness hinges on it matching the
exact Hungarian solution on REALISTIC cost tensors: Q=900 queries,
G in {8, 32, 96} GTs, focal-classification + weighted-L1 costs shaped like
a mid-training model (a few competitive queries per GT, background
elsewhere), 4-sample batches.

Asserts per-slot agreement >= 99.9% AND total matched-cost suboptimality
< 1e-4 relative on every sample (the documented auction bound is
P*spread/1000; these fixtures verify it empirically at scale).
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from toc3d_tpu.core.assigner import (_lsa_host, focal_cls_cost, l1_cost,
                                     BIG_COST)
from toc3d_tpu.core.auction import hungarian_match_auction


def realistic_cost(rng, q, g, num_classes=10):
    """Focal + L1 cost as a mid-training model would produce: every GT has
    2-4 near-duplicate competitive queries (the regime where greedy fails
    and exactness matters), the rest is background."""
    logits = rng.randn(q, num_classes).astype(np.float32) * 0.5 - 4.0
    boxes = rng.randn(q, 10).astype(np.float32)
    gt_labels = rng.randint(0, num_classes, (g,))
    gt_codes = rng.randn(g, 10).astype(np.float32)
    for j in range(g):
        for _ in range(rng.randint(2, 5)):
            i = rng.randint(0, q)
            logits[i, gt_labels[j]] = 2.0 + rng.randn() * 0.5
            boxes[i] = gt_codes[j] + rng.randn(10).astype(np.float32) * 0.05
    cls_c = np.asarray(focal_cls_cost(jnp.asarray(logits),
                                      jnp.asarray(gt_labels), weight=2.0))
    reg_c = np.asarray(l1_cost(jnp.asarray(boxes) * 0.5,
                               jnp.asarray(gt_codes) * 0.5, 0.25))
    return (cls_c + reg_c).astype(np.float32)


def matched_cost(cost, matched, n_valid):
    total = 0.0
    for j in range(n_valid):
        assert matched[j] >= 0
        total += cost[matched[j], j]
    return total


@pytest.mark.parametrize("g", [8, 32, 96])
def test_auction_matches_exact_lap_at_scale(g):
    rng = np.random.RandomState(g)
    b, q, gpad = 4, 900, 96
    costs = np.full((b, q, gpad), BIG_COST, np.float32)
    n_valid = np.full((b,), g, np.int32)
    for i in range(b):
        costs[i, :, :g] = realistic_cost(rng, q, g)

    exact = _lsa_host(costs, n_valid)                       # (B, G)
    auct = np.asarray(hungarian_match_auction(
        jnp.asarray(costs), jnp.asarray(n_valid)))

    agree, total = 0, 0
    for i in range(b):
        agree += int((auct[i, :g] == exact[i, :g]).sum())
        total += g
        # no duplicate assignments
        assert len(set(auct[i, :g].tolist())) == g
        c_exact = matched_cost(costs[i], exact[i], g)
        c_auct = matched_cost(costs[i], auct[i], g)
        rel = (c_auct - c_exact) / max(abs(c_exact), 1e-6)
        assert rel >= -1e-6          # exact LAP is optimal
        assert rel < 1e-4, (i, rel)  # documented auction bound
    assert agree / total >= 0.999, f"agreement {agree}/{total}"


def test_auction_adversarial_near_ties():
    """Cost ties within eps are where auctions drift: two GTs both closest
    to the same query with a second-best 1e-3 worse. The assignment must
    still be feasible and within the suboptimality bound."""
    rng = np.random.RandomState(0)
    q, g = 900, 32
    cost = rng.rand(q, g).astype(np.float32) * 10
    # plant near-ties: GT pairs share a preferred query
    for j in range(0, g, 2):
        i = rng.randint(0, q)
        cost[i, j] = 0.0
        cost[i, j + 1] = 1e-3
        cost[(i + 1) % q, j + 1] = 2e-3
    costs = cost[None]
    nv = np.array([g], np.int32)
    exact = _lsa_host(costs, nv)[0]
    auct = np.asarray(hungarian_match_auction(
        jnp.asarray(costs), jnp.asarray(nv)))[0]
    assert len(set(auct.tolist())) == g
    c_exact = matched_cost(cost, exact, g)
    c_auct = matched_cost(cost, auct, g)
    assert c_auct - c_exact < 1e-3 + 1e-4 * abs(c_exact)
