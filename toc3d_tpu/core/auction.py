"""Device-native linear assignment: Bertsekas auction algorithm in pure JAX.

Why: the scipy Hungarian callback (core/assigner.py) cannot run on the axon
TPU backend (pure_callback unsupported) and serializes onto one device
under SPMD. The auction algorithm is data-parallel, fixed-shape, and
jit/vmap friendly; with eps-scaling it converges to an assignment within
n*eps of optimal (exactly optimal when eps < gap/n).

Persons = GT boxes (few), objects = queries (many); each round all
unassigned persons bid simultaneously (Jacobi), ownership is the single
source of truth, and assignments are derived from it.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

NEG = -1e9


def _auction_phase(benefit, valid, price, eps, max_iters):
    """Run auction rounds at one eps until all valid persons own an object
    (bounded by max_iters). Returns (price, owner)."""
    p, o = benefit.shape
    person_ids = jnp.arange(p, dtype=jnp.int32)

    def assigned_mask(owner):
        # person is assigned iff some object's owner == person
        onehot = owner[None, :] == person_ids[:, None]        # (P, O)
        return jnp.any(onehot, axis=1)

    def round_fn(state):
        price, owner = state
        assigned = assigned_mask(owner)
        bidding = valid & ~assigned                           # (P,)

        values = benefit - price[None, :]                     # (P, O)
        best_o = jnp.argmax(values, axis=1).astype(jnp.int32)
        best_v = jnp.max(values, axis=1)
        v2 = values.at[person_ids, best_o].set(NEG)
        second_v = jnp.max(v2, axis=1)
        bid = price[best_o] + (best_v - second_v) + eps
        bid = jnp.where(bidding, bid, NEG)

        obj_bid = jnp.full((o,), NEG, bid.dtype).at[best_o].max(bid)
        is_top = bidding & (bid >= obj_bid[best_o])
        winner = jnp.full((o,), p, jnp.int32).at[best_o].min(
            jnp.where(is_top, person_ids, p))
        got_bid = winner < p
        price = jnp.where(got_bid, obj_bid, price)
        owner = jnp.where(got_bid, winner, owner)
        return price, owner

    def cond(state):
        price, owner, it = state
        return (it < max_iters) & ~jnp.all(assigned_mask(owner) | ~valid)

    def body(state):
        price, owner, it = state
        price, owner = round_fn((price, owner))
        return price, owner, it + 1

    owner = jnp.full((o,), -1, jnp.int32)
    price, owner, _ = jax.lax.while_loop(
        cond, body, (price, owner, jnp.zeros((), jnp.int32)))
    return price, owner


@functools.partial(jax.jit, static_argnames=("max_iters", "eps_div"))
def auction_assign(cost, valid, max_iters: int = 16384,
                   eps_div: float = 20000.0):
    """cost: (P, O) with P <= O; valid: (P,) bool. Minimizes total cost.

    Returns assigned_obj (P,) int32 (-1 for invalid persons).

    Single cold phase at eps = spread/eps_div: suboptimality bound
    P*spread/eps_div. At eps_div=20000 the solution is empirically EXACT vs
    the host LAP on realistic (Q=900, G<=96) focal+L1 cost tensors
    (tests/test_auction_scale.py); the while_loop exits as soon as every
    valid person is assigned, so the high iteration cap costs nothing once
    converged. Warm-started multi-phase eps-scaling was tried TWICE (round 1
    and round 2) and converges far worse — deliberately absent.
    """
    p, o = cost.shape
    benefit = -cost.astype(jnp.float32)
    benefit = jnp.where(valid[:, None], benefit, NEG)
    spread = jnp.maximum(
        jnp.max(jnp.where(valid[:, None], jnp.abs(benefit), 0.0)), 1.0)

    price = jnp.zeros((o,), jnp.float32)
    price, owner = _auction_phase(benefit, valid, price, spread / eps_div,
                                  max_iters)

    person_ids = jnp.arange(p, dtype=jnp.int32)
    onehot = owner[None, :] == person_ids[:, None]            # (P, O)
    obj_idx = jnp.argmax(onehot, axis=1).astype(jnp.int32)
    has = jnp.any(onehot, axis=1)
    return jnp.where(valid & has, obj_idx, -1)


def hungarian_match_auction(cost, n_valid):
    """Drop-in for assigner.hungarian_match: cost (B, Q, G), n_valid (B,).

    Returns (B, G) matched query per gt (-1 for padded slots).
    """
    b, q, g = cost.shape
    valid = jnp.arange(g)[None, :] < n_valid[:, None]         # (B, G)
    cost_t = jax.lax.stop_gradient(jnp.swapaxes(cost, 1, 2))  # (B, G, Q)
    return jax.vmap(lambda c, v: auction_assign(c, v))(cost_t, valid)
