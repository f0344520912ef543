"""Native C++ LAP solver vs scipy optimality."""
import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

from toc3d_tpu.native import get_lap_lib, lap_batched


@pytest.fixture(scope="module")
def lib():
    l = get_lap_lib()
    if l is None:
        pytest.skip("g++ unavailable")
    return l


def test_lap_matches_scipy(lib):
    rng = np.random.RandomState(0)
    for trial in range(30):
        r = rng.randint(1, 30)
        c = rng.randint(r, 200)
        cost = (rng.randn(r, c) * rng.uniform(0.1, 50)).astype(np.float32)
        out = lap_batched(cost[None], np.array([r]))[0]
        assert (out >= 0).all()
        assert len(set(out.tolist())) == r
        rows, cols = linear_sum_assignment(cost)
        ours = cost[np.arange(r), out].sum()
        best = cost[rows, cols].sum()
        np.testing.assert_allclose(ours, best, rtol=1e-5, atol=1e-4)


def test_lap_batched_padding(lib):
    rng = np.random.RandomState(1)
    cost = rng.randn(3, 8, 40).astype(np.float32)
    nv = np.array([8, 3, 0])
    out = lap_batched(cost, nv)
    assert out.shape == (3, 8)
    assert (out[1, 3:] == -1).all() and (out[2] == -1).all()
    for i, n in enumerate(nv):
        matched = out[i, :n]
        assert (matched >= 0).all()
        assert len(set(matched.tolist())) == n


def test_host_matcher_uses_native():
    """assigner._lsa_host produces scipy-identical assignments."""
    from toc3d_tpu.core.assigner import _lsa_host
    rng = np.random.RandomState(2)
    b, q, g = 4, 50, 7
    cost = rng.randn(b, q, g).astype(np.float32) * 10
    nv = np.array([7, 7, 2, 0], np.int32)
    out = _lsa_host(cost, nv)
    for i in range(b):
        n = nv[i]
        assert (out[i, n:] == -1).all()
        if n == 0:
            continue
        rows, cols = linear_sum_assignment(cost[i, :, :n])
        best = cost[i][rows, cols].sum()
        ours = sum(cost[i, out[i, j], j] for j in range(n))
        np.testing.assert_allclose(ours, best, rtol=1e-5, atol=1e-4)
