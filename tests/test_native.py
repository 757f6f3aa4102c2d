"""Native A* router tests: parity with the Python implementation + speed sanity."""

import time

import numpy as np
import pytest

from rtvm_tpu.navigate import astar as A
from rtvm_tpu.navigate import native


@pytest.fixture(scope="module")
def built():
    if not native.available():
        pytest.skip("native toolchain unavailable")
    return True


def test_native_matches_python_reachability(built, rng):
    grid = rng.rand(60, 80) < 0.25
    grid[5, 5] = grid[50, 70] = False
    p_native = native.astar_native(grid, (5, 5), (50, 70))
    p_python = A.astar(grid, (5, 5), (50, 70), use_native=False)
    assert (p_native is None) == (p_python is None)
    if p_native:
        assert p_native[0] == (5, 5) and p_native[-1] == (50, 70)
        # both paths must be valid and near-equal cost
        def cost(p):
            return sum(
                1.41421356 if (abs(a[0] - b[0]) + abs(a[1] - b[1])) == 2 else 1.0
                for a, b in zip(p[:-1], p[1:])
            )
        for a, b in zip(p_native[:-1], p_native[1:]):
            assert max(abs(a[0] - b[0]), abs(a[1] - b[1])) == 1
            assert not grid[b]
        assert abs(cost(p_native) - cost(p_python)) < 1e-3


def test_native_blocked(built):
    grid = np.zeros((20, 20), bool)
    grid[10, :] = True
    assert native.astar_native(grid, (2, 2), (18, 18)) is None


def test_native_occupancy_downsample(built, rng):
    mask = (rng.rand(64, 64) < 0.4).astype(np.float32)
    gn = native.occupancy_downsample_native(mask, 4, 0.3)
    gp = A.occupancy_grid(mask, 4, 0.3)
    assert (gn == gp).all()


def test_native_speed_on_large_grid(built, rng):
    grid = rng.rand(500, 500) < 0.2
    grid[2, 2] = grid[497, 497] = False
    t0 = time.perf_counter()
    p = native.astar_native(grid, (2, 2), (497, 497))
    dt = time.perf_counter() - t0
    assert dt < 0.5  # python version takes multiple seconds on this size
