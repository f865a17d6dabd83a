"""Progressive multi-jittered blue-noise sample sequences.

Host-side (numpy) generator implementing the PMJ-with-blue-noise algorithm of
Christensen et al. 2018 ("Progressive Multi-Jittered Sample Sequences",
supplemental) — the behavioral counterpart of the reference's
``Math/RNG.cpp fill_progressive_multijittered_bluenoise_samples``. Used for
environment-light presampling pools, rho-table integration, and the
statistical BSDF property tests (tests model the reference's
``BSDFTestUtils.h:31`` usage).

This is deliberately *not* JAX: the construction is inherently serial
(each sample depends on all previous), runs once at scene-build time, and its
output is uploaded as a device constant.
"""

from __future__ import annotations

import os

import numpy as np

_FREE = -1

# The construction is O(n·candidates) python-loop work (~36 s for 16k
# samples) and fully deterministic, so sequences are cached on disk next to
# the XLA compilation cache. Opt out: BIFROST_NO_COMPILE_CACHE.
_DISK_CACHE_DIR = (
    None if os.environ.get("BIFROST_NO_COMPILE_CACHE")
    else os.path.join(os.path.expanduser("~"), ".cache", "bifrost3d_jax",
                      "pmj"))


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def pmj02_bn_samples(count: int, blue_noise_candidates: int = 8,
                     seed: int = 19349669) -> np.ndarray:
    """Generate ``count`` progressive multi-jittered 2D samples in [0,1)^2.

    Each prefix of length 4^k is stratified on the 2^k x 2^k grid and every
    prefix of length n occupies n distinct 1D strata in both x and y. Among
    ``blue_noise_candidates`` candidates the one farthest (toroidally) from
    its nearest neighbour is kept, giving the blue-noise character.

    Returns float32 array [count, 2].
    """
    cache_path = None
    if _DISK_CACHE_DIR is not None:
        cache_path = os.path.join(
            _DISK_CACHE_DIR,
            f"pmj02bn_{count}_{blue_noise_candidates}_{seed}.npy")
        if os.path.exists(cache_path):
            cached = np.load(cache_path)
            if cached.shape == (count, 2):
                return cached

    rng = np.random.default_rng(seed)
    samples = np.zeros((count, 2), np.float64)
    n_storage = _next_pow2(count)
    # Index of the sample occupying each 1D stratum, per axis.
    strata = np.full((2, n_storage), _FREE, np.int64)
    num = 0

    def mark_strata(prev_count: int) -> None:
        next_count = 2 * prev_count
        strata[:, :next_count] = _FREE
        idx = (next_count * samples[:prev_count]).astype(np.int64)
        strata[0, idx[:, 0]] = np.arange(prev_count)
        strata[1, idx[:, 1]] = np.arange(prev_count)

    def candidate_coord(axis: int, cell: int, half: int, grid: int,
                        next_count: int) -> float:
        # Rejection-sample a coordinate in the target subcell whose 1D
        # stratum at resolution next_count is still free.
        while True:
            c = (cell + 0.5 * (half + rng.random())) / grid
            if strata[axis, int(next_count * c)] == _FREE:
                return c

    def min_toroidal_dist2(pt: np.ndarray) -> float:
        if num == 0:
            return np.inf
        d = np.abs(samples[:num] - pt)
        d = np.minimum(d, 1.0 - d)  # repeating-pattern (toroidal) distance
        return float(np.min(np.sum(d * d, axis=1)))

    def place(old_pt: np.ndarray, i: int, j: int, xhalf: int, yhalf: int,
              grid: int, prev_count: int) -> None:
        nonlocal num
        next_count = 2 * prev_count
        best_pt, best_d = None, -1.0
        for _ in range(max(1, blue_noise_candidates)):
            pt = np.array([
                candidate_coord(0, i, xhalf, grid, next_count),
                candidate_coord(1, j, yhalf, grid, next_count)])
            d = min(float(np.sum((old_pt - pt) ** 2)), min_toroidal_dist2(pt))
            if d > best_d:
                best_d, best_pt = d, pt
        strata[0, int(next_count * best_pt[0])] = num
        strata[1, int(next_count * best_pt[1])] = num
        samples[num] = best_pt
        num += 1

    def subquadrant(pt: np.ndarray, grid: int):
        i, j = int(grid * pt[0]), int(grid * pt[1])
        xh = int(2 * (grid * pt[0] - i))
        yh = int(2 * (grid * pt[1] - j))
        return i, j, xh, yh

    def extend_even(prev_count: int) -> None:
        grid = int(round(np.sqrt(prev_count)))
        mark_strata(prev_count)
        for s in range(prev_count):
            if num >= count:
                return
            pt = samples[s]
            i, j, xh, yh = subquadrant(pt, grid)
            place(pt, i, j, 1 - xh, 1 - yh, grid, prev_count)

    def extend_odd(prev_count: int) -> None:
        grid = int(round(np.sqrt(prev_count / 2)))
        mark_strata(prev_count)
        # First half: pick one of the two remaining subquadrants at random.
        chosen = []
        for s in range(prev_count // 2):
            if num >= count:
                return
            pt = samples[s]
            i, j, xh, yh = subquadrant(pt, grid)
            if rng.random() > 0.5:
                xh = 1 - xh
            else:
                yh = 1 - yh
            chosen.append((xh, yh))
            place(pt, i, j, xh, yh, grid, prev_count)
        # Second half: fill the subquadrant diagonally opposite the one above.
        for s in range(prev_count // 2):
            if num >= count:
                return
            pt = samples[s + prev_count]
            i, j, xh, yh = subquadrant(pt, grid)
            place(pt, i, j, 1 - xh, 1 - yh, grid, prev_count)

    samples[0] = rng.random(2)
    num = 1
    current = 1
    while num < count:
        extend_even(current)
        if 2 * current < count:
            extend_odd(2 * current)
        current *= 4

    out = samples[:count].astype(np.float32)
    if cache_path is not None:
        try:
            os.makedirs(_DISK_CACHE_DIR, exist_ok=True)
            tmp = cache_path[:-4] + f".tmp{os.getpid()}.npy"
            np.save(tmp, out)
            os.replace(tmp, cache_path)   # atomic: safe under parallel tests
        except OSError:
            pass
    return out
