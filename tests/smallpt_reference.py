"""Float64 numpy reference implementation of the SmallPT estimator.

Serves as the CPU ground truth for image-parity testing of the JAX
wavefront integrator (SURVEY.md §7.2 milestone 1 acceptance): same scene,
same LCG/seeding, same estimator (including the glass Fresnel-RR-at-all-
depths deviation documented in bifrost3d_tpu/integrator/smallpt.py), but
written against numpy in double precision with the reference's original
unstable intersection math — so agreement validates both the float32
numerics and the wavefront masking logic.
"""

from __future__ import annotations

import numpy as np

_SPHERES = [
    # radius, position, emission, color, bsdf (0 diffuse, 1 mirror, 2 glass)
    (1e5, (1e5 + 1, 40.8, 81.6), (0, 0, 0), (0.75, 0.25, 0.25), 0),
    (1e5, (-1e5 + 99, 40.8, 81.6), (0, 0, 0), (0.25, 0.25, 0.75), 0),
    (1e5, (50, 40.8, 1e5), (0, 0, 0), (0.75, 0.75, 0.75), 0),
    (1e5, (50, 40.8, -1e5 + 170), (0, 0, 0), (0, 0, 0), 0),
    (1e5, (50, 1e5, 81.6), (0, 0, 0), (0.75, 0.75, 0.75), 0),
    (1e5, (50, -1e5 + 81.6, 81.6), (0, 0, 0), (0.75, 0.75, 0.75), 0),
    (16.5, (27, 16.5, 47), (0, 0, 0), (0.999, 0.999, 0.999), 1),
    (16.5, (73, 16.5, 78), (0, 0, 0), (0.999, 0.999, 0.999), 2),
    (600.0, (50, 681.6 - 0.27, 81.6), (12, 12, 12), (0, 0, 0), 0),
]

POS = np.asarray([s[1] for s in _SPHERES])
RAD = np.asarray([s[0] for s in _SPHERES])
EMI = np.asarray([s[2] for s in _SPHERES])
COL = np.asarray([s[3] for s in _SPHERES])
BSDF = np.asarray([s[4] for s in _SPHERES])

_M = np.uint32(1664525)
_C = np.uint32(1013904223)


def lcg(state):
    state = (np.uint64(1664525) * state.astype(np.uint64) + np.uint64(1013904223)
             ).astype(np.uint32)
    return state, state.astype(np.float64) / 4294967296.0


def jenkins(x):
    x = x.astype(np.uint64)
    mask = np.uint64(0xFFFFFFFF)
    x = (x + (x << np.uint64(10))) & mask
    x ^= x >> np.uint64(6)
    x = (x + (x << np.uint64(3))) & mask
    x ^= x >> np.uint64(11)
    x = (x + (x << np.uint64(15))) & mask
    return x.astype(np.uint32)


def reverse_bits32(x):
    x = x.astype(np.uint32)
    x = ((x & np.uint32(0x55555555)) << np.uint32(1)) | ((x >> np.uint32(1)) & np.uint32(0x55555555))
    x = ((x & np.uint32(0x33333333)) << np.uint32(2)) | ((x >> np.uint32(2)) & np.uint32(0x33333333))
    x = ((x & np.uint32(0x0F0F0F0F)) << np.uint32(4)) | ((x >> np.uint32(4)) & np.uint32(0x0F0F0F0F))
    x = ((x & np.uint32(0x00FF00FF)) << np.uint32(8)) | ((x >> np.uint32(8)) & np.uint32(0x00FF00FF))
    return ((x << np.uint32(16)) | (x >> np.uint32(16))).astype(np.uint32)


def intersect(o, d):
    """Reference-style double intersection: t = b - sqrt(b^2 - |op|^2 + r^2)."""
    op = POS[None, :, :] - o[:, None, :]
    b = np.sum(op * d[:, None, :], axis=-1)
    det = b * b - np.sum(op * op, axis=-1) + RAD * RAD
    sqrt_det = np.sqrt(np.maximum(det, 0))
    eps = 1e-4
    t_near = b - sqrt_det
    t_far = b + sqrt_det
    t = np.where(t_near > eps, t_near, np.where(t_far > eps, t_far, np.inf))
    t = np.where(det >= 0, t, np.inf)
    tm = t.min(axis=1)
    idx = t.argmin(axis=1)
    return tm, idx, np.isfinite(tm)


def _normalize(v):
    return v / np.linalg.norm(v, axis=-1, keepdims=True)


def render(width, height, accumulations, max_depth=20):
    """Progressive render → [height, width, 3], row 0 = bottom."""
    buf = np.zeros((height * width, 3))
    for acc in range(1, accumulations + 1):
        buf += (render_frame(width, height, acc, max_depth) - buf) / acc
    return buf.reshape(height, width, 3)


def render_frame(width, height, acc, max_depth=20):
    cam_o = np.asarray([50.0, 52.0, 295.6])
    cam_d = _normalize(np.asarray([0.0, -0.042612, -1.0]))
    cx = np.asarray([width * 0.5135 / height, 0, 0])
    cy = _normalize(np.cross(cx, cam_d)) * 0.5135

    xs, ys = np.meshgrid(np.arange(width), np.arange(height))
    xs, ys = xs.ravel(), ys.ravel()
    sx, sy = acc % 2, (acc >> 1) % 2
    index = ((ys * 2 + sy) * (width * 2) + xs * 2 + sx).astype(np.uint32)
    rng = jenkins(index) ^ reverse_bits32(np.uint32(acc))

    rng, u1 = lcg(rng)
    rng, u2 = lcg(rng)
    r1, r2 = 2 * u1, 2 * u2
    dx = np.where(r1 < 1, np.sqrt(r1) - 1, 1 - np.sqrt(np.maximum(2 - r1, 0)))
    dy = np.where(r2 < 1, np.sqrt(r2) - 1, 1 - np.sqrt(np.maximum(2 - r2, 0)))
    d = (cx[None] * (((sx + 0.5 + dx) / 2 + xs) / width - 0.5)[:, None]
         + cy[None] * (((sy + 0.5 + dy) / 2 + ys) / height - 0.5)[:, None]
         + cam_d[None])
    o = cam_o[None] + d * 140.0
    d = _normalize(d)

    n = width * height
    thr = np.ones((n, 3))
    rad = np.zeros((n, 3))
    live = np.ones(n, bool)

    for depth in range(max_depth):
        t, idx, hit = intersect(o, d)
        live = live & hit
        idx = np.where(live, idx, 0)
        rad += np.where(live[:, None], thr * EMI[idx], 0)

        pos = o + d * np.where(np.isfinite(t), t, 0)[:, None]
        norm = _normalize(pos - POS[idx])
        ndd = np.sum(norm * d, axis=-1)
        nl = np.where(ndd[:, None] < 0, norm, -norm)
        f = COL[idx].copy()
        max_refl = f.max(axis=1)

        if depth + 1 > 5:
            rng_n, u = lcg(rng)
            rng = np.where(live, rng_n, rng)
            survive = u < max_refl
            f = f / np.maximum(max_refl, 1e-12)[:, None]
            live = live & survive

        bs = BSDF[idx]
        is_dif = live & (bs == 0)
        is_gls = live & (bs == 2)

        # Diffuse.
        rng1, u1 = lcg(rng)
        rng2, u2 = lcg(rng1)
        r1 = 2 * np.pi * u1
        r2 = u2
        r2s = np.sqrt(r2)
        w = nl
        up = np.where(np.abs(w[:, 0:1]) > 0.1, [0.0, 1.0, 0.0], [1.0, 0.0, 0.0])
        u_ax = _normalize(np.cross(up, w))
        v_ax = np.cross(w, u_ax)
        dir_dif = _normalize(u_ax * (np.cos(r1) * r2s)[:, None]
                             + v_ax * (np.sin(r1) * r2s)[:, None]
                             + w * np.sqrt(np.maximum(1 - r2, 0))[:, None])

        # Mirror.
        dir_mir = d - nl * 2 * np.sum(nl * d, axis=-1)[:, None]

        # Glass (Fresnel RR at every depth — matches the JAX estimator).
        refl = d - norm * 2 * np.sum(norm * d, axis=-1)[:, None]
        into = np.sum(norm * nl, axis=-1) > 0
        nnt = np.where(into, 1.0 / 1.5, 1.5)
        ddn = np.sum(d * nl, axis=-1)
        cos2t = 1 - nnt * nnt * (1 - ddn * ddn)
        tir = cos2t < 0
        tdir = _normalize(
            d * nnt[:, None] - norm * (np.where(into, 1.0, -1.0)
                                       * (ddn * nnt + np.sqrt(np.maximum(cos2t, 0))))[:, None])
        r0 = ((1.5 - 1) / (1.5 + 1)) ** 2
        c = 1 - np.where(into, -ddn, np.sum(tdir * norm, axis=-1))
        re = r0 + (1 - r0) * c ** 5
        p = 0.25 + 0.5 * re
        rng_g, ug = lcg(np.where(is_dif, rng2, rng))
        pick_refl = ug < p
        dir_gls = np.where(tir[:, None], refl,
                           np.where(pick_refl[:, None], refl, tdir))
        w_gls = np.where(tir, 1.0, np.where(pick_refl, re / p, (1 - re) / (1 - p)))

        rng = np.where(is_dif, rng2, np.where(is_gls & ~tir, rng_g, rng))
        nd = np.where(is_dif[:, None], dir_dif,
                      np.where(is_gls[:, None], dir_gls, dir_mir))
        wgt = np.where(is_gls, w_gls, 1.0)
        thr = np.where(live[:, None], thr * f * wgt[:, None], thr)
        live = live & (thr.max(axis=1) > 0)
        o, d = pos, nd

    return rad
