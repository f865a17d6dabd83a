"""Edge-sampled (boundary) geometry gradients for TRIANGLE MESHES.

Extends diff/edge_grad.py (analytic sphere silhouettes, SmallPT) to the
flagship mesh path: the derivative of an image functional w.r.t. an
object's TRANSLATION has a contour-integral boundary term along the
object's silhouette edges (Li et al. 2018, "Differentiable Monte Carlo Ray
Tracing through Edge Sampling") that pathwise autodiff misses entirely —
radiance is discontinuous across a silhouette.

For a discontinuity curve q(s) in the unit image square moving with
velocity V_j = ∂q/∂t_j under translation component t_j, the mean-image
derivative is

    d(mean)/dt_j = Σ_edges ∫₀¹ (L₋ − L₊) · det[dq/ds, V_j] ds

where L∓ are the radiances probed just on either side of the projected
edge along its image normal n̂ = perp(dq/ds)/|dq/ds| (L₋ on the −n̂ side).
The sign convention is orientation-free: flipping an edge's direction
flips both det and the probe sides.

Everything is vectorized over (edges × samples) — no data-dependent
control flow, TPU-friendly — and occlusion needs no special casing: an
edge point hidden behind other geometry probes the same radiance on both
sides, so ΔL = 0 cancels its contribution.

Scope (second slice, VERDICT r3 #4):
- PRIMARY silhouettes under object translation
  (:func:`edge_translation_gradient`) and under PER-VERTEX motion
  (:func:`edge_vertex_gradient` — the same boundary integral with velocity
  ∂q/∂v = barycentric-weighted ∂q/∂x, scatter-added per vertex).
- SHADOW silhouettes (:func:`shadow_edge_translation_gradient`): a
  translated blocker also sweeps its shadow boundary across receivers; the
  boundary curve is the light-silhouette edge reprojected through the
  light onto the receiver plane, with velocity obtained by chaining the
  blocker velocity through the light-ray/receiver-plane intersection.
Indirect (multi-bounce) discontinuities remain future work.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from bifrost3d_tpu.scene.camera import (
    PinholeCamera, camera_ray_directions, project_to_screen)


class MeshEdges(NamedTuple):
    """Unique edges of a triangle mesh with adjacent-face normals.

    Built host-side once per object (``build``); translation-invariant
    (normals don't change under translation), so the same structure serves
    every gradient evaluation.
    """

    v0: jnp.ndarray   # [e, 3] edge start (object space)
    v1: jnp.ndarray   # [e, 3] edge end
    n0: jnp.ndarray   # [e, 3] normal of one adjacent face
    n1: jnp.ndarray   # [e, 3] normal of the other (= -n0 for boundary
                      #        edges, so they always count as silhouette)
    i0: jnp.ndarray   # [e] int32 canonical vertex id of v0 (first
    i1: jnp.ndarray   # [e] int32    occurrence of the merged position)

    @staticmethod
    def build(positions, indices) -> "MeshEdges":
        pos = np.asarray(positions, np.float64)
        idx = np.asarray(indices, np.int64).reshape(-1, 3)
        # Merge positionally duplicate vertices: meshes with per-face
        # normals/uvs (e.g. make_box) duplicate corner vertices, which
        # would otherwise turn every shared edge into TWO "boundary" edges
        # and double-count its silhouette contribution.
        _, first_idx, uniq_inverse = np.unique(
            pos.round(decimals=5), axis=0,
            return_index=True, return_inverse=True)
        idx = first_idx[uniq_inverse][idx]   # canonical original vertex ids
        e0 = idx[:, [0, 1]]
        e1 = idx[:, [1, 2]]
        e2 = idx[:, [2, 0]]
        all_edges = np.concatenate([e0, e1, e2], axis=0)       # [3f, 2]
        face_of = np.tile(np.arange(idx.shape[0]), 3)
        key = np.sort(all_edges, axis=1)
        _, first, counts = np.unique(
            key, axis=0, return_index=True, return_counts=True)

        tri = pos[idx]
        fn = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
        fn /= np.maximum(np.linalg.norm(fn, axis=1, keepdims=True), 1e-20)

        v0_list, v1_list, n0_list, n1_list = [], [], [], []
        i0_list, i1_list = [], []
        order = np.lexsort((key[:, 1], key[:, 0]))
        sorted_key = key[order]
        sorted_face = face_of[order]
        sorted_orig = all_edges[order]
        i = 0
        while i < len(sorted_key):
            j = i + 1
            while j < len(sorted_key) and np.all(
                    sorted_key[j] == sorted_key[i]):
                j += 1
            a, b = sorted_orig[i]
            f0 = sorted_face[i]
            n0 = fn[f0]
            if j - i >= 2:
                n1 = fn[sorted_face[i + 1]]
                if np.dot(np.cross(n0, n1), np.cross(n0, n1)) < 1e-16:
                    i = j
                    continue          # coplanar interior edge: never a
                                      # silhouette, skip it entirely
            else:
                n1 = -n0              # boundary edge: always silhouette
            v0_list.append(pos[a])
            v1_list.append(pos[b])
            n0_list.append(n0)
            n1_list.append(n1)
            i0_list.append(a)
            i1_list.append(b)
            i = j
        return MeshEdges(
            v0=jnp.asarray(np.asarray(v0_list), jnp.float32),
            v1=jnp.asarray(np.asarray(v1_list), jnp.float32),
            n0=jnp.asarray(np.asarray(n0_list), jnp.float32),
            n1=jnp.asarray(np.asarray(n1_list), jnp.float32),
            i0=jnp.asarray(np.asarray(i0_list), jnp.int32),
            i1=jnp.asarray(np.asarray(i1_list), jnp.int32),
        )


@partial(jax.jit, static_argnames=("radiance_fn", "samples_per_edge"))
def edge_translation_gradient(camera: PinholeCamera, edges: MeshEdges,
                              translation, radiance_fn,
                              samples_per_edge: int = 8,
                              edge_eps: float = 1e-3):
    """Boundary term of d(mean channel-mean image)/d(object translation).

    ``translation`` [3] is the object's CURRENT translation (the edge
    vertices are object-space; the probed scene must hold the object at
    this translation). ``radiance_fn(origin, direction) -> [...]`` returns
    the channel-mean radiance the forward functional integrates over the
    image. Returns [3].
    """
    translation = jnp.asarray(translation, jnp.float32)
    eye = camera.transform.translation

    e = edges.v0.shape[0]
    k = samples_per_edge
    s = (jnp.arange(k, dtype=jnp.float32) + 0.5) / k            # [k]
    p0 = edges.v0 + translation                                  # [e, 3]
    p1 = edges.v1 + translation
    x = p0[:, None, :] + (p1 - p0)[:, None, :] * s[None, :, None]  # [e,k,3]
    flat_x = x.reshape(-1, 3)

    # Silhouette classification at each sample (the view vector varies
    # along the edge): one adjacent face front-facing, the other back.
    view = x - eye                                               # [e, k, 3]
    side0 = jnp.einsum("ekc,ec->ek", view, edges.n0)
    side1 = jnp.einsum("ekc,ec->ek", view, edges.n1)
    silhouette = (side0 * side1 <= 0.0).reshape(-1)

    # Screen position, tangent dq/ds (via jvp along the edge), and the
    # translation velocity jacobian dq/dt [2, 3] (via jacfwd).
    edge_dir = jnp.repeat(p1 - p0, k, axis=0)                    # [e·k, 3]

    def q_of(pt):
        return project_to_screen(camera, pt)

    def per_sample(pt, tangent):
        (q, w), (dq_ds, _) = jax.jvp(q_of, (pt,), (tangent,))
        dq_dt = jax.jacfwd(lambda d: q_of(pt + d)[0])(jnp.zeros(3))  # [2,3]
        return q, w, dq_ds, dq_dt

    q, w, dq_ds, dq_dt = jax.vmap(per_sample)(flat_x, edge_dir)

    inside = (w > 0.0) & jnp.all((q >= 0.0) & (q <= 1.0), axis=-1)

    # Probe radiance on both sides of the projected edge.
    t_len = jnp.sqrt(jnp.sum(dq_ds * dq_ds, axis=-1))
    n_img = jnp.stack([-dq_ds[:, 1], dq_ds[:, 0]], axis=-1) \
        / jnp.maximum(t_len, 1e-12)[:, None]
    uv_minus = jnp.clip(q - edge_eps * n_img, 0.0, 1.0)
    uv_plus = jnp.clip(q + edge_eps * n_img, 0.0, 1.0)
    o_m, d_m = camera_ray_directions(camera, uv_minus)
    o_p, d_p = camera_ray_directions(camera, uv_plus)
    l_minus = radiance_fn(o_m, d_m)
    l_plus = radiance_fn(o_p, d_p)

    # det[dq/ds, dq/dt_j] per translation component.
    det = dq_ds[:, 0, None] * dq_dt[:, 1, :] \
        - dq_ds[:, 1, None] * dq_dt[:, 0, :]                     # [e·k, 3]

    weight = jnp.where(silhouette & inside,
                       l_minus - l_plus, 0.0)[:, None]
    contributions = weight * det                                 # [e·k, 3]
    # Σ_edges mean_s: each edge integrates ds over [0, 1].
    return jnp.sum(contributions.reshape(e, k, 3), axis=(0, 1)) / k


@partial(jax.jit, static_argnames=("radiance_fn", "n_vertices",
                                   "samples_per_edge"))
def edge_vertex_gradient(camera: PinholeCamera, edges: MeshEdges,
                         translation, radiance_fn, n_vertices: int,
                         samples_per_edge: int = 8,
                         edge_eps: float = 1e-3):
    """Boundary term of d(mean channel-mean image)/d(vertex positions)
    → [n_vertices, 3] (second slice: per-vertex edge velocities).

    The boundary integral is the same as :func:`edge_translation_gradient`
    with velocity V = ∂q/∂v_j: an edge sample at parameter s moves with
    (1−s)·∂q/∂x under its start vertex and s·∂q/∂x under its end vertex,
    so each sample's det-weighted contribution scatter-adds to the edge's
    two canonical vertices (duplicated mesh corners accumulate on the
    first position-unique occurrence — MeshEdges.build's merge).
    """
    translation = jnp.asarray(translation, jnp.float32)
    eye = camera.transform.translation
    e = edges.v0.shape[0]
    k = samples_per_edge
    s = (jnp.arange(k, dtype=jnp.float32) + 0.5) / k
    p0 = edges.v0 + translation
    p1 = edges.v1 + translation
    x = p0[:, None, :] + (p1 - p0)[:, None, :] * s[None, :, None]
    flat_x = x.reshape(-1, 3)

    view = x - eye
    side0 = jnp.einsum("ekc,ec->ek", view, edges.n0)
    side1 = jnp.einsum("ekc,ec->ek", view, edges.n1)
    silhouette = (side0 * side1 <= 0.0).reshape(-1)

    edge_dir = jnp.repeat(p1 - p0, k, axis=0)

    def q_of(pt):
        return project_to_screen(camera, pt)

    def per_sample(pt, tangent):
        (q, w), (dq_ds, _) = jax.jvp(q_of, (pt,), (tangent,))
        dq_dx = jax.jacfwd(lambda d: q_of(pt + d)[0])(jnp.zeros(3))  # [2,3]
        return q, w, dq_ds, dq_dx

    q, w, dq_ds, dq_dx = jax.vmap(per_sample)(flat_x, edge_dir)
    inside = (w > 0.0) & jnp.all((q >= 0.0) & (q <= 1.0), axis=-1)

    t_len = jnp.sqrt(jnp.sum(dq_ds * dq_ds, axis=-1))
    n_img = jnp.stack([-dq_ds[:, 1], dq_ds[:, 0]], axis=-1) \
        / jnp.maximum(t_len, 1e-12)[:, None]
    o_m, d_m = camera_ray_directions(camera,
                                     jnp.clip(q - edge_eps * n_img, 0.0, 1.0))
    o_p, d_p = camera_ray_directions(camera,
                                     jnp.clip(q + edge_eps * n_img, 0.0, 1.0))
    delta_l = jnp.where(silhouette & inside,
                        radiance_fn(o_m, d_m) - radiance_fn(o_p, d_p), 0.0)

    det = dq_ds[:, 0, None] * dq_dx[:, 1, :] \
        - dq_ds[:, 1, None] * dq_dx[:, 0, :]                     # [e·k, 3]
    contrib = delta_l[:, None] * det / k                         # [e·k, 3]
    s_flat = jnp.tile(s, e)
    g = jnp.zeros((n_vertices, 3), jnp.float32)
    i0 = jnp.repeat(edges.i0, k)
    i1 = jnp.repeat(edges.i1, k)
    g = g.at[i0].add(contrib * (1.0 - s_flat)[:, None])
    g = g.at[i1].add(contrib * s_flat[:, None])
    return g


@partial(jax.jit, static_argnames=("radiance_fn", "occluder_fn",
                                   "samples_per_edge"))
def shadow_edge_translation_gradient(camera: PinholeCamera,
                                     edges: MeshEdges, translation,
                                     light_position, radiance_fn,
                                     occluder_fn,
                                     samples_per_edge: int = 8,
                                     edge_eps: float = 1e-3):
    """SHADOW-silhouette boundary term of d(mean image)/d(translation)
    → [3] (second slice: secondary discontinuities for a point-like light).

    A blocker edge that is a silhouette as seen from ``light_position``
    casts a shadow boundary onto the receiver behind it. The boundary
    curve in the image is q(s) = project(y(s)) where y is the light-ray
    through the edge point continued to the receiver; translating the
    blocker moves y with the chain rule through the (detached) receiver
    plane. ``occluder_fn(origin, direction) -> (t, plane_point [..,3],
    plane_normal [..,3])`` returns the RECEIVER hit for a ray cast from
    just past the edge point away from the light (its plane is treated as
    static — receivers of interest don't move with the blocker).
    ``radiance_fn`` probes camera rays as in the primary estimator.
    """
    translation = jnp.asarray(translation, jnp.float32)
    light = jnp.asarray(light_position, jnp.float32)
    e = edges.v0.shape[0]
    k = samples_per_edge
    s = (jnp.arange(k, dtype=jnp.float32) + 0.5) / k
    p0 = edges.v0 + translation
    p1 = edges.v1 + translation
    x = (p0[:, None, :] + (p1 - p0)[:, None, :] * s[None, :, None]
         ).reshape(-1, 3)

    # Silhouette as seen from the LIGHT.
    to_x = x.reshape(e, k, 3) - light
    side0 = jnp.einsum("ekc,ec->ek", to_x, edges.n0)
    side1 = jnp.einsum("ekc,ec->ek", to_x, edges.n1)
    silhouette = (side0 * side1 <= 0.0).reshape(-1)

    # Receiver plane behind the edge point (detached).
    ldir = x - light
    ldist = jnp.sqrt(jnp.sum(ldir * ldir, axis=-1, keepdims=True))
    ldir = ldir / jnp.maximum(ldist, 1e-12)
    probe_o = x + ldir * jnp.maximum(ldist, 1e-12) * 1e-3
    r_t, r_point, r_normal = jax.tree.map(
        jax.lax.stop_gradient, occluder_fn(probe_o, ldir))
    has_receiver = jnp.isfinite(r_t)

    edge_dir = jnp.repeat(p1 - p0, k, axis=0)

    def shadow_point(pt, point, normal):
        """Light-ray through pt intersected with the receiver plane."""
        d = pt - light
        denom = jnp.sum(d * normal)
        tt = jnp.sum((point - light) * normal) / jnp.where(
            jnp.abs(denom) > 1e-12, denom, 1e-12)
        return light + d * tt

    def per_sample(pt, tangent, point, normal):
        def q_of(p):
            return project_to_screen(camera, shadow_point(p, point, normal))

        (q, w), (dq_ds, _) = jax.jvp(q_of, (pt,), (tangent,))
        dq_dt = jax.jacfwd(lambda d: q_of(pt + d)[0])(jnp.zeros(3))
        return q, w, dq_ds, dq_dt

    q, w, dq_ds, dq_dt = jax.vmap(per_sample)(x, edge_dir, r_point, r_normal)
    inside = (w > 0.0) & jnp.all((q >= 0.0) & (q <= 1.0), axis=-1)

    t_len = jnp.sqrt(jnp.sum(dq_ds * dq_ds, axis=-1))
    n_img = jnp.stack([-dq_ds[:, 1], dq_ds[:, 0]], axis=-1) \
        / jnp.maximum(t_len, 1e-12)[:, None]
    o_m, d_m = camera_ray_directions(camera,
                                     jnp.clip(q - edge_eps * n_img, 0.0, 1.0))
    o_p, d_p = camera_ray_directions(camera,
                                     jnp.clip(q + edge_eps * n_img, 0.0, 1.0))
    valid = silhouette & inside & has_receiver
    delta_l = jnp.where(valid, radiance_fn(o_m, d_m) - radiance_fn(o_p, d_p),
                        0.0)

    det = dq_ds[:, 0, None] * dq_dt[:, 1, :] \
        - dq_ds[:, 1, None] * dq_dt[:, 0, :]
    contributions = delta_l[:, None] * det
    return jnp.sum(contributions.reshape(e, k, 3), axis=(0, 1)) / k
