"""Sharded progressive rendering over a device mesh.

Pixel rows shard across the 'tiles' axis; the sphere scene (later: BVH +
vertex + material + light buffers) replicates on every device. Each device
renders its rows independently — zero collectives in the forward pass; the
progressive accumulation stays device-local so HBM never round-trips
through the host.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from bifrost3d_tpu.integrator.smallpt import render_smallpt_pixels
from bifrost3d_tpu.parallel.mesh import TILE_AXIS, pad_to_multiple, render_mesh
from bifrost3d_tpu.scene.spheres import SphereScene


def make_sharded_smallpt(mesh, width: int, height: int):
    """Build a jitted sharded render fn: (scene, accumulation) → [H, W, 3].

    Rows are padded to a multiple of the mesh size, sharded over the
    'tiles' axis, rendered independently per device, and cropped back.
    """
    n_dev = mesh.devices.size
    padded_h = pad_to_multiple(height, n_dev)
    y_all = jnp.broadcast_to(
        jnp.arange(padded_h, dtype=jnp.uint32)[:, None], (padded_h, width))
    x_all = jnp.broadcast_to(
        jnp.arange(width, dtype=jnp.uint32)[None, :], (padded_h, width))

    @partial(shard_map, mesh=mesh,
             in_specs=(P(), P(TILE_AXIS), P(TILE_AXIS), P()),
             out_specs=P(TILE_AXIS))
    def _render_shard(scene, x, y, accumulation):
        return render_smallpt_pixels(scene, x, y, width, height, accumulation)

    @jax.jit
    def render(scene: SphereScene, accumulation):
        img = _render_shard(scene, x_all, y_all, jnp.asarray(accumulation, jnp.uint32))
        return img[:height]

    return render


def render_smallpt_sharded(scene: SphereScene, width: int, height: int,
                           accumulations: int, mesh=None) -> jnp.ndarray:
    """Progressive sharded render (row 0 = bottom, like the reference)."""
    if mesh is None:
        mesh = render_mesh()
    render = make_sharded_smallpt(mesh, width, height)
    buffer = jnp.zeros((height, width, 3), jnp.float32)
    for n in range(1, accumulations + 1):
        frame = render(scene, n)
        buffer = buffer + (frame - buffer) / n
    return buffer


# ---------------------------------------------------------------------------
# Full wavefront integrator over the mesh (the production path)
# ---------------------------------------------------------------------------

def make_sharded_render(mesh, width: int, height: int, settings=None,
                        pool_size: int = 65536):
    """Sharded mesh-scene render: (scene, camera, accumulation) → [H, W, 3].

    Pixel rows shard over the 'tiles' axis; the RenderScene (triangle soup,
    BVH, materials, lights, env tables) and camera replicate — the
    BASELINE.json data-parallel layout. Zero collectives in the forward
    pass; on hardware each device runs the Pallas intersector on its rows.

    Each device renders its flat pixel range through the POOLED compacting
    wavefront (the forward product path): the while_loop trip count varies
    per device and contains no collectives, so devices finish their row
    blocks independently.
    """
    from bifrost3d_tpu.integrator.path_tracer import (
        RenderSettings, render_pixels_pooled)

    settings = settings or RenderSettings()
    n_dev = mesh.devices.size
    padded_h = pad_to_multiple(height, n_dev)
    rows_per_dev = padded_h // n_dev
    shard_pixels = rows_per_dev * width

    # check_vma=False: the Pallas intersector's ShapeDtypeStruct outputs
    # carry no varying-mesh-axes annotation.
    @partial(shard_map, mesh=mesh,
             in_specs=(P(), P(), P()),
             out_specs=P(TILE_AXIS), check_vma=False)
    def _render_shard(scene, camera, accumulation):
        start = jax.lax.axis_index(TILE_AXIS).astype(jnp.int32) * shard_pixels
        accum, _ = render_pixels_pooled(
            scene, camera, width, height, accumulation, settings,
            pool_size=min(pool_size, shard_pixels), pixel_start=start,
            n_pixels=shard_pixels)
        return accum.reshape(rows_per_dev, width, 3)

    @jax.jit
    def render(scene, camera, accumulation):
        img = _render_shard(scene, camera,
                            jnp.asarray(accumulation, jnp.uint32))
        return img[:height]

    return render


def silhouette_translation_boundary_grad(shifted_scene, translation, camera,
                                         target, edges, width, height,
                                         accumulation, settings,
                                         samples_per_edge):
    """Loss-adjoint-weighted silhouette boundary term → translation grad [3].

    Edge-sampled estimator (diff/mesh_edge_grad.py): for
    loss = mean((I−T)²) the boundary integrand is
    (L₋−T(q))² − (L₊−T(q))² per channel with T bilinearly sampled at the
    edge's image position; probe pairs share a pixel hash so estimator
    noise is common-mode and cancels in ΔL. Replicated (a few hundred
    probes). Shared by the geometry and the unified train steps."""
    from bifrost3d_tpu.integrator.path_tracer import render_rays
    from bifrost3d_tpu.sampling.hashes import pcg2d
    from bifrost3d_tpu.scene.camera import (
        camera_ray_directions, project_to_screen)
    from jax.scipy.ndimage import map_coordinates

    eye = camera.transform.translation
    e = edges.v0.shape[0]
    k = samples_per_edge
    s = (jnp.arange(k, dtype=jnp.float32) + 0.5) / k
    p0 = edges.v0 + translation
    p1 = edges.v1 + translation
    x = (p0[:, None, :] + (p1 - p0)[:, None, :] * s[None, :, None]
         ).reshape(-1, 3)
    view = x.reshape(e, k, 3) - eye
    side0 = jnp.einsum("ekc,ec->ek", view, edges.n0)
    side1 = jnp.einsum("ekc,ec->ek", view, edges.n1)
    silhouette = (side0 * side1 <= 0.0).reshape(-1)

    edge_dir = jnp.repeat(p1 - p0, k, axis=0)

    def per_sample(pt, tangent):
        def q_of(p):
            return project_to_screen(camera, p)
        (q, w), (dq_ds, _) = jax.jvp(q_of, (pt,), (tangent,))
        dq_dt = jax.jacfwd(lambda d: q_of(pt + d)[0])(jnp.zeros(3))
        return q, w, dq_ds, dq_dt

    q, w, dq_ds, dq_dt = jax.vmap(per_sample)(x, edge_dir)
    inside = (w > 0.0) & jnp.all((q >= 0.0) & (q <= 1.0), axis=-1)
    t_len = jnp.sqrt(jnp.sum(dq_ds * dq_ds, axis=-1))
    n_img = jnp.stack([-dq_ds[:, 1], dq_ds[:, 0]], axis=-1) \
        / jnp.maximum(t_len, 1e-12)[:, None]
    eps = 1.5e-3

    # Same hash for both probes of a pair: the stochastic estimator
    # noise is common-mode and cancels in ΔL.
    xi = jnp.clip(q[:, 0] * width, 0, width - 1).astype(jnp.uint32)
    yi = jnp.clip((1.0 - q[:, 1]) * height, 0, height - 1
                  ).astype(jnp.uint32)
    probe_hash, _ = pcg2d(xi, yi)

    def probe(uv):
        o, d = camera_ray_directions(camera, uv)
        return render_rays(shifted_scene, o, d, probe_hash, accumulation,
                           settings)

    l_minus = probe(jnp.clip(q - eps * n_img, 0.0, 1.0))
    l_plus = probe(jnp.clip(q + eps * n_img, 0.0, 1.0))

    # Target bilinearly sampled at q (image row 0 = viewport v = 1).
    ty = (1.0 - q[:, 1]) * height - 0.5
    tx = q[:, 0] * width - 0.5
    t_at_q = jnp.stack([
        map_coordinates(target[..., c], [ty, tx], order=1,
                        mode="nearest") for c in range(3)], axis=-1)
    # loss = ∫ Σ_c (I−T)² du / 3 in continuous image space, so the
    # boundary integrand carries the same 1/3 channel normalization.
    delta_f = jnp.sum(jnp.square(l_minus - t_at_q)
                      - jnp.square(l_plus - t_at_q), axis=-1) / 3.0
    det = dq_ds[:, 0, None] * dq_dt[:, 1, :] \
        - dq_ds[:, 1, None] * dq_dt[:, 0, :]
    contrib = jnp.where(silhouette & inside, delta_f, 0.0)[:, None] * det
    return jnp.sum(contrib.reshape(e, k, 3), axis=(0, 1)) / k


def make_sharded_train_step(mesh, width: int, height: int,
                            settings=None, learning_rate: float = 5e-2,
                            tri_range=None, object_edges=None,
                            samples_per_edge: int = 16):
    """Sharded inverse-rendering step — the FULL training step of this
    framework (BASELINE.json north star): forward wavefront over sharded
    pixel rows, backward through shading/lights, gradient **all-reduce
    (psum over ICI)**, replicated Adam update.

    Parameter pytree (VERDICT r4 #8 — the full material surface):
    material ``tint``, ``roughness``, ``specularity``, ``metallic``,
    ``emission``, plus ``light_power``. When ``tri_range`` (+ optionally
    ``object_edges`` for the silhouette boundary term) is given, a
    geometry ``translation`` [3] for that triangle range joins the pytree
    — one unified step optimizes materials, lights, AND geometry
    together (interior/pathwise term sharded like everything else; the
    edge-sampled boundary term is added replicated).

    Returns (init_fn, step_fn):
      init_fn(scene) -> (params, opt_state)
      step_fn(params, opt_state, scene, camera, target, accumulation)
          -> (params, opt_state, loss)
    """
    import optax
    from bifrost3d_tpu.integrator.path_tracer import (
        RenderSettings, render_sample_pixels)

    settings = settings or RenderSettings()
    n_dev = mesh.devices.size
    padded_h = pad_to_multiple(height, n_dev)
    y_all = jnp.broadcast_to(
        jnp.arange(padded_h, dtype=jnp.uint32)[:, None], (padded_h, width))
    x_all = jnp.broadcast_to(
        jnp.arange(width, dtype=jnp.uint32)[None, :], (padded_h, width))
    opt = optax.adam(learning_rate)
    denom = float(width * height * 3)
    with_geometry = tri_range is not None
    if with_geometry:
        t0, t1 = tri_range

    def _apply_params(scene, p):
        mats = scene.materials._replace(
            tint=p["tint"], roughness=p["roughness"],
            specularity=p["specularity"], metallic=p["metallic"],
            emission=p["emission"])
        lights = scene.lights._replace(power=p["light_power"])
        scene = scene._replace(materials=mats, lights=lights)
        if with_geometry:
            from bifrost3d_tpu.geometry.traverse import BRUTE_FORCE_MAX_TRIS
            if int(scene.tri_verts.shape[0]) > BRUTE_FORCE_MAX_TRIS:
                raise ValueError(
                    "unified geometry optimization supports scenes up to "
                    f"{BRUTE_FORCE_MAX_TRIS} triangles (stale-BVH hazard)")
            shifted = scene.tri_verts.at[t0:t1].add(
                p["translation"][None, None, :])
            scene = scene._replace(tri_verts=shifted, tri_components=None,
                                   tri_clustered=None)
        return scene

    def init_fn(scene):
        params = {"tint": scene.materials.tint,
                  "roughness": scene.materials.roughness,
                  "specularity": scene.materials.specularity,
                  "metallic": scene.materials.metallic,
                  "emission": scene.materials.emission,
                  "light_power": scene.lights.power}
        if with_geometry:
            params["translation"] = jnp.zeros(3, jnp.float32)
        return params, opt.init(params)

    @partial(shard_map, mesh=mesh,
             in_specs=(P(), P(), P(), P(TILE_AXIS), P(TILE_AXIS),
                       P(TILE_AXIS), P()),
             out_specs=(P(), P()), check_vma=False)
    def _loss_grad_shard(params, scene, camera, x, y, target_rows,
                         accumulation):
        def local_loss(p):
            img = render_sample_pixels(
                _apply_params(scene, p), camera, x, y, width, height,
                accumulation, settings)
            # Local SUM of squared error; the mean's denominator is applied
            # after the cross-device reduction. Rows >= height are padding
            # (height was rounded up to the device count) and must not
            # contribute error.
            in_image = (y < height)[..., None]
            return jnp.sum(jnp.where(in_image, jnp.square(img - target_rows),
                                     0.0))

        loss, grads = jax.value_and_grad(local_loss)(params)
        # Gradient all-reduce over ICI — the DP collective.
        loss = jax.lax.psum(loss, TILE_AXIS) / denom
        grads = jax.tree.map(
            lambda g: jax.lax.psum(g, TILE_AXIS) / denom, grads)
        return loss, grads

    def _boundary_translation_grad(params, scene, camera, target,
                                   accumulation):
        """Silhouette boundary term for the unified translation parameter,
        replicated — a few hundred probes."""
        return silhouette_translation_boundary_grad(
            _apply_params(scene, params), params["translation"], camera,
            target, object_edges, width, height, accumulation, settings,
            samples_per_edge)

    @jax.jit
    def step_fn(params, opt_state, scene, camera, target, accumulation):
        target_pad = jnp.zeros((padded_h, width, 3), target.dtype
                               ).at[:height].set(target)
        loss, grads = _loss_grad_shard(
            params, scene, camera, x_all, y_all, target_pad,
            jnp.asarray(accumulation, jnp.uint32))
        if with_geometry and object_edges is not None:
            grads["translation"] = grads["translation"] \
                + _boundary_translation_grad(
                    params, scene, camera, target,
                    jnp.asarray(accumulation, jnp.uint32))
        updates, opt_state = opt.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        clipped = {"tint": jnp.clip(params["tint"], 0.0, 1.0),
                   "roughness": jnp.clip(params["roughness"], 0.02, 1.0),
                   "specularity": jnp.clip(params["specularity"], 0.0, 1.0),
                   "metallic": jnp.clip(params["metallic"], 0.0, 1.0),
                   "emission": jnp.maximum(params["emission"], 0.0),
                   "light_power": jnp.maximum(params["light_power"], 0.0)}
        if with_geometry:
            clipped["translation"] = params["translation"]
        return clipped, opt_state, loss

    return init_fn, step_fn


def make_sharded_geometry_train_step(mesh, width: int, height: int,
                                     tri_range, object_edges,
                                     settings=None,
                                     learning_rate: float = 2e-2,
                                     samples_per_edge: int = 16):
    """Sharded inverse-rendering step over a GEOMETRY parameter — the
    north-star "material/geometry/light" axis (VERDICT r3 #4): optimize an
    object's TRANSLATION against a target image.

    The translation gradient combines:
    - the INTERIOR (pathwise) term — autodiff through the shifted triangle
      attributes (the hit query stays detached; positions/normals fetched
      from the shifted soup carry the dependence), sharded over pixel rows
      with a psum all-reduce like the material step;
    - the BOUNDARY term — the silhouette-edge-sampled estimator
      (diff/mesh_edge_grad.py) weighted by the loss adjoint: for
      loss = mean((I−T)²), the boundary integrand is
      (L₋−T(q))² − (L₊−T(q))² per channel, with T bilinearly sampled at
      the edge's image position. Computed replicated (a few hundred
      probes) and added to the reduced interior gradient.

    ``tri_range = (start, end)``: the object's contiguous triangle range in
    the scene soup. Scope: scenes whose intersection runs off
    ``tri_verts`` directly (brute/XLA paths — small scenes; the Pallas
    packings are bypassed by clearing them in the shifted scene).
    """
    import optax
    from bifrost3d_tpu.diff.mesh_edge_grad import MeshEdges  # noqa: F401
    from bifrost3d_tpu.integrator.path_tracer import (
        RenderSettings, render_sample_pixels)
    from bifrost3d_tpu.scene.camera import camera_ray_directions

    settings = settings or RenderSettings()
    n_dev = mesh.devices.size
    padded_h = pad_to_multiple(height, n_dev)
    y_all = jnp.broadcast_to(
        jnp.arange(padded_h, dtype=jnp.uint32)[:, None], (padded_h, width))
    x_all = jnp.broadcast_to(
        jnp.arange(width, dtype=jnp.uint32)[None, :], (padded_h, width))
    opt = optax.adam(learning_rate)
    denom = float(width * height * 3)
    t0, t1 = tri_range

    def _shifted(scene, translation):
        # Clearing the Pallas packings routes small scenes to the dense
        # intersector; above the brute-force cutoff intersect_scene would
        # traverse scene.bvh — stale for the translated geometry — and
        # silently mis-intersect. Fail loudly instead (r4 advisor finding).
        from bifrost3d_tpu.geometry.traverse import BRUTE_FORCE_MAX_TRIS
        if int(scene.tri_verts.shape[0]) > BRUTE_FORCE_MAX_TRIS:
            raise ValueError(
                f"sharded geometry train step supports scenes up to "
                f"{BRUTE_FORCE_MAX_TRIS} triangles (got "
                f"{int(scene.tri_verts.shape[0])}); larger scenes would "
                f"fall through to a BVH built for the untranslated mesh")
        shifted = scene.tri_verts.at[t0:t1].add(translation[None, None, :])
        return scene._replace(tri_verts=shifted, tri_components=None,
                              tri_clustered=None)

    def init_fn():
        return jnp.zeros(3, jnp.float32), opt.init(jnp.zeros(3, jnp.float32))

    @partial(shard_map, mesh=mesh,
             in_specs=(P(), P(), P(), P(TILE_AXIS), P(TILE_AXIS),
                       P(TILE_AXIS), P()),
             out_specs=(P(), P()), check_vma=False)
    def _interior_shard(translation, scene, camera, x, y, target_rows,
                        accumulation):
        def local_loss(t):
            img = render_sample_pixels(
                _shifted(scene, t), camera, x, y, width, height,
                accumulation, settings)
            in_image = (y < height)[..., None]
            return jnp.sum(jnp.where(in_image,
                                     jnp.square(img - target_rows), 0.0))

        loss, grad = jax.value_and_grad(local_loss)(translation)
        loss = jax.lax.psum(loss, TILE_AXIS) / denom
        grad = jax.lax.psum(grad, TILE_AXIS) / denom
        return loss, grad

    def _boundary_grad(translation, scene, camera, target, accumulation):
        return silhouette_translation_boundary_grad(
            _shifted(scene, translation), translation, camera, target,
            object_edges, width, height, accumulation, settings,
            samples_per_edge)

    @jax.jit
    def step_fn(translation, opt_state, scene, camera, target, accumulation):
        accumulation = jnp.asarray(accumulation, jnp.uint32)
        target_pad = jnp.zeros((padded_h, width, 3), target.dtype
                               ).at[:height].set(target)
        loss, grad = _interior_shard(translation, scene, camera, x_all,
                                     y_all, target_pad, accumulation)
        grad = grad + _boundary_grad(translation, scene, camera, target,
                                     accumulation)
        updates, opt_state = opt.update(grad, opt_state)
        translation = optax.apply_updates(translation, updates)
        return translation, opt_state, loss

    return init_fn, step_fn
