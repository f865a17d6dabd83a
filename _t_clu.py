import time, numpy as np, jax, jax.numpy as jnp
from bifrost3d_tpu.geometry import make_torus, make_sphere
from bifrost3d_tpu.geometry.mesh import combine_meshes, transform_mesh
from bifrost3d_tpu.geometry.traverse import intersect_triangles_brute
from bifrost3d_tpu.geometry.pallas_intersect import pallas_intersect, pack_triangles
from bifrost3d_tpu.geometry.pallas_clustered import pack_clustered, clustered_intersect

# Build a BIG scene: grid of tori ≈ 590k tris
parts = []
rng = np.random.default_rng(0)
for i in range(8):
    for j in range(8):
        m = make_torus(major_segments=48, minor_segments=24)
        M = np.asarray([[1,0,0, i*3-12],[0,1,0, rng.uniform(-1,1)],[0,0,1, j*3-12]], np.float32)
        parts.append(transform_mesh(m, M))
mesh = combine_meshes(parts)
tris = jnp.asarray(np.asarray(mesh.positions)[np.asarray(mesh.indices)])
T = tris.shape[0]
R = 65536
# Coherent camera rays: one eye point, pixel grid toward the scene.
eye = np.asarray([0.0, 8.0, -30.0], np.float32)
W = Hh = 256
xs, ys = np.meshgrid(np.linspace(-1,1,W), np.linspace(-1,1,Hh))
d = np.stack([xs*0.6, ys*0.6 - 0.25, np.ones_like(xs)], -1).reshape(-1,3).astype(np.float32)
d /= np.linalg.norm(d, axis=-1, keepdims=True)
o = jnp.asarray(np.broadcast_to(eye, d.shape).copy())
d = jnp.asarray(d)
R = d.shape[0]
print("T =", T)

t0=time.time()
packed = pack_clustered(tris)
print("pack", round(time.time()-t0,2), "s; clusters:", packed.cluster_boxes.shape)

clu = jax.jit(lambda o,d: clustered_intersect(packed, o, d, 1e-4, jnp.inf))
h = clu(o,d); jax.block_until_ready(h)
t0=time.time()
for _ in range(10): h = clu(o,d)
jax.block_until_ready(h)
print("clustered:", round((time.time()-t0)/10*1e3,2), "ms")

# dense pallas for ground truth (fits? T=590k > 65536 cap but kernel itself handles any T)
comp, n = pack_triangles(tris)
pal = jax.jit(lambda o,d: pallas_intersect(comp, n, o, d, 1e-4, jnp.inf))
hp = pal(o,d); jax.block_until_ready(hp)
t0=time.time()
for _ in range(3): hp = pal(o,d)
jax.block_until_ready(hp)
print("dense pallas:", round((time.time()-t0)/3*1e3,2), "ms")

agree_t = float(jnp.mean(jnp.abs(jnp.nan_to_num(h.t, posinf=1e30) - jnp.nan_to_num(hp.t, posinf=1e30)) < 1e-3))
agree_p = float(jnp.mean(h.prim == hp.prim))
print("t agree:", agree_t, "prim agree:", agree_p)
