import time, numpy as np, jax, jax.numpy as jnp
from bifrost3d_tpu.geometry import make_sphere, make_torus
from bifrost3d_tpu.geometry.traverse import intersect_triangles_brute, intersect_bvh
from bifrost3d_tpu.geometry.bvh import build_bvh
from bifrost3d_tpu.geometry.pallas_intersect import pallas_intersect, pack_triangles

def bench(name, f, *args, reps=20):
    r = f(*args); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(reps):
        r = f(*args)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0)/reps
    print(f"{name}: {dt*1e3:.2f} ms")
    return r, dt

for n_tri_name, mesh in [("sphere2k", make_sphere(slices=48, stacks=24)),
                          ("torus8k", make_torus(major_segments=96, minor_segments=48))]:
    tris = jnp.asarray(np.asarray(mesh.positions)[np.asarray(mesh.indices)])
    T = tris.shape[0]
    R = 65536
    rng = np.random.default_rng(0)
    o = jnp.asarray(rng.normal(size=(R,3)).astype(np.float32)*2)
    d = jnp.asarray(rng.normal(size=(R,3)).astype(np.float32))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    comp, n = pack_triangles(tris)
    bvh = build_bvh(np.asarray(mesh.positions), np.asarray(mesh.indices))
    print(f"== {n_tri_name}: T={T} R={R}")
    brute = jax.jit(lambda o,d: intersect_triangles_brute(tris, o, d))
    pal = jax.jit(lambda o,d: pallas_intersect(comp, n, o, d, 1e-4, jnp.inf))
    bvhf = jax.jit(lambda o,d: intersect_bvh(bvh, tris, o, d))
    hp,_ = bench("pallas   ", pal, o, d)
    hb,_ = bench("xla brute", brute, o, d)

    hv,_ = bench("bvh lock ", bvhf, o, d)
    agree = float(jnp.mean((hb.prim == hp.prim)))
    agree_v = float(jnp.mean((hb.prim == hv.prim)))
    print(f"pallas agree {agree:.4f}, bvh agree {agree_v:.4f}")
