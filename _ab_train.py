import time, jax, jax.numpy as jnp
from bifrost3d_tpu.apps.scenes import create_cornell_box
from bifrost3d_tpu.integrator.path_tracer import render_sample, settings_for_scene

scene, cam = create_cornell_box()
W = H = 256
settings = settings_for_scene(scene, max_bounce_count=2)
target = render_sample(scene, cam, W, H, jnp.uint32(0), settings)
float(target.sum())

@jax.jit
def step(tint, n):
    def loss_fn(tint):
        mats = scene.materials._replace(tint=tint)
        img = render_sample(scene._replace(materials=mats), cam, W, H, n, settings)
        return jnp.mean(jnp.square(img - target))
    return jax.value_and_grad(loss_fn)(tint)

v, g = step(scene.materials.tint, jnp.uint32(1)); float(v); float(g.sum())
for trial in range(3):
    reps = 5
    t0 = time.perf_counter()
    for n in range(1, reps + 1):
        v, g = step(scene.materials.tint, jnp.uint32(n))
    float(v) + float(g.sum())
    print(f"train_step {((time.perf_counter()-t0)/reps)*1e3:.1f} ms")
