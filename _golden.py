import time, numpy as np, jax, jax.numpy as jnp
from PIL import Image
from bifrost3d_tpu.apps.scenes import create_cornell_box
from bifrost3d_tpu.scene.camera import perspective_camera
from bifrost3d_tpu.integrator.path_tracer import RenderSettings, render_sample
from bifrost3d_tpu.post.pipeline import process
from bifrost3d_tpu.post.tonemap import CameraEffectsSettings
from bifrost3d_tpu.io.compare import ssim, mssim, rms
from bifrost3d_tpu.io.image import srgb_encode_u8, save_image
import numpy as np

W, H = 640, 480
scene, _ = create_cornell_box()
import jax.numpy as _j
scene = scene._replace(environment_tint=_j.asarray([0.68, 0.92, 1.0], _j.float32))
cam = perspective_camera(eye=(0,0,-1.5), target=(0,0,0), fov_radians=np.pi/4, aspect=W/H)
settings = RenderSettings(max_bounce_count=4)
f = jax.jit(lambda n: render_sample(scene, cam, W, H, n, settings))
t0=time.time(); buf = f(jnp.uint32(0)); buf.block_until_ready(); print("compile+1st", time.time()-t0)
N = 512
t0=time.time()
for n in range(1, N):
    buf = buf + (f(jnp.uint32(n)) - buf) / (n + 1.0)
buf.block_until_ready(); print(f"{N} accums in {time.time()-t0:.1f}s")
ldr = process(buf, CameraEffectsSettings.preset()._replace(film_grain=0.0))
ours = srgb_encode_u8(np.asarray(ldr)).astype(np.float32)/255.0
gold = np.asarray(Image.open("/root/reference/apps/SimpleViewer/ReferenceImages/CornellBox_8192.png").convert("RGB"), np.float32)/255.0
print("ours mean", ours.mean(), "gold mean", gold.mean())
print("rms", float(rms(jnp.asarray(gold), jnp.asarray(ours))))
print("ssim", float(ssim(jnp.asarray(gold), jnp.asarray(ours))))
print("mssim", float(mssim(jnp.asarray(gold), jnp.asarray(ours))))
save_image("/tmp/our_cornell.png", ours, from_linear=False)
