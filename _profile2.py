import os, time
import jax, jax.numpy as jnp
import visual_odometry_tpu
from visual_odometry_tpu.models import pipeline
from visual_odometry_tpu.ops.camera import Camera
from visual_odometry_tpu.utils import io
from visual_odometry_tpu.utils.config import DEFAULT_CONFIG

DATA = "/root/reference/example_data/data"
params = io.load_camera_params(os.path.join(DATA, "camera.dat"))
camera = Camera.create(params.camera_matrix, rows=params.height, cols=params.width,
                       z_near=params.z_near, z_far=params.z_far)
seq = io.load_sequence(DATA, DEFAULT_CONFIG.n_slots)
pts, apps_a, mask = jax.block_until_ready(jax.device_put((seq.points, seq.appearances, seq.mask)))
ids = jnp.full(mask.shape, -1, jnp.int32)
cfg = DEFAULT_CONFIG

r = pipeline._run(camera, cfg, pts, apps_a, mask, ids, False)
jax.block_until_ready(r)
# single-shot timing
for trial in range(5):
    t0 = time.perf_counter()
    r = pipeline._run(camera, cfg, pts, apps_a, mask, ids, False)
    jax.block_until_ready(r)
    print(f"single {1e3*(time.perf_counter()-t0):.3f} ms")
# queued x10
for trial in range(3):
    t0 = time.perf_counter()
    rs = [pipeline._run(camera, cfg, pts, apps_a, mask, ids, False)[0] for _ in range(10)]
    jax.block_until_ready(rs)
    print(f"queued10 {1e2*(time.perf_counter()-t0):.3f} ms/call")
