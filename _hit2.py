import os, time
import jax, jax.numpy as jnp
import visual_odometry_tpu
from visual_odometry_tpu.models import pipeline
from visual_odometry_tpu.ops.camera import Camera
from visual_odometry_tpu.utils import io
from visual_odometry_tpu.utils.config import DEFAULT_CONFIG
DATA="/root/reference/example_data/data"
params = io.load_camera_params(os.path.join(DATA, "camera.dat"))
camera = Camera.create(params.camera_matrix, rows=params.height, cols=params.width,
                       z_near=params.z_near, z_far=params.z_far)
seq = io.load_sequence(DATA, DEFAULT_CONFIG.n_slots)
pts, apps_a, mask = jax.device_put((seq.points, seq.appearances, seq.mask))
ids = jnp.full(mask.shape, -1, jnp.int32)
t0=time.time()
lowered = pipeline._run.lower(camera, DEFAULT_CONFIG, pts, apps_a, mask, ids, False)
print("LOWER", time.time()-t0, flush=True)
t0=time.time()
c = lowered.compile()
print("COMPILE", time.time()-t0, flush=True)
t0=time.time()
r = c(camera, pts, apps_a, mask, ids)
jax.block_until_ready(r)
print("RUN1", time.time()-t0, flush=True)
