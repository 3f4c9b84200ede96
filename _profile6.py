import time, os, sys
import jax
jax.config.update("jax_explain_cache_misses", True)
import logging
logging.getLogger("jax._src.compilation_cache").setLevel(logging.DEBUG)
logging.getLogger("jax._src.compiler").setLevel(logging.DEBUG)
logging.basicConfig(level=logging.INFO)
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
t0=time.time()
jax.block_until_ready(pipeline.run_sequence(camera, DEFAULT_CONFIG, pts, apps_a, mask)[0])
print("WARMUP", time.time()-t0, flush=True)
