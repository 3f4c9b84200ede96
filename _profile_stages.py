"""Break down steady-state pipeline time by stage on the real TPU."""
import os, time
import jax, jax.numpy as jnp
import visual_odometry_tpu  # precision policy
from visual_odometry_tpu.models import pipeline, landmark_map
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

def timeit(name, fn, reps=20):
    r = fn()
    jax.block_until_ready(r)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        rs = [fn() for _ in range(reps)]
        jax.block_until_ready(rs)
        best = min(best, (time.perf_counter() - t0) / reps)
    print(f"{name:32s} {best*1e3:8.3f} ms")
    return best

# full program
timeit("full _run", lambda: pipeline._run(camera, cfg, pts, apps_a, mask, ids, False)[0])

# batched matcher alone
import functools
from visual_odometry_tpu.ops import matching
@jax.jit
def match_only(pts, apps_a, mask):
    rest_a, prev_a = apps_a[2:], apps_a[1:-1]
    rest_m, prev_m = mask[2:], mask[1:-1]
    return jax.vmap(functools.partial(matching.match_appearances, radius=cfg.match_radius))(
        prev_a, prev_m, rest_a, rest_m)
timeit("batched match", lambda: match_only(pts, apps_a, mask).idx1)

# track (bootstrap + fused loop, includes match) without map fold
trackfn = jax.jit(lambda p, a, m, i: pipeline._track(camera, cfg, p, a, m, i, False)[1].pose)
timeit("_track (match+init+fused loop)", lambda: trackfn(pts, apps_a, mask, ids))

# map merge_stream alone
F, S, D = apps_a.shape
sp = jnp.zeros((F * S, 3), jnp.float32)
sa = jax.block_until_ready(apps_a.reshape(-1, D))
sm = mask.reshape(-1)
mergefn = jax.jit(lambda p, a, m: landmark_map.merge_stream(p, a, m, cfg.map_capacity).points)
timeit("merge_stream", lambda: mergefn(sp, sa, sm))
