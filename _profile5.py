import time, os, sys
import numpy as np
T=time.time
def p(s, t0): print(f"{s}: {T()-t0:.2f}s", flush=True)
t0=T()
import visual_odometry_tpu
from visual_odometry_tpu import apps
from visual_odometry_tpu.models import pipeline
from visual_odometry_tpu.models.landmark_map import compact
from visual_odometry_tpu.utils import io
from visual_odometry_tpu.utils.config import DEFAULT_CONFIG
p("import", t0)
data_dir="/root/reference/example_data/data"; out_dir="/tmp/vo_bench_out"
config=DEFAULT_CONFIG
t0=T(); params, camera, seq = apps._load(data_dir, config); p("_load", t0)
t0=T(); _, world_points, world_apps = io.load_world(os.path.join(data_dir, "world.dat")); p("load_world", t0)
t0=T(); io.write_vectors(os.path.join(out_dir, "world.txt"), world_points); p("write world", t0)
t0=T(); io.save_gt_trajectory(os.path.join(data_dir,"trajectory.dat"), os.path.join(out_dir,"trajectory_gt.txt")); p("save_gt", t0)
import jax
t0=T(); pts_d, apps_d, mask_d = jax.block_until_ready(jax.device_put((seq.points, seq.appearances, seq.mask))); p("device_put", t0)
t0=T(); trajectory, map_state, outs = pipeline.run_sequence(camera, config, pts_d, apps_d, mask_d); p("run_sequence dispatch", t0)
t0=T(); trajectory = np.asarray(trajectory); p("trajectory fetch", t0)
t0=T(); map_pts, map_apps = compact(map_state); p("compact", t0)
t0=T()
h = params.cam_in_robot
map_robot = map_pts @ h[:3, :3].T + h[:3, 3]
io.write_vectors(os.path.join(out_dir, "map.txt"), map_robot)
io.write_vectors(os.path.join(out_dir, "map_appearances.txt"), map_apps)
io.save_trajectory(os.path.join(out_dir, "trajectory_est_complete.txt"), trajectory, h)
io.save_trajectory(os.path.join(out_dir, "trajectory_est_data.txt"), trajectory, h, save_rotation=True)
p("writes", t0)
