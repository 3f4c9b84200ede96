import time, sys
t0=time.time()
import visual_odometry_tpu
from visual_odometry_tpu import apps
print("import", time.time()-t0, flush=True)
t0=time.time()
apps.run_vo_complete("/root/reference/example_data/data", "/tmp/vo_bench_out", verbose=False)
print("run_vo_complete", time.time()-t0, flush=True)
t0=time.time()
res = apps.run_evaluation("/root/reference/example_data/data", "/tmp/vo_bench_out", verbose=False)
print("run_evaluation", time.time()-t0, flush=True)
