"""Run the full benchmark suite; each line of output is one JSON record."""

import argparse
import subprocess
import sys
import os

BENCHES = ["bench_pipeline.py", "bench_matcher.py", "bench_picp.py", "bench_ba.py", "bench_scaling.py", "bench_scale.py", "bench_reloc.py", "bench_sparse_ba.py"]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--small", action="store_true", help="reduced sizes (CI/CPU)")
    args = p.parse_args()
    here = os.path.dirname(os.path.abspath(__file__))
    flags = ["--small"] if args.small else []
    rc = 0
    for b in BENCHES:
        r = subprocess.run(
            [sys.executable, os.path.join(here, b)] + flags,
            cwd=os.path.dirname(here),
        )
        rc |= r.returncode
    return rc


if __name__ == "__main__":
    sys.exit(main())
