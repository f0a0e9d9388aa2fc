#!/usr/bin/env python
"""ATE RMSE between a groundtruth and an estimated TUM trajectory.

Equivalent of the reference eval scripts' `evo_ape tum <gt> <est> -as`
(Sim3 alignment) without the external evo dependency.
"""

import argparse
import json
import pathlib
import sys

# runnable as `python scripts/compute_ate.py` from anywhere (sys.path[0]
# is scripts/, not the repo root)
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("gt")
    p.add_argument("est")
    p.add_argument("--max-dt", type=float, default=0.02)
    p.add_argument("--no-scale", action="store_true",
                   help="SE3 alignment instead of Sim3 (-a instead of -as)")
    args = p.parse_args()

    from splatt3r_slam_tpu.runtime.evaluate import ate_rmse

    rmse = ate_rmse(args.gt, args.est, max_dt=args.max_dt,
                    with_scale=not args.no_scale)
    print(json.dumps({"ate_rmse": rmse, "gt": args.gt, "est": args.est}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
