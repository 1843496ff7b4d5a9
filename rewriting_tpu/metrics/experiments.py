"""End-to-end experiment orchestration (paper §5.1).

Equivalent of the reference's experiments.sh pipeline: sample clean images
(+ a FID split), sample edited images for each published edit, segment all
outputs, then report the effectiveness (seg_correct_mod) and damage
(distances) metrics.  Each stage is pidfile-guarded and resumable, so the
grid can be sharded across hosts exactly like the reference does."""

from __future__ import annotations

import os
import subprocess
import sys


STAGES = """
# reference experiments.sh:10-48 equivalents
python -m rewriting_tpu.metrics.sample --dataset church
python -m rewriting_tpu.metrics.sample --dataset church --fid_samples
python -m rewriting_tpu.metrics.sample --dataset faces
python -m rewriting_tpu.metrics.sample_edited --mask smile
python -m rewriting_tpu.metrics.sample_edited --mask dome2spire
python -m rewriting_tpu.metrics.sample_edited --mask dome2tree
python -m rewriting_tpu.metrics.sample_edited --mask dome2castle
python -m rewriting_tpu.metrics.seg_stats church_clean
python -m rewriting_tpu.metrics.seg_stats dome2spire
python -m rewriting_tpu.metrics.seg_stats faces_clean
python -m rewriting_tpu.metrics.seg_stats smile
python -m rewriting_tpu.metrics.seg_correct_mod --exp_name dome2spire
python -m rewriting_tpu.metrics.seg_correct_mod --exp_name smile
python -m rewriting_tpu.metrics.distances --exp_name dome2spire
python -m rewriting_tpu.metrics.distances --exp_name smile
""".strip()


def main():  # pragma: no cover
    import argparse
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dry_run", action="store_true",
                    help="print the stage commands without running")
    args = ap.parse_args()
    cmds = [line for line in STAGES.splitlines()
            if line and not line.startswith("#")]
    for cmd in cmds:
        print("+", cmd)
        if args.dry_run:
            continue
        ret = subprocess.call(cmd.split(), env=os.environ)
        if ret != 0:
            print(f"stage failed ({ret}); stopping", file=sys.stderr)
            sys.exit(ret)


if __name__ == "__main__":  # pragma: no cover
    main()
