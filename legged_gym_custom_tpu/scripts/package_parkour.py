"""Package the parkour training runs into the committed `trained/` artifact.

Writes, into --out:
  reward_curve.json   TB scalars merged across the base run(s) and the jump
                      finetune run on a single global-iteration axis
  model_final.ckpt    the blessed checkpoint (orbax dir, copied)

The remaining artifact pieces (policy_bundle.npz via scripts/play.py export,
parkour_scene.xml/.hfield.npy via deploy/scene_gen.py, SCAN trace via
play.py --record_scan) are produced by their own tools and placed alongside.

Usage: python -m legged_gym_custom_tpu.scripts.package_parkour \
           --runs run1:0 run2:1350 ft:3550 --ckpt <orbax dir>
where each --runs entry is <logdir>:<global iteration offset>.
"""
from __future__ import annotations

import argparse
import json
import os
import shutil

from legged_gym_custom_tpu import LEGGED_GYM_TPU_ROOT_DIR as ROOT
from legged_gym_custom_tpu.scripts.extract_curve import extract


def merge_curves(runs, every=25):
    merged: dict = {}
    for run_dir, offset in runs:
        cur = extract(run_dir, every=every)
        for tag, series in cur.items():
            out = merged.setdefault(tag, [])
            base_max = out[-1][0] if out else -1
            for it, v in series:
                g = it + offset
                if g > base_max:
                    out.append([g, v])
    return merged


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", nargs="+", required=True,
                    help="<logdir>:<global offset> in training order")
    ap.add_argument("--ckpt", required=True, help="checkpoint dir to bless")
    ap.add_argument("--out", default=os.path.join(ROOT, "trained", "go2_parkour_tpu_r3"))
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    runs = []
    for spec in args.runs:
        d, off = spec.rsplit(":", 1)
        runs.append((d, int(off)))

    curves = merge_curves(runs)
    mean_rew = curves.get("Train/mean_reward")
    if not mean_rew:
        raise SystemExit(
            "Train/mean_reward not found in the given runs; extracted tags: "
            + ", ".join(sorted(curves)) if curves else "none"
        )
    with open(os.path.join(args.out, "reward_curve.json"), "w") as f:
        json.dump(curves, f)
    print(f"reward_curve.json: {len(curves)} tags, "
          f"final mean_reward={mean_rew[-1]}")

    dst = os.path.join(args.out, "model_final.ckpt")
    if os.path.exists(dst):
        shutil.rmtree(dst)
    shutil.copytree(args.ckpt, dst)
    print(f"checkpoint: {args.ckpt} -> {dst}")


if __name__ == "__main__":
    main()
