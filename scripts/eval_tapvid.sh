#!/usr/bin/env bash
# Checkpoint-parity runbook: {checkpoint.pth, tapvid pickle} -> delta_avg/AJ
# table, zero edits (VERDICT r2 item 6; reference accuracy table to match:
# /root/reference/README.md:180-183, protocol caveat :175 -- exact paper
# repro needs the single_point pass).
#
# Usage:
#   scripts/eval_tapvid.sh CKPT DATA_ROOT [DATASET] [OUT_DIR] [--online]
#
#   CKPT      reference .pth (e.g. scaled_offline.pth / scaled_online.pth)
#   DATA_ROOT tapvid pickle (davis/stacking: the .pkl file; kinetics/robotap:
#             the shard directory)
#   DATASET   tapvid_davis_first (default) | tapvid_davis_strided |
#             tapvid_kinetics_first | tapvid_robotap_first |
#             tapvid_stacking_first | dynamic_replica
#   OUT_DIR   default ./outputs/eval_tapvid
#   --online  evaluate the online (window-16) model via the streaming chunk
#             driver instead of the offline EvaluationPredictor
set -euo pipefail

CKPT=$1
DATA=$2
DATASET=${3:-tapvid_davis_first}
OUT=${4:-./outputs/eval_tapvid}
MODE=${5:-}

COMMON=(--checkpoint "$CKPT" --dataset_root "$DATA" --dataset_name "$DATASET")

if [ "$MODE" = "--online" ]; then
  # online model: the evaluator drives the 16-frame chunk loop itself
  # (reference evaluate.py:110-140); window_len 16, no support grid
  python -m cotracker_tpu.evaluation.evaluate "${COMMON[@]}" \
    --online --window_len 16 --exp_dir "$OUT/${DATASET}_online"
else
  # joint protocol (approximately the paper table, reference README.md:175)
  python -m cotracker_tpu.evaluation.evaluate "${COMMON[@]}" \
    --exp_dir "$OUT/${DATASET}_joint"
  # exact-repro protocol: one query at a time + local 8x8 (extent 50) +
  # global 5x5 support grids
  python -m cotracker_tpu.evaluation.evaluate "${COMMON[@]}" \
    --single_point --exp_dir "$OUT/${DATASET}_single_point"
fi

python - "$OUT" <<'PYEOF'
import glob, json, os, sys

rows = []
for p in sorted(glob.glob(os.path.join(sys.argv[1], "*", "result_eval_.json"))):
    r = json.load(open(p))
    rows.append((os.path.basename(os.path.dirname(p)), r["avg"], r["time"]))
if not rows:
    sys.exit("no result_eval_.json found")
keys = ["average_pts_within_thresh", "average_jaccard", "occlusion_accuracy"]
print(f"{'protocol':34s} " + " ".join(f"{k.split('_')[-1]:>10s}" for k in keys) + "   wall_s")
for name, avg, t in rows:
    vals = " ".join(f"{avg.get(k, float('nan')):10.3f}" for k in keys)
    print(f"{name:34s} {vals} {t:8.1f}")
PYEOF
