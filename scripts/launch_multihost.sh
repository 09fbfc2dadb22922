#!/bin/bash
# Multi-host training launch (SLURM), the reference's
# launch_training_kubric_offline.sh equivalent for the JAX runtime model:
# one task per host; jax.distributed.initialize() wires them together from
# SLURM_NTASKS/SLURM_PROCID + the coordinator address below.
#
# On TPU pods, prefer the TPU runtime's auto-detection: just run the same
# command on every worker VM with --distributed and NO explicit
# coordinator/process args (jax.distributed.initialize auto-detects).
#
#SBATCH --job-name=cotracker_tpu
#SBATCH --nodes=4
#SBATCH --ntasks-per-node=1
#SBATCH --cpus-per-task=32
#SBATCH --signal=USR1@60
#SBATCH --open-mode=append

set -euo pipefail

EXP_DIR=${EXP_DIR:-./outputs/train_multihost}
DATASET_ROOT=${DATASET_ROOT:?set DATASET_ROOT to the kubric movi_f dir}
# coordinator = first node in the allocation, fixed port
COORD_HOST=$(scontrol show hostnames "$SLURM_JOB_NODELIST" | head -n1)
export JAX_COORDINATOR_ADDRESS="${COORD_HOST}:12321"

srun python -m cotracker_tpu.training.trainer \
  --exp_dir "$EXP_DIR" \
  --dataset_root "$DATASET_ROOT" \
  --distributed \
  --coordinator_address "$JAX_COORDINATOR_ADDRESS" \
  --batch_size "${GLOBAL_BATCH:-32}" \
  --num_steps 50000 \
  --save_every_n_steps 5000 \
  --eval_every_n_steps 0
