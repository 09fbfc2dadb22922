"""Worker process for the 2-process multi-host CPU test (not a pytest file).

Runs the real trainer in distributed mode on a shared synthetic Kubric dir,
then prints a checksum of the trained params so the test can assert both
processes converged to identical replicated state.
"""

import argparse
import sys


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--coordinator", required=True)
    p.add_argument("--num_processes", type=int, required=True)
    p.add_argument("--process_id", type=int, required=True)
    p.add_argument("--data_root", required=True)
    p.add_argument("--exp_dir", required=True)
    a = p.parse_args()

    import numpy as np
    import jax

    from cotracker_tpu.training.trainer import TrainerArgs, train
    from cotracker_tpu.models.cotracker3 import CoTrackerThree
    from cotracker_tpu.datasets.kubric import KubricMovifDataset

    args = TrainerArgs(
        exp_dir=a.exp_dir,
        batch_size=2,  # global; 1 row per host
        seq_len=8,
        traj_per_sample=8,
        num_steps=2,
        train_iters=1,
        save_every_n_steps=0,
        crop_size=(32, 32),
        model_window_len=8,
        use_augs=False,
        num_loader_workers=1,
        dataset_repeats=1,
        distributed=True,
        coordinator_address=a.coordinator,
        num_processes=a.num_processes,
        process_id=a.process_id,
    )
    ds = KubricMovifDataset(
        data_root=a.data_root, crop_size=(32, 32), seq_len=8,
        traj_per_sample=8, use_augs=False,
    )
    model = CoTrackerThree(window_len=8, model_resolution=(32, 32))
    params = train(args, dataset=ds, model=model)

    leaves = jax.tree_util.tree_leaves(params)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    checksum = float(sum(float(np.sum(np.asarray(l, np.float64))) for l in leaves))
    print(f"MULTIHOST_OK process={a.process_id} checksum={checksum:.6f}")
    sys.stdout.flush()


if __name__ == "__main__":
    main()
