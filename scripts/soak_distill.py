"""Hardware soak of the distillation pipeline (BASELINE config 5 mechanics):
synthetic local videos -> SIFT/uniform queries -> a REAL teacher forward
(EvaluationPredictor over a random-weight CoTracker3-offline — no published
.pth exists in this environment) -> support strip -> jitted distill step
(frozen vis/conf head, grad clip 10) for a few steps on the chip.

Run: python scripts/soak_distill.py [--steps 2]
"""
import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def make_videos(root, n=2, T=24, hw=(192, 256)):
    import cv2

    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(3)
    for k in range(n):
        path = os.path.join(root, f"clip{k}.mp4")
        wr = cv2.VideoWriter(
            path, cv2.VideoWriter_fourcc(*"mp4v"), 12, (hw[1], hw[0])
        )
        # moving blobs so SIFT finds keypoints
        base = (rng.random((hw[0], hw[1], 3)) * 255).astype(np.uint8)
        for t in range(T):
            fr = np.roll(base, shift=3 * t, axis=1)
            wr.write(fr)
        wr.release()
    return root


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2)
    args = ap.parse_args()

    import jax
    from cotracker_tpu.datasets.real_videos import LocalVideoDataset
    from cotracker_tpu.evaluation.evaluation_predictor import EvaluationPredictor
    from cotracker_tpu.models.build import init_params
    from cotracker_tpu.models.cotracker3 import CoTrackerThree
    from cotracker_tpu.training.distill import TeacherEnsemble
    from cotracker_tpu.training.distill_trainer import (
        DistillTrainerArgs,
        distill_train,
    )

    HW = (192, 256)
    tmp = tempfile.mkdtemp(prefix="distill_soak_")
    root = make_videos(os.path.join(tmp, "videos"), hw=HW)

    # real teacher model (random weights): the full EvaluationPredictor
    # joint-mode forward runs on the chip per batch
    tmodel = CoTrackerThree(window_len=16, model_resolution=HW)
    tparams = init_params(tmodel, seed=7)
    tpred = EvaluationPredictor(
        tmodel, tparams, interp_shape=HW, grid_size=0, local_grid_size=0,
        single_point=False,
    )
    teacher = TeacherEnsemble(
        [lambda v, q: tpred(v, q)], support_grid_size=3, seed=0
    )

    dargs = DistillTrainerArgs(
        exp_dir=os.path.join(tmp, "exp"), dataset_root=root, crop_size=HW,
        seq_len=16, sift_size=48, num_steps=args.steps, train_iters=4,
        offline_model=True, model_window_len=16, save_every_n_steps=10**9,
    )
    ds = LocalVideoDataset(root, crop_size=HW, seq_len=16,
                           random_frame_rate=False)
    model = CoTrackerThree(window_len=16, model_resolution=HW)
    params = init_params(model, seed=0)

    t0 = time.time()
    distill_train(dargs, dataset=ds, model=model, params=params, teacher=teacher)
    print(f"distill soak: {args.steps} steps ok in {time.time() - t0:.1f}s "
          f"(incl. compiles) on {jax.devices()[0].platform}")


if __name__ == "__main__":
    main()
