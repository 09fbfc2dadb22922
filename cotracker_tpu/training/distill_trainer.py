"""End-to-end pseudo-label distillation trainer (reference
train_on_real_data.py:289-636, Lite.run).

Loop: real-video dataset -> SIFT/uniform query sampling -> random frozen
teacher pseudo-labels (host side) -> frozen-vis_conf_head student step
(device side, jitted once — query count is static at cfg.sift_size), with
checkpoint/auto-resume, TensorBoard logging, and optional mid-training
benchmark eval.
"""

import json
import os
import time
from dataclasses import dataclass, asdict
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from cotracker_tpu.training.distill import (
    DistillConfig,
    TeacherEnsemble,
    default_teacher_ensemble,
    distill_step_fn,
    make_distill_optimizer,
    sample_distill_queries,
)
from cotracker_tpu.training.trainer import (
    Logger,
    find_auto_resume,
    load_checkpoint,
    save_checkpoint,
    _parse_eval_specs,
)
from cotracker_tpu.training.train_utils import install_slurm_handlers, run_test_eval


@dataclass
class DistillTrainerArgs:
    exp_dir: str = "./outputs/distill"
    dataset_root: str = ""  # directory of local video files
    crop_size: Tuple[int, int] = (384, 512)
    seq_len: int = 64
    sift_size: int = 384
    num_steps: int = 15000
    lr: float = 5e-5
    wdecay: float = 1e-5
    train_iters: int = 4
    grad_clip: float = 10.0
    save_every_n_steps: int = 1000
    eval_every_n_steps: int = 0
    eval_datasets: str = ""  # "name=root,..." (see trainer.TrainerArgs)
    fast_eval: bool = True
    offline_model: bool = True
    model_window_len: int = 60
    train_only_visible: bool = False
    query_method: str = "sift"  # or "superpoint"
    seed: int = 0
    # student init: path to an imported checkpoint pickle or reference .pth
    restore_ckpt: str = ""
    # teacher checkpoints (reference ensemble train_on_real_data.py:396-438);
    # empty entries are skipped
    teacher_v21: str = ""
    teacher_v3_online: str = ""
    teacher_v3_offline: str = ""
    teacher_tapir: str = ""
    support_grid_size: int = 5


def _build_student(args: DistillTrainerArgs):
    from cotracker_tpu.models.build import build_cotracker, init_params
    from cotracker_tpu.models.cotracker3 import CoTrackerThree

    if args.restore_ckpt:
        return build_cotracker(
            args.restore_ckpt,
            offline=args.offline_model,
            window_len=args.model_window_len,
            model_resolution=args.crop_size,
        )
    model = CoTrackerThree(
        window_len=args.model_window_len, model_resolution=args.crop_size
    )
    return model, init_params(model, seed=args.seed)


def distill_train(
    args: DistillTrainerArgs,
    dataset=None,
    model=None,
    params=None,
    teacher: Optional[TeacherEnsemble] = None,
    eval_hook=None,
):
    """Run the distillation loop. dataset/model/params/teacher are injectable
    for tests; defaults build them from args."""
    install_slurm_handlers()
    os.makedirs(args.exp_dir, exist_ok=True)
    with open(os.path.join(args.exp_dir, "meta.json"), "w") as f:
        json.dump(asdict(args), f, indent=2)

    if dataset is None:
        from cotracker_tpu.datasets.real_videos import LocalVideoDataset

        dataset = LocalVideoDataset(
            data_root=args.dataset_root,
            crop_size=args.crop_size,
            seq_len=args.seq_len,
        )
    if model is None or params is None:
        model, params = _build_student(args)
    if teacher is None:
        teacher = default_teacher_ensemble(
            v21_checkpoint=args.teacher_v21 or None,
            v3_online_checkpoint=args.teacher_v3_online or None,
            v3_offline_checkpoint=args.teacher_v3_offline or None,
            tapir_checkpoint=args.teacher_tapir or None,
            support_grid_size=args.support_grid_size,
            seed=args.seed,
        )

    cfg = DistillConfig(
        iters=args.train_iters,
        lr=args.lr,
        wdecay=args.wdecay,
        num_steps=args.num_steps,
        grad_clip=args.grad_clip,
        sift_size=args.sift_size,
        offline_model=args.offline_model,
        sliding_window_len=args.model_window_len,
        train_only_visible=args.train_only_visible,
    )
    tx = make_distill_optimizer(params, cfg)
    opt_state = tx.init(params)

    step0 = 0
    ckpt_dir = os.path.join(args.exp_dir, "checkpoints")
    os.makedirs(ckpt_dir, exist_ok=True)
    resume = find_auto_resume(ckpt_dir)
    if resume:
        blob = load_checkpoint(resume)
        params = jax.tree_util.tree_map(jnp.asarray, blob["params"])
        opt_state = jax.tree_util.tree_map(
            lambda x: jnp.asarray(x) if hasattr(x, "shape") else x, blob["opt_state"]
        )
        step0 = blob["total_steps"]
        print(f"auto-resumed from {resume} at step {step0}")

    step_fn = jax.jit(distill_step_fn(model, tx, cfg), donate_argnums=(0, 1))
    logger = Logger(args.exp_dir)

    eval_specs = _parse_eval_specs(args.eval_datasets)
    if eval_hook is None and eval_specs:
        def eval_hook(p, step):
            return run_test_eval(
                model, p, eval_specs, args.exp_dir,
                n_iters=6, fast_eval=args.fast_eval,
                writer=logger.writer, step=step,
            )

    rng = np.random.default_rng(args.seed)
    order = rng.permutation(len(dataset))
    pos = 0

    t_start = time.time()
    step = step0
    while step < args.num_steps:
        if pos >= len(order):
            order = rng.permutation(len(dataset))
            pos = 0
        sample, gotit = dataset[int(order[pos])]
        pos += 1
        if not gotit:
            continue
        video_np = np.asarray(sample.video)[None]  # (1, T, 3, H, W)

        # host-side: queries (SIFT needs host pixels, reference :85-154)
        queries = sample_distill_queries(
            video_np, cfg.sift_size, rng, method=args.query_method
        )
        if (
            not np.isfinite(queries).all()
            or np.abs(queries).max() > 1500
        ):
            print("failed_sample: bad queries, skipping")
            continue
        # ONE device upload per step, shared by the teacher forward(s) and
        # the student step (round 5: the per-call video upload was the
        # teacher's bottleneck over the ~30 MB/s tunnel — 38 MB/call at the
        # reference distill shape; EvaluationPredictor keeps device-resident
        # videos resident)
        video_dev = jnp.asarray(video_np, jnp.float32)
        tracks_t, vis_t = teacher.pseudo_label(video_dev, queries)
        vis_bool = np.asarray(vis_t) > cfg.teacher_vis_threshold

        params, opt_state, aux = step_fn(
            params,
            opt_state,
            jnp.transpose(video_dev, (0, 1, 3, 4, 2)),
            jnp.asarray(queries),
            jnp.asarray(np.asarray(tracks_t), jnp.float32),
            jnp.asarray(vis_bool),
        )
        # Logger.push also appends the per-step scalars to train_log.jsonl
        # (round 5 — previously duplicated here)
        logger.push({k: v for k, v in aux.items()}, step)
        step += 1

        if args.save_every_n_steps and step % args.save_every_n_steps == 0:
            save_checkpoint(
                os.path.join(ckpt_dir, f"model_{step:09d}.pkl"), params, opt_state, step
            )
        if eval_hook is not None and args.eval_every_n_steps and (
            step % args.eval_every_n_steps == 0
        ):
            res = eval_hook(params, step)
            with open(os.path.join(args.exp_dir, "eval_records.jsonl"), "a") as f:
                f.write(json.dumps({"step": step, "results": res}, default=float) + "\n")

    save_checkpoint(os.path.join(ckpt_dir, "model_final.pkl"), params, opt_state, step)
    print(f"distillation done in {time.time() - t_start:.0f}s")
    return params


def main():
    import argparse

    p = argparse.ArgumentParser()
    for f in DistillTrainerArgs.__dataclass_fields__.values():
        if isinstance(f.default, bool):
            p.add_argument(f"--{f.name}", action="store_true" if not f.default else "store_false")
        elif isinstance(f.default, (int, float, str)):
            p.add_argument(f"--{f.name}", type=type(f.default), default=f.default)
    a = p.parse_args()
    known = {k: v for k, v in vars(a).items() if k in DistillTrainerArgs.__dataclass_fields__}
    distill_train(DistillTrainerArgs(**known))


if __name__ == "__main__":
    main()
