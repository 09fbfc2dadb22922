"""Supervised training harness (reference train_on_kubric.py:230-515).

Pure-JAX training loop over the Kubric dataset: AdamW + OneCycle, grad-clip,
gamma-discounted losses, checkpoint/auto-resume, TensorBoard logging,
periodic benchmark evaluation, data-parallel + track-sharded via the
("data", "track") mesh when multiple devices are present.

Replaces LightningLite/DDP/NCCL (reference train_on_kubric.py:698-706) with
jax.sharding: gradients are psum-reduced by XLA across the mesh.
"""

import json
import os
import pickle
import time
from dataclasses import dataclass, asdict
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from cotracker_tpu.training.train_step import (
    TrainConfig,
    make_optimizer,
    make_train_step,
)


@dataclass
class TrainerArgs:
    exp_dir: str = "./outputs/train"
    dataset_root: str = ""
    batch_size: int = 1
    seq_len: int = 24
    traj_per_sample: int = 768
    num_steps: int = 50000
    lr: float = 5e-4
    wdecay: float = 1e-5
    train_iters: int = 4
    save_every_n_steps: int = 5000
    # mid-training benchmark eval cadence (reference train_on_kubric.py:455-493)
    eval_every_n_steps: int = 0
    evaluate_at_start: bool = False
    # comma-separated name=root eval dataset specs, e.g.
    # "tapvid_davis_first=/data/tapvid_davis/tapvid_davis.pkl"
    eval_datasets: str = ""
    fast_eval: bool = True
    # save track-overlay videos of a train batch every N steps
    # (reference train_on_kubric.py:409-443)
    save_vis_every_n_steps: int = 0
    # input pipeline (reference: 10-worker DataLoader + x4 concat,
    # train_on_kubric.py:313-325, utils/train_utils.py:97-121)
    num_loader_workers: int = 4
    loader_prefetch: int = 4
    dataset_repeats: int = 4
    crop_size: Tuple[int, int] = (384, 512)
    offline_model: bool = True
    model_window_len: int = 60
    use_augs: bool = True
    seed: int = 0
    add_huber_loss: bool = False
    train_only_on_visible: bool = False
    query_sampling_method: str = "first_visible"
    mesh_shape: Optional[Tuple[int, int]] = None  # (data, track)
    # run the correlation featurizer as the Pallas TPU kernel with its
    # XLA-vjp backward (corr_pallas.fused_corr_embs_pallas_trainable) and
    # remat each update iteration — the fast-forward training config.
    # Requires a TPU backend (kernels don't run on CPU).
    use_pallas_corr: bool = False
    # int8 window transfer on the Pallas training forward (the backward is
    # the full-precision XLA vjp — a straight-through estimator; this is
    # the 489 ms/step configuration of scripts/bench_train_step.py, vs the
    # f32-window kernel which also costs 4x the window VMEM)
    corr_quant_int8: bool = True
    # rematerialize update iterations even on the XLA path (activation
    # memory for real shapes; implied by use_pallas_corr)
    remat_iterations: bool = False
    # multi-host: jax.distributed.initialize before building the mesh; each
    # host loads batch_size // process_count rows (SURVEY §2.7-1). The
    # coordinator/process topology comes from args or SLURM env vars
    # (see parallel/distributed.py).
    distributed: bool = False
    coordinator_address: str = ""
    num_processes: int = 0
    process_id: int = -1


class Logger:
    """Console + TensorBoard scalar logging (reference train_utils.py:200-255)."""

    def __init__(self, exp_dir):
        self.exp_dir = exp_dir
        self.writer = None
        try:
            from torch.utils.tensorboard import SummaryWriter

            self.writer = SummaryWriter(log_dir=os.path.join(exp_dir, "runs"))
        except Exception:
            pass
        self.running = {}
        self.count = 0
        # machine-readable per-step scalars beside the TB events: harness
        # scripts (scripts/soak_train.py) assert on loss curves / resume
        # continuity without a TB reader
        self.jsonl = os.path.join(exp_dir, "train_log.jsonl")

    def push(self, metrics, step):
        self.count += 1
        vals = {k: float(v) for k, v in metrics.items()}
        for k, v in vals.items():
            self.running[k] = self.running.get(k, 0.0) + v
            if self.writer is not None:
                self.writer.add_scalar(k, v, step)
        with open(self.jsonl, "a") as f:
            f.write(json.dumps({"step": step, "t": time.time(), **vals}) + "\n")
        if self.count % 100 == 0:
            means = {k: v / 100 for k, v in self.running.items()}
            print(f"step {step}: " + ", ".join(f"{k}={v:.4f}" for k, v in means.items()))
            self.running = {}


def save_checkpoint(path, params, opt_state, step):
    """Pickle-based checkpoint of the param/opt pytrees + step counter
    (reference torch.save dict, train_on_kubric.py:459-475)."""
    blob = {
        "params": jax.tree_util.tree_map(np.asarray, params),
        "opt_state": jax.tree_util.tree_map(
            lambda x: np.asarray(x) if hasattr(x, "shape") else x, opt_state
        ),
        "total_steps": step,
    }
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(blob, f)
    os.replace(tmp, path)


def load_checkpoint(path):
    with open(path, "rb") as f:
        return pickle.load(f)


def find_auto_resume(ckpt_dir):
    """Newest non-final checkpoint in ckpt_dir (reference auto-resume,
    train_on_kubric.py:333-355)."""
    if not os.path.isdir(ckpt_dir):
        return None
    cands = [
        os.path.join(ckpt_dir, f)
        for f in os.listdir(ckpt_dir)
        if f.endswith(".pkl") and "final" not in f
    ]
    return max(cands, key=os.path.getmtime) if cands else None


def batch_iterator(dataset, batch_size, rng):
    """Synchronous infinite shuffled iterator with failed-sample skipping
    (reference gotit handling, train_on_kubric.py:391-394). Prefer
    data_loader.PrefetchLoader for real runs — this stalls the device on
    decode."""
    from cotracker_tpu.training.data_loader import collate_batch

    order = rng.permutation(len(dataset))
    i = 0
    while True:
        samples = []
        while len(samples) < batch_size:
            if i >= len(order):
                order = rng.permutation(len(dataset))
                i = 0
            s, gotit = dataset[int(order[i])]
            i += 1
            if gotit:
                samples.append(s)
        yield collate_batch(samples)


def _parse_eval_specs(spec: str):
    out = {}
    for part in filter(None, (p.strip() for p in spec.split(","))):
        name, _, root = part.partition("=")
        out[name] = root
    return out


def train(args: TrainerArgs, dataset=None, model=None, eval_hook=None, vis_hook=None):
    from cotracker_tpu.models.cotracker3 import CoTrackerThree
    from cotracker_tpu.models.build import init_params
    from cotracker_tpu.parallel.mesh import make_mesh, sharded_train_step, replicate
    from cotracker_tpu.training.data_loader import PrefetchLoader, RepeatedDataset
    from cotracker_tpu.training.train_utils import install_slurm_handlers, run_test_eval

    install_slurm_handlers()  # SIGUSR1 requeue / SIGTERM bypass under SLURM

    main_process = True
    if args.distributed:
        from cotracker_tpu.parallel import distributed as dist

        pid, n_proc = dist.initialize(
            coordinator_address=args.coordinator_address or None,
            num_processes=args.num_processes or None,
            process_id=args.process_id if args.process_id >= 0 else None,
        )
        main_process = pid == 0
        print(f"distributed: process {pid}/{n_proc}, "
              f"{jax.local_device_count()} local / {jax.device_count()} global devices")

    os.makedirs(args.exp_dir, exist_ok=True)
    if main_process:
        with open(os.path.join(args.exp_dir, "meta.json"), "w") as f:
            json.dump(asdict(args), f, indent=2)

    if dataset is None:
        from cotracker_tpu.datasets.kubric import KubricMovifDataset

        dataset = KubricMovifDataset(
            data_root=args.dataset_root,
            crop_size=args.crop_size,
            seq_len=args.seq_len,
            traj_per_sample=args.traj_per_sample,
            use_augs=args.use_augs,
            random_seq_len=not args.offline_model,
            random_frame_rate=not args.offline_model,
            seed=args.seed,
        )

    if model is None:
        model = CoTrackerThree(
            window_len=args.model_window_len,
            model_resolution=args.crop_size,
            use_pallas_corr=args.use_pallas_corr,
            corr_pallas_grad=args.use_pallas_corr,
            corr_quant_int8=args.use_pallas_corr and args.corr_quant_int8,
            remat_iterations=args.remat_iterations or args.use_pallas_corr,
        )
    params = init_params(model, seed=args.seed)

    cfg = TrainConfig(
        iters=args.train_iters,
        add_huber_loss=args.add_huber_loss,
        train_only_on_visible=args.train_only_on_visible,
        offline_model=args.offline_model,
        # online model: loss windows must match the model's sliding window
        sliding_window_len=args.model_window_len,
        query_sampling_method=args.query_sampling_method,
    )
    tx, schedule = make_optimizer(args.lr, args.wdecay, args.num_steps)
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

    n_dev = len(jax.devices())
    mesh = None
    if n_dev > 1:
        shape = args.mesh_shape
        if shape is None:
            # default: as much data-parallelism as the batch divides into,
            # remaining devices shard the track axis
            import math

            d = math.gcd(args.batch_size, n_dev)
            shape = (d, n_dev // d)
        if args.batch_size % shape[0] or args.traj_per_sample % shape[1]:
            raise ValueError(
                f"batch {args.batch_size} / tracks {args.traj_per_sample} "
                f"don't shard over mesh {shape}"
            )
        mesh = make_mesh(shape)
        if args.use_pallas_corr or getattr(model, "track_axis", None):
            # pallas_call is not GSPMD-partitionable — the fast path runs
            # under shard_map instead: kernels per-shard on local N, the
            # virtual-token psum as the only collective, losses psum'ed to
            # the global masked means (parallel/mesh.py).
            from cotracker_tpu.parallel.mesh import make_fast_sharded_train_step

            # the step uses a track_axis clone (same params); `model` itself
            # stays axis-free so the eval hook can apply it outside shard_map
            smodel = (
                model if getattr(model, "track_axis", None)
                else model.clone(track_axis="track")
            )
            step_fn = make_fast_sharded_train_step(smodel, tx, cfg, mesh)
        else:
            step_fn = sharded_train_step(make_train_step(model, tx, cfg), mesh)
        params = replicate(mesh, params)
        opt_state = replicate(mesh, opt_state)
        print(f"training on mesh {dict(mesh.shape)}")
    else:
        step_fn = jax.jit(make_train_step(model, tx, cfg), donate_argnums=(0, 1))

    logger = Logger(args.exp_dir)

    # mid-training benchmark eval (reference train_on_kubric.py:455-493 ->
    # run_test_eval). Injectable for tests; default wires eval_datasets specs.
    eval_specs = _parse_eval_specs(args.eval_datasets)
    if eval_hook is None and eval_specs:
        def eval_hook(p, step):
            return run_test_eval(
                model, p, eval_specs, args.exp_dir,
                n_iters=6, fast_eval=args.fast_eval,
                writer=logger.writer, step=step,
            )

    eval_records_path = os.path.join(args.exp_dir, "eval_records.jsonl")

    last_eval_step = [-1]

    def run_eval(p, step):
        if eval_hook is None or last_eval_step[0] == step:
            return None
        last_eval_step[0] = step
        res = eval_hook(p, step)
        with open(eval_records_path, "a") as f:
            f.write(json.dumps({"step": step, "results": res}, default=float) + "\n")
        print(f"eval @ step {step}: {res}")
        return res

    # track-overlay visualization of a train batch on cadence
    # (reference train_on_kubric.py:409-443). Injectable for tests.
    if vis_hook is None and args.save_vis_every_n_steps:
        from cotracker_tpu.utils.visualizer import Visualizer

        visualizer = Visualizer(save_dir=args.exp_dir, fps=6)
        fwd = jax.jit(
            lambda p, video, queries: model.apply(
                {"params": p}, video, queries, iters=cfg.iters
            )[:2]
        )

        def vis_hook(p, batch, step):
            vis_g = np.asarray(batch["vis_g"])
            first_vis = np.argmax(vis_g, axis=1)  # (B, N)
            trajs = np.asarray(batch["trajs_g"])
            xys = np.take_along_axis(trajs, first_vis[:, None, :, None], axis=1)[:, 0]
            queries = jnp.asarray(
                np.concatenate([first_vis[..., None], xys], axis=-1), jnp.float32
            )
            tracks, vis = fwd(p, batch["video"], queries)
            video_tchw = np.asarray(batch["video"]).transpose(0, 1, 4, 2, 3)
            visualizer.visualize(
                video_tchw, np.asarray(tracks), np.asarray(vis) > 0.5,
                filename=f"train_step_{step}", writer=logger.writer, step=step,
            )

    # per-host data loading: each process draws its own batch rows with a
    # process-offset RNG (DistributedSampler equivalent, SURVEY §2.7-1)
    local_batch = args.batch_size
    if args.distributed:
        from cotracker_tpu.parallel import distributed as dist
        from cotracker_tpu.parallel.mesh import BATCH_PSPECS

        n_proc = jax.process_count()
        assert args.batch_size % n_proc == 0, (
            f"global batch {args.batch_size} does not divide over {n_proc} hosts"
        )
        local_batch = args.batch_size // n_proc
    rng_np = np.random.default_rng(
        args.seed + (jax.process_index() * 7919 if args.distributed else 0)
    )
    loader = PrefetchLoader(
        RepeatedDataset(dataset, args.dataset_repeats) if args.dataset_repeats > 1 else dataset,
        local_batch,
        rng_np,
        num_workers=args.num_loader_workers,
        prefetch=args.loader_prefetch,
    )
    key = jax.random.PRNGKey(args.seed)

    if main_process and args.evaluate_at_start and step0 == 0:
        run_eval(params, 0)

    t_start = time.time()
    sub_cache = []
    try:
        for step in range(step0, args.num_steps):
            batch_np = next(loader)
            if args.distributed:
                batch = dist.global_batch(mesh, dict(BATCH_PSPECS), batch_np)
            else:
                batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
            # split step keys in batches: jax.random.split is an eager op —
            # one dispatch round trip PER STEP on remote-compile backends
            # (~100 ms over the axon tunnel, ~20% of a train step)
            if not sub_cache:
                keys = jax.random.split(key, 65)
                key, sub_cache = keys[0], list(keys[1:])
            sub = sub_cache.pop()
            params, opt_state, aux = step_fn(params, opt_state, sub, batch)
            if main_process:
                logger.push({k: v for k, v in aux.items()}, step)

            if main_process and args.save_every_n_steps and (
                (step + 1) % args.save_every_n_steps == 0
            ):
                save_checkpoint(
                    os.path.join(ckpt_dir, f"model_{step + 1:09d}.pkl"), params, opt_state, step + 1
                )
            if main_process and args.eval_every_n_steps and (
                (step + 1) % args.eval_every_n_steps == 0
            ):
                run_eval(params, step + 1)
            if main_process and vis_hook is not None and args.save_vis_every_n_steps and (
                (step + 1) % args.save_vis_every_n_steps == 0
            ):
                # in distributed mode hand the hook this host's local rows —
                # global sharded arrays are not addressable from one process
                vis_hook(
                    params,
                    batch if not args.distributed
                    else {k: jnp.asarray(v) for k, v in batch_np.items()},
                    step + 1,
                )
    finally:
        loader.close()
    if main_process:
        save_checkpoint(
            os.path.join(ckpt_dir, "model_final.pkl"), params, opt_state, args.num_steps
        )
        if eval_hook is not None and args.eval_every_n_steps:
            run_eval(params, args.num_steps)
    print(f"training done in {time.time() - t_start:.0f}s")
    return params


def main():
    import argparse

    p = argparse.ArgumentParser()
    for f in TrainerArgs.__dataclass_fields__.values():
        if isinstance(f.default, bool):
            p.add_argument(f"--{f.name}", action="store_true" if not f.default else "store_false")
        elif isinstance(f.default, (int, float, str)):
            p.add_argument(f"--{f.name}", type=type(f.default), default=f.default)
    a = p.parse_args()
    known = {k: v for k, v in vars(a).items() if k in TrainerArgs.__dataclass_fields__}
    train(TrainerArgs(**known))


if __name__ == "__main__":
    main()
