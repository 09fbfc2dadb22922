"""Training auxiliaries: SLURM signal handling, eval-during-training.

Mirrors reference cotracker/utils/train_utils.py: SIGUSR1 -> requeue own job,
SIGTERM -> bypass (:21-31); run_test_eval wraps the model in an
EvaluationPredictor and runs benchmark datasets (:139-197).
"""

import os
import signal
import socket
import subprocess
from typing import Dict, Optional


def sig_handler(signum, frame):
    """SIGUSR1: requeue the SLURM job before preemption (reference
    train_utils.py:21-27)."""
    print("caught signal", signum, socket.gethostname(), os.getpid())
    job_id = os.environ.get("SLURM_JOB_ID")
    if job_id and os.environ.get("SLURM_PROCID", "0") == "0":
        print(f"requeuing job {job_id}")
        subprocess.run(["scontrol", "requeue", job_id], check=False)
    os._exit(0)


def term_handler(signum, frame):
    """SIGTERM: ignore, let SIGUSR1 handle preemption (reference :29-31)."""
    print("bypassing sigterm")


def install_slurm_handlers():
    signal.signal(signal.SIGUSR1, sig_handler)
    signal.signal(signal.SIGTERM, term_handler)


def run_test_eval(
    model,
    params,
    dataset_specs: Dict[str, str],
    exp_dir: str,
    single_point: bool = False,
    n_iters: int = 6,
    fast_eval: bool = True,
    writer=None,
    step: Optional[int] = None,
):
    """Evaluate the current params on benchmark datasets mid-training
    (reference train_utils.py:139-197).

    dataset_specs: {dataset_name: dataset_root}, e.g.
    {"tapvid_davis_first": "/data/tapvid_davis/tapvid_davis.pkl"}.
    Returns {dataset_name: avg-metrics dict}; logs scalars to `writer`.
    """
    from cotracker_tpu.datasets.tap_vid import TapVidDataset
    from cotracker_tpu.evaluation.evaluation_predictor import EvaluationPredictor
    from cotracker_tpu.evaluation.evaluator import Evaluator

    results = {}
    predictor = EvaluationPredictor(
        model, params, single_point=single_point, n_iters=n_iters
    )
    evaluator = Evaluator(exp_dir)
    for name, root in dataset_specs.items():
        dataset_type = name.split("_")[1] if "tapvid" in name else name
        ds = TapVidDataset(
            data_root=root,
            dataset_type=dataset_type,
            queried_first="strided" not in name,
            fast_eval=fast_eval,
        )
        metrics = evaluator.evaluate_sequence(predictor, ds, dataset_name=name, verbose=False)
        results[name] = metrics.get("avg", {})
        if writer is not None and step is not None:
            for k, v in results[name].items():
                writer.add_scalar(f"eval/{name}/{k}", v, step)
    return results
