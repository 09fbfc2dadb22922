"""Model factory (mirrors reference build_cotracker, build_cotracker.py:26-45)."""

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from cotracker_tpu.models.cotracker3 import CoTrackerThree


def build_cotracker(
    checkpoint: Optional[str] = None,
    offline: bool = True,
    window_len: Optional[int] = None,
    dtype: Any = jnp.float32,
) -> Tuple[CoTrackerThree, Any]:
    """Build a CoTracker3 model definition and parameters.

    checkpoint: path to a reference .pth state_dict (imported via
    models/checkpoint.py) or None for fresh random init.
    Returns (model_def, params).
    """
    if window_len is None:
        window_len = 60 if offline else 16
    model = CoTrackerThree(window_len=window_len, dtype=dtype)

    if checkpoint is not None:
        from cotracker_tpu.models.checkpoint import load_torch_checkpoint

        params = load_torch_checkpoint(checkpoint)
    else:
        params = init_params(model)
    return model, params


def init_params(model: CoTrackerThree, seed: int = 0):
    """Random-initialize a parameter tree by tracing a tiny forward."""
    rng = jax.random.PRNGKey(seed)
    h, w = model.model_resolution
    # tiny shapes are fine: params are shape-independent of T/N/H/W except
    # the encoder convs (channel-only) and dense layers (feature-only)
    video = jnp.zeros((1, 2, model.stride * 8, model.stride * 8, 3), jnp.float32)
    queries = jnp.zeros((1, 1, 3), jnp.float32)
    variables = model.init(rng, video, queries, iters=1)
    return variables["params"]
