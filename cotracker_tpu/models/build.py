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
    model_resolution: Tuple[int, int] = (384, 512),
    v2: bool = False,
    fast: bool = False,
):
    """Build a CoTracker model definition and parameters (mirrors the
    reference factory's v2/offline/online switch, build_cotracker.py:26-45).

    checkpoint: path to a reference .pth state_dict (imported via
    models/checkpoint.py) or None for fresh random init.
    fast: enable the TPU inference hot path — bf16 compute (f32 params and
    coords/vis/conf carries), the Pallas correlation and time-attention
    kernels, int8 window transfer, and N-chunking. Inference-only as built
    here (the attention kernels have no gradient rules); numerics differ
    from the f32 XLA path at bf16/quantization noise level. For training
    with the fast corr kernel, construct CoTrackerThree directly with
    use_pallas_corr + corr_pallas_grad + remat_iterations (see
    training/trainer.py TrainerArgs.use_pallas_corr).
    Returns (model_def, params).
    """
    if fast and jax.devices()[0].platform == "cpu":
        raise ValueError(
            "fast=True enables the Pallas TPU kernels, which cannot run on "
            "the CPU backend (they would fail deep inside compilation). "
            "Use fast=False for CPU, or run on a TPU."
        )
    if v2:
        from cotracker_tpu.models.cotracker2 import CoTracker2

        model = CoTracker2(
            window_len=window_len or 8,
            dtype=jnp.bfloat16 if fast else dtype,
            model_resolution=model_resolution,
        )
    else:
        if window_len is None:
            window_len = 60 if offline else 16
        fast_kw = dict(
            dtype=jnp.bfloat16, corr_chunk=2048,
            use_pallas_corr=True, corr_quant_int8=True, corr_fuse_combine=True,
            fold_input_proj=True, use_pallas_attn=True, attn_quant_int8=True,
            # long-video guard: beyond 64 frames the 8x shifted-copy prepack
            # is built per 64-frame slab inside the iteration instead of
            # whole-video (bounds live prepack memory; <= 64 is unaffected)
            prepack_t_slab=64,
        ) if fast else dict(dtype=dtype)
        model = CoTrackerThree(
            window_len=window_len, model_resolution=model_resolution, **fast_kw
        )

    if checkpoint is not None:
        from cotracker_tpu.models.checkpoint import load_torch_checkpoint

        params = load_torch_checkpoint(checkpoint, v2=v2)
    else:
        params = init_params(model)
    return model, params


def init_params(model, seed: int = 0):
    """Random-initialize a parameter tree by tracing a tiny forward."""
    if getattr(model, "track_axis", None) is not None:
        # track_axis models only run inside shard_map (their psum axis is
        # unbound here); the param tree is identical without it
        model = model.clone(track_axis=None)
    rng = jax.random.PRNGKey(seed)
    # tiny shapes are fine: params are shape-independent of T/N/H/W except
    # the encoder convs (channel-only) and dense layers (feature-only).
    # init is jitted into ONE compile — eager init would dispatch hundreds of
    # tiny ops, each a slow round-trip on remote-compile TPU backends.
    video = jnp.zeros((1, 2, model.stride * 8, model.stride * 8, 3), jnp.float32)
    queries = jnp.zeros((1, 1, 3), jnp.float32)
    init_fn = jax.jit(lambda r, v, q: model.init(r, v, q, iters=1))
    variables = init_fn(rng, video, queries)
    return jax.tree_util.tree_map(lambda x: x, variables["params"])
