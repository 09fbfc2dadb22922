"""TAPIR / BootsTAPIR teacher wrapper (reference
cotracker/models/bootstap_predictor.py:17-65).

The reference wraps the external `tapnet` TAPIR model as a distillation
teacher: 256x256 input, (t, x, y) -> (t, y, x) query conversion with
plain-ratio coordinate rescale, and visibility =
(1 - sigmoid(occlusion)) * (1 - sigmoid(expected_dist)) > 0.5
(reference postprocess_occlusions, bootstap_predictor.py:12-14).

`model_fn` is injectable so the conversion/rescale semantics are testable
without tapnet installed; when omitted, the tapnet JAX model is built
(tapnet is a JAX codebase, so it runs natively here).
"""

from typing import Callable, Optional, Tuple

import numpy as np


def postprocess_occlusions(occlusions, expected_dist):
    """visibles = (1-sigmoid(occ)) * (1-sigmoid(expd)) > 0.5 (reference
    bootstap_predictor.py:12-14). Inputs are logits, any matching shape."""
    sig = lambda x: 1.0 / (1.0 + np.exp(-x))
    return (1.0 - sig(occlusions)) * (1.0 - sig(expected_dist)) > 0.5


class TAPIRPredictor:
    """Callable (video (1,T,3,H,W) [0,255], queries (1,N,3) (t,x,y)) ->
    (tracks (1,T,N,2) at input resolution, visibility (1,T,N) {0,1} floats).

    model_fn: (frames (1,T,rh,rw,3) in [-1,1], query_points (1,N,3) (t,y,x)
    in raster units) -> dict with "tracks" (1,N,T,2) (x,y in model raster),
    "occlusion" (1,N,T) logits, "expected_dist" (1,N,T) logits — the tapnet
    TAPIR output contract.
    """

    def __init__(
        self,
        checkpoint: Optional[str] = None,
        resolution: Tuple[int, int] = (256, 256),
        model_fn: Optional[Callable] = None,
    ):
        self.resolution = resolution
        if model_fn is not None:
            self._model_fn = model_fn
            return
        try:
            from tapnet.models import tapir_model  # noqa: F401
        except ImportError as e:
            raise ImportError(
                "TAPIRPredictor requires the external `tapnet` package "
                "(github.com/google-deepmind/tapnet). Install it and pass a "
                "BootsTAPIR checkpoint, or inject model_fn."
            ) from e
        import haiku as hk
        import jax
        from tapnet.models import tapir_model

        def forward(frames, query_points):
            model = tapir_model.TAPIR(bilinear_interp_with_depthwise_conv=False)
            return model(frames, query_points, query_chunk_size=64)

        fn = hk.transform_with_state(forward)
        key = jax.random.PRNGKey(0)
        if checkpoint is not None:
            ckpt = np.load(checkpoint, allow_pickle=True).item()
            params, state = ckpt["params"], ckpt["state"]
        else:
            # random init — lets the distillation wiring run end-to-end
            # (toy shapes) before a BootsTAPIR checkpoint is available
            rh, rw = resolution
            params, state = fn.init(
                key,
                np.zeros((1, 2, rh, rw, 3), np.float32),
                np.zeros((1, 1, 3), np.float32),
            )
        apply = jax.jit(fn.apply)

        def model_fn(frames, query_points):
            out, _ = apply(params, state, key, frames, query_points)
            return out

        self._model_fn = model_fn

    def __call__(self, video, queries):
        B, T, C, H, W = video.shape
        assert B == 1
        rh, rw = self.resolution

        import jax.numpy as jnp
        from cotracker_tpu.ops.bilinear import resize_bilinear

        frames = jnp.asarray(np.asarray(video)[0].transpose(0, 2, 3, 1))
        frames = resize_bilinear(frames, (rh, rw), align_corners=False)
        frames = (frames / 255.0) * 2.0 - 1.0  # tapir convention

        # (t, x, y) -> tapir's (t, y, x), plain-ratio rescale (reference
        # bootstap_predictor.py:43-49: q_x *= 256/W then swap to (t, y, x))
        q = np.array(np.asarray(queries)[0], np.float32, copy=True)
        qt = np.stack(
            [q[:, 0], q[:, 2] * rh / H, q[:, 1] * rw / W], axis=-1
        )

        out = self._model_fn(np.asarray(frames)[None], qt[None])
        tracks = np.asarray(out["tracks"])[0].transpose(1, 0, 2)  # (T, N, 2) x,y
        occ = np.asarray(out["occlusion"])[0].T  # (T, N)
        expd = np.asarray(out["expected_dist"])[0].T  # (T, N)
        vis = postprocess_occlusions(occ, expd).astype(np.float32)
        # model raster -> input resolution (reference :62-64)
        tracks = tracks * np.array([W / rw, H / rh], np.float32)
        return tracks[None], vis[None]
