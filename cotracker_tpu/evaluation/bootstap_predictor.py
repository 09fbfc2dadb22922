"""TAPIR / BootsTAPIR teacher wrapper (reference bootstap_predictor.py:17-65).

The reference wraps the external `tapnet` package's TAPIR model as a
distillation teacher: 256x256 input, (t, y, x) -> (t, x, y) query conversion,
occlusion -> visibility post-processing. tapnet is a JAX codebase, so when it
is installed this wrapper runs it natively; otherwise construction raises
with instructions (mirroring the reference's hard dependency).
"""

from typing import Optional, Tuple

import numpy as np


class TAPIRPredictor:
    def __init__(self, checkpoint: Optional[str] = None, resolution: Tuple[int, int] = (256, 256)):
        try:
            from tapnet.models import tapir_model  # noqa: F401
        except ImportError as e:
            raise ImportError(
                "TAPIRPredictor requires the external `tapnet` package "
                "(github.com/google-deepmind/tapnet). Install it and pass a "
                "BootsTAPIR checkpoint to use TAPIR as a distillation teacher."
            ) from e
        import haiku as hk
        import jax
        from tapnet.models import tapir_model

        self.resolution = resolution

        def forward(frames, query_points):
            model = tapir_model.TAPIR(bilinear_interp_with_depthwise_conv=False)
            return model(frames, query_points, query_chunk_size=64)

        self._fn = hk.transform_with_state(forward)
        params, state = None, None
        if checkpoint is not None:
            ckpt = np.load(checkpoint, allow_pickle=True).item()
            params, state = ckpt["params"], ckpt["state"]
        self._params, self._state = params, state
        self._apply = jax.jit(self._fn.apply)

    def __call__(self, video, queries):
        """video (1, T, 3, H, W) [0,255]; queries (1, N, 3) (t, x, y).
        Returns (tracks (1, T, N, 2) at input res, visibility probs)."""
        import jax

        B, T, C, H, W = video.shape
        rh, rw = self.resolution
        from cotracker_tpu.ops.bilinear import resize_bilinear
        import jax.numpy as jnp

        frames = jnp.asarray(video[0].transpose(0, 2, 3, 1))
        frames = resize_bilinear(frames, (rh, rw), align_corners=True)
        frames = frames / 127.5 - 1.0  # tapir convention

        q = np.array(queries[0], np.float32, copy=True)
        # (t, x, y) -> tapir's (t, y, x) in 256x256 raster
        qt = np.stack(
            [q[:, 0], q[:, 2] * (rh - 1) / (H - 1), q[:, 1] * (rw - 1) / (W - 1)], axis=-1
        )

        (out, _), _ = self._apply(
            self._params, self._state, jax.random.PRNGKey(0), frames[None], qt[None]
        ), None
        tracks = np.asarray(out["tracks"])[0].transpose(1, 0, 2)  # (T, N, 2) x,y
        occ = np.asarray(out["occlusion"])[0].transpose(1, 0)
        expd = np.asarray(out.get("expected_dist", np.zeros_like(occ)))
        vis = (1.0 / (1.0 + np.exp(occ))) * (1.0 / (1.0 + np.exp(expd[0].T if expd.ndim == 3 else expd)))
        tracks = tracks * np.array([(W - 1) / (rw - 1), (H - 1) / (rh - 1)])
        return tracks[None], vis[None]
