"""Model zoo surface (mirrors reference hubconf.py:9-119).

The reference loads published checkpoints from HuggingFace URLs via
torch.hub. This environment has no network egress, so constructors accept a
local checkpoint path; when given a URL-shaped string they explain how to
fetch it. All published CoTracker3 checkpoints (.pth) import directly via
models/checkpoint.py.
"""

from typing import Optional

CHECKPOINT_URLS = {
    "cotracker3_offline": "https://huggingface.co/facebook/cotracker3/resolve/main/scaled_offline.pth",
    "cotracker3_online": "https://huggingface.co/facebook/cotracker3/resolve/main/scaled_online.pth",
    "baseline_offline": "https://huggingface.co/facebook/cotracker3/resolve/main/baseline_offline.pth",
    "baseline_online": "https://huggingface.co/facebook/cotracker3/resolve/main/baseline_online.pth",
    "cotracker2": "https://huggingface.co/facebook/cotracker/resolve/main/cotracker2.pth",
    "cotracker2v1": "https://huggingface.co/facebook/cotracker/resolve/main/cotracker2v1.pth",
}


def _resolve(checkpoint: Optional[str], name: str) -> Optional[str]:
    if checkpoint and checkpoint.startswith(("http://", "https://")):
        raise ValueError(
            f"no network egress here; download {CHECKPOINT_URLS.get(name, checkpoint)} "
            "manually and pass the local path"
        )
    return checkpoint


def cotracker3_offline(checkpoint: Optional[str] = None, **kw):
    """Offline CoTracker3 predictor (window_len=60)."""
    from cotracker_tpu.predictor import CoTrackerPredictor

    return CoTrackerPredictor(
        checkpoint=_resolve(checkpoint, "cotracker3_offline"), offline=True, window_len=60, **kw
    )


def cotracker3_online(checkpoint: Optional[str] = None, **kw):
    """Online (streaming) CoTracker3 predictor (window_len=16, step 8)."""
    from cotracker_tpu.predictor import CoTrackerOnlinePredictor

    return CoTrackerOnlinePredictor(
        checkpoint=_resolve(checkpoint, "cotracker3_online"), window_len=16, **kw
    )


def cotracker2(checkpoint: Optional[str] = None, **kw):
    """Legacy CoTracker2 offline predictor (window_len=8; reference
    hubconf.py:43,72-77)."""
    from cotracker_tpu.predictor import CoTrackerPredictor

    return CoTrackerPredictor(
        checkpoint=_resolve(checkpoint, "cotracker2"), window_len=8, v2=True, **kw
    )


def cotracker2_online(checkpoint: Optional[str] = None, **kw):
    """Legacy CoTracker2 online predictor (window_len=8, step 4; reference
    hubconf.py:30,79-84)."""
    from cotracker_tpu.predictor import CoTrackerOnlinePredictor

    return CoTrackerOnlinePredictor(
        checkpoint=_resolve(checkpoint, "cotracker2"), window_len=8, v2=True, **kw
    )


def cotracker2v1(checkpoint: Optional[str] = None, **kw):
    """Legacy CoTracker2.1 offline predictor (window_len=16; reference
    hubconf.py:45,86-93)."""
    from cotracker_tpu.predictor import CoTrackerPredictor

    return CoTrackerPredictor(
        checkpoint=_resolve(checkpoint, "cotracker2v1"), window_len=16, v2=True, **kw
    )


def cotracker2v1_online(checkpoint: Optional[str] = None, **kw):
    """Legacy CoTracker2.1 online predictor (window_len=16, step 8; reference
    hubconf.py:33,95-102)."""
    from cotracker_tpu.predictor import CoTrackerOnlinePredictor

    return CoTrackerOnlinePredictor(
        checkpoint=_resolve(checkpoint, "cotracker2v1"), window_len=16, v2=True, **kw
    )
