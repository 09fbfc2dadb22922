from cotracker_tpu.models.build import build_cotracker  # noqa: F401
