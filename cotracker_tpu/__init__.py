"""cotracker_tpu — a TPU-native point-tracking framework.

A from-scratch JAX/XLA/Pallas implementation of transformer point tracking
with the capabilities of CoTracker3 (reference: facebookresearch/co-tracker):
joint tracking of large point sets through video via a CNN feature pyramid,
local 4D correlation, and an iterative space-time transformer updater with
virtual-track cross attention — in both offline (single-window) and online
(streaming, constant-memory) modes.

Design stance (TPU-first, not a port):
  * functional core: models are pure functions over parameter pytrees
  * channel-last (NHWC) layouts throughout; latent dim 128 = one lane tile
  * static shapes + masking; streaming state is an explicit carry
  * hot ops (fused correlation sampling, attention) as Pallas kernels
  * scaling via jax.sharding Mesh("data", "track") + shard_map collectives
"""

__version__ = "0.1.0"
