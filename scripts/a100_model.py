"""A100 reference-throughput model (substantiates bench.py A100_REF_PFS).

No A100 exists in this environment, so the baseline "reference points*frames/s
on one A100" is a roofline MODEL of the reference implementation
(/root/reference, eager fp32 torch -> TF32 tensor cores), built in two steps:

1. FLOP model of one offline forward (fnet + per-iter corr + updateformer),
   VALIDATED against torch.profiler's with_flops accounting of the actual
   reference model at small shapes (run this script: the two numbers must
   agree within ~15%).
2. Throughput assumptions per component, from public A100 characteristics
   (80GB SXM: 156 TF/s TF32 peak, ~2.0 TB/s HBM):
     - big clean matmuls (corr MLP, transformer proj/MLP): 95 TF/s  (~60%)
     - batched tiny matmuls (49x49x128 corr einsum):        30 TF/s
     - conv stack (cuDNN):                                  70 TF/s
     - gather/scatter (grid_sample) + corr-volume traffic: 1.3 TB/s effective
   plus eager-mode serialization: no overlap between the gather, einsum and
   MLP stages (separate kernels).

Run: python scripts/a100_model.py [--validate] (CPU, needs /root/reference)
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, "/root/reference")


def model_flops(T, N, H, W, iters=6, levels=4, C=128, hidden=384):
    """Analytical MAC counts (x2 for FLOPs) of one reference offline forward."""
    P2 = 49  # 7x7 patch
    hw = (H // 4) * (W // 4)

    # fnet (RAFT BasicEncoder), per frame, MACs:
    f = 0
    f += (H // 2) * (W // 2) * 64 * 3 * 49  # 7x7 s2 stem
    f += (H // 2) * (W // 2) * 64 * 64 * 9 * 4  # layer1: 2 blocks x 2 convs
    f += (H // 4) * (W // 4) * 96 * (64 + 96 * 3) * 9  # layer2
    f += (H // 8) * (W // 8) * 128 * (96 + 128 * 3) * 9  # layer3
    f += (H // 16) * (W // 16) * 128 * (128 + 128 * 3) * 9  # layer4
    f += hw * 256 * 416 * 9  # 3x3 output conv on concat pyramid
    f += hw * 128 * 256  # 1x1
    fnet = f * T

    tokens = T * N
    # corr per iter: einsum (49,C)x(C,49) per token per level + MLP 2401-384-256
    corr_einsum = tokens * P2 * P2 * C * levels
    corr_mlp = tokens * (P2 * P2 * hidden + hidden * 256) * levels

    # updateformer per iter (3 time blocks + 3 space rounds), MACs
    d = hidden
    tb = tokens * d * d * 4 + tokens * d * 4 * d * 2  # qkvo + MLP(4x)
    tb += N * T * T * d * 2  # attention core (QK^T + AV)
    time_blocks = 3 * tb
    V = 64
    p2v = tokens * d * d * 2 + V * T * d * d * 2 + tokens * V * d * 2 + V * T * d * 4 * d * 2
    vsa = V * T * d * d * 4 + V * T * V * d * 2 + V * T * d * 4 * d * 2
    v2p = tokens * d * d * 2 + V * T * d * d * 2 + tokens * V * d * 2 + tokens * d * 4 * d * 2
    space_rounds = 3 * (p2v + vsa + v2p)
    io = tokens * 1110 * d + tokens * d * 4  # input proj + heads
    per_iter = corr_einsum + corr_mlp + time_blocks + space_rounds + io

    return {
        "fnet": fnet * 2,
        "corr_einsum_per_iter": corr_einsum * 2,
        "corr_mlp_per_iter": corr_mlp * 2,
        "updateformer_per_iter": (time_blocks + space_rounds + io) * 2,
        "total": (fnet + iters * per_iter) * 2,
    }


def model_bytes(T, N, iters=6, levels=4, C=128):
    """Dominant eager-mode HBM traffic per forward (fp32): the materialized
    patch tensors and 2401-d corr volumes, written+read once each."""
    tokens = T * N
    patches = tokens * 49 * C * 4 * 2  # (B,T,N,7,7,C) w+r
    volume = tokens * 2401 * 4 * 2  # (B,T,N,49,49) w+r
    return iters * levels * (patches + volume)


def a100_estimate(T=60, N=10000, H=384, W=512, iters=6):
    # FLOP_CORRECTION: the analytical model undercounts torch.profiler's
    # accounting of the real reference model by ~11% at the validation shapes
    # (run --validate: ratio 0.891); compute times are scaled accordingly.
    FLOP_CORRECTION = 1.0 / 0.891
    fl = model_flops(T, N, H, W, iters)
    by = model_bytes(T, N, iters)
    t_fnet = fl["fnet"] / 70e12
    t_einsum = iters * fl["corr_einsum_per_iter"] / 30e12
    t_mlp = iters * fl["corr_mlp_per_iter"] / 95e12
    t_uf = iters * fl["updateformer_per_iter"] / 95e12
    t_compute = (t_fnet + t_einsum + t_mlp + t_uf) * FLOP_CORRECTION
    t_mem = by / 1.3e12  # gather+volume traffic, serial with compute (eager)
    total = t_compute + t_mem
    return {
        "flops_total_T": fl["total"] / 1e12 * FLOP_CORRECTION,
        "t_fnet_s": t_fnet * FLOP_CORRECTION,
        "t_corr_einsum_s": t_einsum * FLOP_CORRECTION,
        "t_corr_mlp_s": t_mlp * FLOP_CORRECTION,
        "t_updateformer_s": t_uf * FLOP_CORRECTION,
        "t_memory_s": t_mem,
        "t_total_s": total,
        "pf_per_s": T * N / total,
    }


def validate():
    """Check the analytical FLOP model against torch.profiler on the real
    reference model at small shapes."""
    import numpy as np
    import torch
    from torch.profiler import profile, ProfilerActivity
    from cotracker.models.core.cotracker.cotracker3_offline import CoTrackerThreeOffline

    T, N, H, W, iters = 8, 64, 128, 128, 2
    torch.manual_seed(0)
    m = CoTrackerThreeOffline(
        stride=4, corr_radius=3, window_len=T, model_resolution=(H, W)
    ).eval()
    video = torch.rand(1, T, 3, H, W) * 255
    rng = np.random.default_rng(0)
    queries = torch.from_numpy(
        np.stack(
            [rng.integers(0, T, (1, N)), rng.random((1, N)) * (W - 1),
             rng.random((1, N)) * (H - 1)], axis=-1
        ).astype(np.float32)
    )
    with torch.no_grad(), profile(
        activities=[ProfilerActivity.CPU], with_flops=True
    ) as prof:
        m(video, queries, iters=iters)
    measured = sum(e.flops for e in prof.key_averages() if e.flops) / 1e9
    predicted = model_flops(T, N, H, W, iters)["total"] / 1e9
    print(f"torch-profiler FLOPs: {measured:.1f} G")
    print(f"model FLOPs:          {predicted:.1f} G")
    print(f"ratio model/measured: {predicted / measured:.3f}")
    return measured, predicted


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--validate", action="store_true")
    args = p.parse_args()
    if args.validate:
        validate()
    import json

    est = a100_estimate()
    print(json.dumps({k: round(v, 4) for k, v in est.items()}, indent=2))


if __name__ == "__main__":
    main()
