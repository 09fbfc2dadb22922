"""Capture + parse a device trace of the bench forward (or other shapes).

Usage: python scripts/trace_forward.py [--N 10240] [--T 60] [--out /tmp/tr4]

Aggregates device-lane "X" events from the Perfetto trace
(plugins/profile/*/*.trace.json.gz): prints total device-busy time, the wall
time of the traced step, and the top ops grouped by a coarse family
(corr kernel closed_calls, copies, fusions, time/space block kernels, ...).
This is the accounting VERDICT r3 item 1(d) asks for.
"""
import argparse
import glob
import gzip
import json
import os
import re
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_fwd(N, T, H, W, iters):
    import jax
    import jax.numpy as jnp
    from cotracker_tpu.models.cotracker3 import CoTrackerThree
    from cotracker_tpu.models.build import init_params

    model = CoTrackerThree(
        window_len=60, model_resolution=(H, W), dtype=jnp.bfloat16,
        corr_chunk=2048, use_pallas_corr=True, corr_quant_int8=True,
        corr_fuse_combine=True, fold_input_proj=True, use_pallas_attn=True,
        attn_quant_int8=True,
    )
    params = init_params(model)
    rng = np.random.default_rng(0)
    video = jnp.asarray(rng.random((1, T, H, W, 3), np.float32) * 255)
    queries = jnp.asarray(
        np.stack(
            [np.zeros(N, np.float32),
             rng.random(N).astype(np.float32) * (W - 1),
             rng.random(N).astype(np.float32) * (H - 1)], axis=-1)[None]
    )

    @jax.jit
    def fwd(params, video, queries):
        coords, vis, conf, _ = model.apply({"params": params}, video, queries, iters=iters)
        return coords, vis

    return fwd, params, video, queries


FAMILIES = [
    ("corr_kernel", re.compile(r"closed_call|custom-call.*corr|_kernel\.\d*$")),
    ("timeblock_kernel", re.compile(r"time_block")),
    ("spaceblock_kernel", re.compile(r"space_block|virtual_from_points|points_from_virtual|ln_qkv|attnout")),
    ("copy", re.compile(r"^copy")),
    ("transpose", re.compile(r"transpose")),
    ("conv", re.compile(r"conv")),
    ("dot/einsum", re.compile(r"dot|einsum")),
    ("fusion", re.compile(r"fusion")),
    ("dus/slice", re.compile(r"dynamic.update.slice|dynamic.slice|^slice")),
]


def family(name):
    for fam, pat in FAMILIES:
        if pat.search(name):
            return fam
    return "other"


def parse(tracedir):
    paths = glob.glob(os.path.join(tracedir, "**", "*.trace.json.gz"), recursive=True)
    assert paths, f"no trace files under {tracedir}"
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    ev = data["traceEvents"]
    # find device-lane pids: process with name containing "TPU" / "/device"
    pid_names, tid_names = {}, {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e["pid"], e["tid"])] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items() if "TPU" in n or "device" in n.lower()}
    # the hierarchy (jit_fwd > while > op) nests across threads; aggregate
    # ONLY the leaf "XLA Ops" lane to avoid double counting
    op_lanes = {
        (p, t) for (p, t), n in tid_names.items()
        if p in dev_pids and "XLA Ops" in n
    }
    print("processes:", pid_names)
    print("device lanes:", {k: v for k, v in tid_names.items() if k[0] in dev_pids})
    # the Ops lane is a flame graph (while.X spans contain their body ops):
    # account SELF time = dur - sum(immediate children) via a stack sweep
    lanes = defaultdict(list)
    for e in ev:
        if e.get("ph") != "X" or (e.get("pid"), e.get("tid")) not in op_lanes:
            continue
        lanes[(e["pid"], e["tid"])].append(e)
    by_name = defaultdict(float)
    total = 0.0
    t0, t1 = float("inf"), 0.0
    for lane_ev in lanes.values():
        lane_ev.sort(key=lambda e: (e["ts"], -e.get("dur", 0)))
        frames = []  # [end_ts, name, child_dur_accum, dur]
        for e in lane_ev:
            ts, dur = e["ts"], e.get("dur", 0)
            while frames and frames[-1][0] <= ts:
                fend, fname, fchild, fdur = frames.pop()
                self_d = max(0.0, fdur - fchild) / 1e6
                by_name[fname] += self_d
                total += self_d
                if frames:
                    frames[-1][2] += fdur
            frames.append([ts + dur, e.get("name", "?"), 0.0, dur])
            t0 = min(t0, ts)
            t1 = max(t1, ts + dur)
        while frames:
            fend, fname, fchild, fdur = frames.pop()
            self_d = max(0.0, fdur - fchild) / 1e6
            by_name[fname] += self_d
            total += self_d
            if frames:
                frames[-1][2] += fdur
    by_fam = defaultdict(float)
    for n, d in by_name.items():
        by_fam[family(n)] += d
    print(f"\ndevice busy total: {total:.3f} s; trace span {(t1 - t0) / 1e6:.3f} s")
    print("\nby family:")
    for f_, d in sorted(by_fam.items(), key=lambda kv: -kv[1]):
        print(f"  {f_:20s} {d:8.3f} s")
    print("\ntop 40 ops:")
    for n, d in sorted(by_name.items(), key=lambda kv: -kv[1])[:40]:
        print(f"  {d:8.4f} s  {n}")
    return by_name


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--N", type=int, default=10_240)
    ap.add_argument("--T", type=int, default=60)
    ap.add_argument("--H", type=int, default=384)
    ap.add_argument("--W", type=int, default=512)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--out", default="/tmp/tr_fwd")
    ap.add_argument("--parse-only", action="store_true")
    args = ap.parse_args()
    if args.parse_only:
        parse(args.out)
        return

    import jax

    fwd, params, video, queries = build_fwd(args.N, args.T, args.H, args.W, args.iters)

    def run_sync(v):
        out = fwd(params, v, queries)
        return float(np.asarray(out[0][0, -1, -1]).sum())

    run_sync(video)  # compile + warm
    t0 = time.perf_counter()
    run_sync(video + np.float32(1))
    wall = time.perf_counter() - t0
    print(f"warm wall: {wall:.3f} s", flush=True)

    jax.profiler.start_trace(args.out)
    t0 = time.perf_counter()
    run_sync(video + np.float32(2))
    wall = time.perf_counter() - t0
    jax.profiler.stop_trace()
    print(f"traced wall: {wall:.3f} s", flush=True)
    parse(args.out)


if __name__ == "__main__":
    main()
