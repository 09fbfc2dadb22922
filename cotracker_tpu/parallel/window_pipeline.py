"""Window-sharding over hosts: a pipeline for long-video sliding-window
inference (SURVEY §2.7-3).

The reference processes long videos with the window-16 online model as a
strictly sequential sliding-window loop on one GPU
(/root/reference/cotracker/models/core/cotracker/cotracker3_online.py:266-541):
window w warm-starts from window w-1's overlap frames, so windows form a
chain. Two kinds of parallelism survive the chain, and this module exploits
both on a TPU mesh:

  * the frame encoder (fnet) and pyramid are per-frame independent — each
    stage encodes only ITS frame slab, so fnet runs frame-parallel across
    the mesh;
  * the chain itself pipelines over *videos* (GPipe-style): the mesh axis
    "window" is split into stages, stage s owns a contiguous block of
    windows, and the warm-start carry — just the overlap frames'
    (coords, vis, conf), O(overlap*N) bytes — hops stage s -> s+1 via
    `lax.ppermute` (ICI within a slice, DCN across hosts). With B videos in
    flight, utilization is B / (B + stages - 1).

Everything runs inside ONE `jax.shard_map` region: per-stage fnet, a
`lax.fori_loop` over pipeline steps, `ppermute` for the carry, and a masked
`psum` that routes each query's support patch from the stage that owns its
query frame. No data-dependent Python control flow; all shapes static.

Numerics match `CoTrackerThree.forward_windows` exactly (same warm-start,
masking, and overwrite-on-overlap semantics) — asserted by
tests/test_window_pipeline.py on a virtual CPU mesh.
"""

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_window_mesh(
    n_stages: Optional[int] = None, devices=None, n_track: int = 1
) -> Mesh:
    """("window",) mesh over `n_stages` devices (all by default); with
    n_track > 1, a 2-D ("window", "track") mesh — pipeline stages over the
    first axis, track sharding within each stage over the second (pass a
    model built with track_axis="track" to window_pipeline_forward)."""
    devices = list(devices if devices is not None else jax.devices())
    total = (n_stages or (len(devices) // n_track)) * n_track
    devices = devices[:total]
    if n_track > 1:
        return Mesh(
            np.asarray(devices).reshape(-1, n_track), ("window", "track")
        )
    return Mesh(np.asarray(devices), ("window",))


def window_pipeline_forward(model, mesh: Mesh, iters: int = 4):
    """Build a jitted pipelined equivalent of `model.forward_windows`.

    model: a CoTrackerThree built with the ONLINE window length (e.g. 16).
    mesh: a ("window",) mesh from make_window_mesh — or a 2-D
    ("window", "track") mesh, in which case the model must be built with
    track_axis="track": each stage then also shards its N axis, the
    virtual<-points psum rides "track" inside the stage, and the support
    routing psum stays on "window" (the two collectives compose; N must
    divide by the track-axis size).

    Single-video (B=1) note: the warm-start chain is inherently sequential,
    so a B=1 video gains only the frame-parallel fnet from the "window"
    axis (~10% of a window's work) — the pipeline is a BATCH-throughput
    tool (utilization B/(B+stages-1)). For single-video scaling, shard
    tracks instead (the "track" axis / parallel.mesh fast path).

    Returns fn(params, video, queries, track_mask=None) ->
    (coords (B,T,N,2) px, vis (B,T,N), conf (B,T,N) probabilities), equal to
    forward_windows' first three outputs. T, B, N must be static per
    compilation (as everywhere else).
    """
    S = model.window_len
    step = S // 2
    overlap = S - step
    Sd = int(dict(zip(mesh.axis_names, mesh.devices.shape))["window"])
    stride = model.stride
    F32 = jnp.float32

    mod_cls = type(model)

    def _apply(params, method, *args, **kw):
        return model.apply({"params": params}, *args, method=method, **kw)

    def stage_fn(params, slab, queries, track_mask, wloc, num_windows):
        """Runs on ONE pipeline stage (inside shard_map). slab
        (1, B, L, H, W, 3) is this stage's frame block (halo'd by `overlap`
        frames); returns (1, B, L, N, ...) local output buffers."""
        slab = slab[0]
        B, L = slab.shape[0], slab.shape[1]
        N = queries.shape[1]
        s = jax.lax.axis_index("window")
        offset = (s * (wloc * step)).astype(F32)  # my first owned frame

        qf = queries[..., 0].astype(F32)  # (B, N) global query frames
        qc = queries[..., 1:3].astype(F32) / stride

        # frame-parallel encoder: only my slab goes through fnet
        fmaps = _apply(params, mod_cls.compute_fmaps, slab, chunk_size=None)
        pyr = _apply(params, mod_cls.build_pyramid, fmaps)

        # support patches: sampled by the stage that OWNS the query frame
        # (frames partition by window block; the halo guarantees the t+1
        # blend neighbor is resident), then psum-routed to every stage
        owner = jnp.minimum(
            jnp.floor(qf).astype(jnp.int32) // (wloc * step), Sd - 1
        )
        local_qf = jnp.clip(qf - offset, 0.0, float(L - 1))
        _, sup = _apply(params, mod_cls.track_feat_pyramid, pyr, local_qf, qc)
        mine = (owner == s).astype(F32)[:, None, :, None]  # (B, 1, N, 1)
        sup = [jax.lax.psum(x * mine.astype(x.dtype), "window") for x in sup]
        if track_mask is not None:
            sup = [
                x * track_mask[:, None, :, None].astype(x.dtype) for x in sup
            ]

        out_c = jnp.zeros((B, L, N, 2), F32)  # model px
        out_v = jnp.zeros((B, L, N), F32)  # logits
        out_f = jnp.zeros((B, L, N), F32)

        def take_b(x, b):
            return jax.lax.dynamic_slice_in_dim(x, b, 1, axis=0)

        def one_video(b, cin, bufs):
            """Push video `b` through this stage's windows, warm-started
            from `cin` (the left stage's overlap tail)."""
            out_c, out_v, out_f = bufs
            qf_b = take_b(qf, b)  # (1, N)
            qc_b = take_b(qc, b)
            sup_b = [take_b(x, b) for x in sup]
            pyr_b = [take_b(x, b) for x in pyr]
            tm_b = take_b(track_mask, b) if track_mask is not None else None
            cbuf = take_b(out_c, b)  # (1, L, N, 2)
            vbuf = take_b(out_v, b)
            fbuf = take_b(out_f, b)

            for wl in range(wloc):
                indl = wl * step  # static local window start
                ind_g = offset + float(wl * step)  # traced global start

                coords_init = jnp.broadcast_to(
                    qc_b[:, None], (1, S, N, 2)
                ).astype(F32)
                vis_init = jnp.zeros((1, S, N), F32)
                conf_init = jnp.zeros((1, S, N), F32)

                # warm start (reference cotracker3_online.py:456-482): the
                # previous window's overlap tail, extended by its last frame;
                # the chain's very first window (ind_g == 0) stays cold
                if wl == 0:
                    tail_c, tail_v, tail_f = cin  # (1, overlap, N, ...)
                else:
                    tail_c = cbuf[:, indl : indl + overlap]
                    tail_v = vbuf[:, indl : indl + overlap]
                    tail_f = fbuf[:, indl : indl + overlap]
                copy_over = (qf_b < (ind_g + overlap)) & (ind_g > 0)

                def warm(tail, init, extra_dims, _cw=copy_over):
                    last = jnp.broadcast_to(
                        tail[:, -1:], (1, step) + tail.shape[2:]
                    )
                    prev = jnp.concatenate([tail, last], axis=1)  # (1, S, ..)
                    cw = _cw[:, None, :]
                    for _ in range(extra_dims):
                        cw = cw[..., None]
                    return jnp.where(cw, prev, init)

                coords_init = warm(tail_c / stride, coords_init, 1)
                vis_init = warm(tail_v, vis_init, 0)
                conf_init = warm(tail_f, conf_init, 0)

                active = qf_b < (ind_g + S)  # (1, N)
                wmask = active if tm_b is None else active & tm_b.astype(bool)
                supw = [
                    x * active[:, None, :, None].astype(x.dtype)
                    for x in sup_b
                ]
                window_pyr = [f[:, indl : indl + S] for f in pyr_b]
                cp, vp, fp = _apply(
                    params, mod_cls.iterate,
                    window_pyr, supw, coords_init, vis_init, conf_init,
                    iters=iters, track_mask=wmask,
                )
                # chain-padding windows (global index past the real chain)
                # must not overwrite real frames — forward_windows never
                # runs them (its .set sequence stops at num_windows)
                w_real = (s * wloc + wl) < num_windows
                cbuf = jnp.where(w_real, cbuf.at[:, indl : indl + S].set(cp[-1]), cbuf)
                vbuf = jnp.where(w_real, vbuf.at[:, indl : indl + S].set(vp[-1]), vbuf)
                fbuf = jnp.where(w_real, fbuf.at[:, indl : indl + S].set(fp[-1]), fbuf)

            cout = (
                cbuf[:, L - overlap :],
                vbuf[:, L - overlap :],
                fbuf[:, L - overlap :],
            )
            upd = lambda buf, new: jax.lax.dynamic_update_slice_in_dim(
                buf, new, b, axis=0
            )
            return cout, (upd(out_c, cbuf), upd(out_v, vbuf), upd(out_f, fbuf))

        # pipeline: at step t, stage s processes video b = t - s; the carry
        # it emits reaches stage s+1 exactly when s+1 needs video b
        zero_carry = (
            jnp.zeros((1, overlap, N, 2), F32),
            jnp.zeros((1, overlap, N), F32),
            jnp.zeros((1, overlap, N), F32),
        )
        perm = [(i, (i + 1) % Sd) for i in range(Sd)]

        def pipe_step(t, state):
            out_c, out_v, out_f, cin = state
            b = t - s
            valid = (b >= 0) & (b < B)
            bc = jnp.clip(b, 0, B - 1)
            cout, (nc, nv, nf) = one_video(bc, cin, (out_c, out_v, out_f))
            out_c = jnp.where(valid, nc, out_c)
            out_v = jnp.where(valid, nv, out_v)
            out_f = jnp.where(valid, nf, out_f)
            cin = jax.tree.map(
                lambda x: jax.lax.ppermute(x, "window", perm), cout
            )
            return (out_c, out_v, out_f, cin)

        out_c, out_v, out_f, _ = jax.lax.fori_loop(
            0, B + Sd - 1, pipe_step, (out_c, out_v, out_f, zero_carry)
        )
        return out_c[None], out_v[None], out_f[None]

    def fn(params, video, queries, track_mask=None):
        B, T = video.shape[0], video.shape[1]
        num_windows = max(1, -(-(T - S) // step) + 1)
        wloc = -(-num_windows // Sd)  # windows per stage (last stages pad)
        wpad = wloc * Sd
        T_buf = step * (wpad - 1) + S
        if T_buf > T:
            pad = jnp.broadcast_to(
                video[:, -1:], (B, T_buf - T) + video.shape[2:]
            )
            video = jnp.concatenate([video, pad], axis=1)
        L = wloc * step + overlap
        slabs = jnp.stack(
            [
                video[:, si * wloc * step : si * wloc * step + L]
                for si in range(Sd)
            ]
        )  # (Sd, B, L, H, W, 3)

        tracked = "track" in mesh.axis_names
        if tracked:
            assert getattr(model, "track_axis", None) == "track", (
                "2-D (window, track) mesh needs a model built with "
                "track_axis='track' (the in-stage v2p psum axis)"
            )
        else:
            assert getattr(model, "track_axis", None) is None, (
                "model.track_axis is set but the mesh has no 'track' axis — "
                "its psum would hit an unbound axis inside the pipeline"
            )
        qspec = P(None, "track", None) if tracked else P()
        mspec = P(None, "track") if tracked else P()
        tspec = ("track",) if tracked else ()
        body = jax.shard_map(
            lambda p, sl, q, m: stage_fn(p, sl, q, m, wloc, num_windows),
            mesh=mesh,
            in_specs=(P(), P("window"), qspec, mspec),
            out_specs=(
                P("window", None, None, *tspec, None),
                P("window", None, None, *tspec),
                P("window", None, None, *tspec),
            ),
            check_vma=False,
        )
        tm = track_mask if track_mask is not None else jnp.ones(
            queries.shape[:2], bool
        )
        oc, ov, of = body(params, slabs, queries, tm)  # (Sd, B, L, N, ...)

        # Final writer of global frame g (forward_windows' .set order) is
        # window min(g // step, num_windows - 1). For g < step*num_windows
        # that window lives on stage g // (step*wloc) at local frame
        # g - s*wloc*step — the per-stage body slice. Frames past that are
        # written by the LAST REAL window, which lives on stage
        # (num_windows-1)//wloc — NOT necessarily the last stage: chain-
        # padding windows (w_real mask above) never write their buffers, so
        # trailing stages can be all-zero when num_windows < Sd*wloc.
        owner_last = (num_windows - 1) // wloc
        body_T = min(T, step * num_windows)
        tail_len = T - body_T  # <= overlap (T <= step*(num_windows-1)+S)
        tail_lo = body_T - owner_last * wloc * step

        def stitch(x):
            body_part = x[:, :, : wloc * step]  # (Sd, B, wloc*step, ...)
            body_part = jnp.moveaxis(body_part, 0, 1).reshape(
                (B, Sd * wloc * step) + x.shape[3:]
            )
            if not tail_len:
                return body_part[:, :body_T]
            return jnp.concatenate(
                [
                    body_part[:, :body_T],
                    x[owner_last, :, tail_lo : tail_lo + tail_len],
                ],
                axis=1,
            )

        return (
            stitch(oc),
            jax.nn.sigmoid(stitch(ov)),
            jax.nn.sigmoid(stitch(of)),
        )

    return jax.jit(fn, static_argnums=())

