"""Window-pipeline (SURVEY §2.7-3) tests on a virtual CPU ("window",) mesh.

The pipeline shards the sliding-window chain's frames over stages (fnet runs
frame-parallel), routes support patches with a masked psum, and hops the
warm-start carry between stages with ppermute while videos stream through
GPipe-style.

Parity strategy (two layers, like the v2 golden tests — see CLAUDE.md):

  * with DAMPED update heads the window chain is contractive, so
    pipeline-vs-sequential equivalence holds at float tolerance — this pins
    all the mechanics §2.7-3 adds (carry routing, support psum, ownership
    masks, halos, stitch). Full-scale random weights can't be compared
    tightly across compilations: XLA fuses the iterate body differently
    inside the pipeline's fori_loop (f32 reassociation at ~1e-7) and the
    chain amplifies that chaotically (~2-10x per window — same regime as
    the documented v2 drift).
  * at full scale the comparison is banded: first window tight, median band
    + visibility-decision agreement overall.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cotracker_tpu.models.cotracker3 import CoTrackerThree
from cotracker_tpu.models.build import init_params
from cotracker_tpu.parallel.window_pipeline import (
    make_window_mesh,
    window_pipeline_forward,
)


def _setup(B, T, N=16, H=32, W=32, seed=0, damp=None):
    model = CoTrackerThree(window_len=8, model_resolution=(H, W))
    params = init_params(model)
    if damp is not None:
        # scale the update heads so the window chain is CONTRACTIVE: with
        # full-scale random weights the warm-start chain amplifies f32
        # compile-order noise ~2-10x per window (the documented v2 chaotic
        # regime), which would swamp any cross-compilation equivalence
        # assert. Damped, mechanics compare at float tolerance.
        uf = params["iter_core"]["updateformer"]
        for head in ("flow_head", "vis_conf_head"):
            uf[head] = jax.tree.map(lambda a: a * damp, uf[head])
    rng = np.random.default_rng(seed)
    video = jnp.asarray(rng.random((B, T, H, W, 3), np.float32) * 255)
    # query frames spread over the video so support routing + late-start
    # window masks are exercised across stages
    qt = rng.integers(0, T - 1, (B, N)).astype(np.float32)
    qt[:, :4] = 0.0
    queries = jnp.asarray(
        np.stack(
            [
                qt,
                rng.random((B, N)).astype(np.float32) * (W - 1),
                rng.random((B, N)).astype(np.float32) * (H - 1),
            ],
            axis=-1,
        )
    )
    return model, params, video, queries


@pytest.mark.parametrize(
    "B,T,stages",
    [
        (2, 36, 4),  # 8 windows, 2 per stage, no frame padding
        (1, 30, 4),  # 7 windows -> padded chain, repeat-last frame pad
        (3, 20, 2),  # more videos than stages (pipeline saturates)
        (1, 12, 4),  # 2 windows on 4 stages: trailing stages hold ONLY
        #              chain-padding windows; the stitch tail must come from
        #              the stage owning the last REAL window (regression for
        #              the all-zero-tail bug, num_windows % wloc == 0)
    ],
)
def test_pipeline_matches_sequential_damped(B, T, stages):
    """Pipeline == forward_windows at float tolerance with damped update
    heads (contractive chain): pins the carry hops, support psum routing,
    ownership masks, frame halos, warm-start values, and the
    overwrite-on-overlap stitch."""
    if len(jax.devices()) < stages:
        pytest.skip("needs virtual devices")
    model, params, video, queries = _setup(B, T, damp=0.05)

    ref_c, ref_v, ref_f, _ = model.apply(
        {"params": params}, video, queries, iters=2,
        method=CoTrackerThree.forward_windows,
    )
    c, v, f = window_pipeline_forward(model, make_window_mesh(stages), iters=2)(
        params, video, queries
    )
    np.testing.assert_allclose(np.asarray(c), np.asarray(ref_c), rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(v), np.asarray(ref_v), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(f), np.asarray(ref_f), rtol=1e-5, atol=1e-5)


def test_matches_forward_windows_banded():
    """vs the sequential chain: first window tight, then a median band (the
    chain chaotically amplifies f32 compile-order noise under random
    weights; trained weights contract it — see module docstring)."""
    B, T, stages = 2, 36, 4
    if len(jax.devices()) < stages:
        pytest.skip("needs virtual devices")
    model, params, video, queries = _setup(B, T)

    ref_c, ref_v, ref_f, _ = model.apply(
        {"params": params}, video, queries, iters=2,
        method=CoTrackerThree.forward_windows,
    )
    fwd = window_pipeline_forward(model, make_window_mesh(stages), iters=2)
    c, v, f = fwd(params, video, queries)

    S = model.window_len
    # frames only window 0 writes: exact inputs, one iterate apart
    np.testing.assert_allclose(
        np.asarray(c)[:, : S // 2], np.asarray(ref_c)[:, : S // 2],
        rtol=1e-3, atol=5e-3,
    )
    err = np.abs(np.asarray(c) - np.asarray(ref_c))
    assert np.median(err) < 0.1, np.median(err)
    # visibility decisions agree almost everywhere
    agree = np.mean((np.asarray(v) > 0.5) == (np.asarray(ref_v) > 0.5))
    assert agree > 0.97, agree


def test_track_mask_and_single_stage():
    """Single-stage pipeline (pure fori_loop restructuring, no collectives)
    against forward_windows with a track mask, short chain."""
    model, params, video, queries = _setup(B=1, T=12)
    N = queries.shape[1]
    mask = jnp.asarray(
        np.concatenate([np.ones((1, N - 3)), np.zeros((1, 3))], 1).astype(bool)
    )
    ref_c, ref_v, ref_f, _ = model.apply(
        {"params": params}, video, queries, iters=2, track_mask=mask,
        method=CoTrackerThree.forward_windows,
    )
    mesh = make_window_mesh(1)
    fwd = window_pipeline_forward(model, mesh, iters=2)
    c, v, f = fwd(params, video, queries, mask)
    m = np.broadcast_to(np.asarray(mask)[:, None, :], np.asarray(v).shape)
    # 2-window chain: one warm-start hop of amplification
    np.testing.assert_allclose(
        np.asarray(v)[m], np.asarray(ref_v)[m], rtol=5e-2, atol=5e-2
    )
    mc = np.broadcast_to(m[..., None], np.asarray(c).shape)
    np.testing.assert_allclose(
        np.asarray(c)[mc], np.asarray(ref_c)[mc], rtol=5e-2, atol=5e-2
    )


def test_2d_window_track_mesh():
    """("window", "track") 2-D mesh: stages pipeline the window chain while
    each stage shards its N axis; the in-stage virtual<-points psum ("track")
    composes with the support-routing psum ("window"). Damped regime ==
    forward_windows at float tolerance."""
    if len(jax.devices()) < 8:
        pytest.skip("needs virtual devices")
    B, T = 2, 20
    model, params, video, queries = _setup(B, T, damp=0.05)
    sh_model = CoTrackerThree(
        window_len=8, model_resolution=(32, 32), track_axis="track"
    )

    ref_c, ref_v, ref_f, _ = model.apply(
        {"params": params}, video, queries, iters=2,
        method=CoTrackerThree.forward_windows,
    )
    mesh = make_window_mesh(2, n_track=4)
    assert dict(zip(mesh.axis_names, mesh.devices.shape)) == {
        "window": 2, "track": 4
    }
    c, v, f = window_pipeline_forward(sh_model, mesh, iters=2)(
        params, video, queries
    )
    np.testing.assert_allclose(np.asarray(c), np.asarray(ref_c), rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(v), np.asarray(ref_v), rtol=1e-5, atol=1e-5)


def test_moderate_weight_parity_banded():
    """Undamped-ish regime (heads at 0.4x — update magnitudes comparable to
    a trained checkpoint's contractive behavior, unlike full-scale random
    weights whose chain amplifies compile-order noise chaotically): banded
    agreement with forward_windows."""
    B, T, stages = 1, 20, 2
    if len(jax.devices()) < stages:
        pytest.skip("needs virtual devices")
    model, params, video, queries = _setup(B, T, seed=9, damp=0.4)

    ref_c, ref_v, ref_f, _ = model.apply(
        {"params": params}, video, queries, iters=2,
        method=CoTrackerThree.forward_windows,
    )
    c, v, f = window_pipeline_forward(model, make_window_mesh(stages), iters=2)(
        params, video, queries
    )
    err = np.abs(np.asarray(c) - np.asarray(ref_c))
    assert np.median(err) < 0.05, np.median(err)
    assert err.max() < 2.0, err.max()
    agree = np.mean((np.asarray(v) > 0.5) == (np.asarray(ref_v) > 0.5))
    assert agree > 0.97, agree
