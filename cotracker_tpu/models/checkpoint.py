"""Checkpoint import/export: reference torch state_dicts <-> flax param pytrees.

The published CoTracker3 checkpoints (and any state_dict produced by the
reference trainer, plain or {"model": ...}-wrapped — reference
build_cotracker.py:39-45) are converted one-way into this framework's param
tree. Conversions:

  * conv weights  (O, I, kh, kw) -> (kh, kw, I, O)   (NCHW -> NHWC layouts)
  * linear weights (out, in)     -> (in, out)
  * layer norm weight/bias       -> scale/bias
  * `virual_tracks` (reference's spelling, cotracker.py:416) -> virtual_tracks
  * time_emb / pos_emb buffers are dropped (recomputed deterministically),
    matching the reference's own restore path (train_on_kubric.py:356-377).
"""

import re
from typing import Any, Dict, Mapping

import numpy as np
import jax.numpy as jnp


def _to_numpy(v) -> np.ndarray:
    if isinstance(v, np.ndarray):
        return v
    try:
        return v.detach().cpu().numpy()  # torch tensor
    except AttributeError:
        return np.asarray(v)


def _conv(w):
    return jnp.asarray(np.transpose(_to_numpy(w), (2, 3, 1, 0)))


def _linear(w):
    return jnp.asarray(np.transpose(_to_numpy(w), (1, 0)))


def _vec(w):
    return jnp.asarray(_to_numpy(w))


def _set(tree: Dict[str, Any], path, value):
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = value


def _import_fnet(params, rest, val):
    if rest[0] in ("conv1", "conv2", "conv3"):
        kind = "kernel" if rest[1] == "weight" else "bias"
        _set(params, ("fnet", rest[0], kind), _conv(val) if kind == "kernel" else _vec(val))
    elif re.fullmatch(r"layer\d", rest[0]):
        # fnet.layerL.B.convX.weight  /  fnet.layerL.B.downsample.0.weight
        layer, block = rest[0], rest[1]
        name = f"{layer}_{block}"
        if rest[2] == "downsample":
            kind = "kernel" if rest[4] == "weight" else "bias"
            _set(
                params,
                ("fnet", name, "downsample", kind),
                _conv(val) if kind == "kernel" else _vec(val),
            )
        elif rest[2] in ("conv1", "conv2"):
            kind = "kernel" if rest[3] == "weight" else "bias"
            _set(
                params,
                ("fnet", name, rest[2], kind),
                _conv(val) if kind == "kernel" else _vec(val),
            )
        # norm1/norm2/norm3: InstanceNorm2d, paramless in reference configs


def _import_updateformer(params, prefix, rest, val):
    """Map reference `updateformer.*` keys to flax paths under `prefix`."""
    if rest[0] == "virual_tracks":  # reference's spelling (cotracker.py:416)
        _set(params, prefix + ("virtual_tracks",), _vec(val))
        return
    if rest[0] in ("input_transform", "flow_head", "vis_conf_head"):
        kind = "kernel" if rest[1] == "weight" else "bias"
        _set(
            params,
            prefix + (rest[0], kind),
            _linear(val) if kind == "kernel" else _vec(val),
        )
        return
    if rest[0] in (
        "time_blocks",
        "space_virtual_blocks",
        "space_point2virtual_blocks",
        "space_virtual2point_blocks",
    ):
        block = f"{rest[0]}_{rest[1]}"
        sub = rest[2]  # attn / cross_attn / mlp / norm_context (norm1/2 paramless)
        if sub in ("attn", "cross_attn"):
            proj = rest[3]  # to_q / to_kv / to_out
            kind = "kernel" if rest[4] == "weight" else "bias"
            _set(
                params,
                prefix + (block, sub, proj, kind),
                _linear(val) if kind == "kernel" else _vec(val),
            )
        elif sub == "mlp":
            fc = rest[3]
            kind = "kernel" if rest[4] == "weight" else "bias"
            _set(
                params,
                prefix + (block, "mlp", fc, kind),
                _linear(val) if kind == "kernel" else _vec(val),
            )
        elif sub == "norm_context":
            kind = "scale" if rest[3] == "weight" else "bias"
            _set(params, prefix + (block, "norm_context", kind), _vec(val))


def import_torch_state_dict(state_dict: Mapping[str, Any]) -> Dict[str, Any]:
    """Convert a reference CoTracker3 state_dict into a flax params dict
    matching `CoTrackerThree` (models/cotracker3.py)."""
    params: Dict[str, Any] = {}
    sd = {k.removeprefix("module."): v for k, v in state_dict.items()}

    for key, val in sd.items():
        if key.endswith("num_batches_tracked"):
            continue
        if key in ("time_emb", "pos_emb") or key.endswith(".time_emb") or key.endswith(".pos_emb"):
            continue

        parts = key.split(".")

        if parts[0] == "fnet":
            _import_fnet(params, parts[1:], val)
            continue

        # corr mlp: flat names under the fused featurizer in the scanned core
        if parts[0] == "corr_mlp":
            kind = "kernel" if parts[2] == "weight" else "bias"
            _set(
                params,
                ("iter_core", "corr_mlp", f"{parts[1]}_{kind}"),
                _linear(val) if kind == "kernel" else _vec(val),
            )
            continue

        if parts[0] == "updateformer":
            _import_updateformer(params, ("iter_core", "updateformer"), parts[1:], val)
            continue

    return params


def import_torch_state_dict_v2(state_dict: Mapping[str, Any]) -> Dict[str, Any]:
    """Convert a reference CoTracker2 (v2/v2.1) state_dict into a flax params
    dict matching `CoTracker2` (models/cotracker2.py). Reference module names
    from cotracker.py:29-84: fnet, updateformer, norm (GroupNorm), track_feat_
    updater (Sequential[Linear, GELU]), vis_predictor (Sequential[Linear])."""
    params: Dict[str, Any] = {}
    sd = {k.removeprefix("module."): v for k, v in state_dict.items()}
    iter_prefix = ("window_core", "iter_core")

    for key, val in sd.items():
        if key.endswith("num_batches_tracked"):
            continue
        if key in ("time_emb", "pos_emb") or key.endswith(".time_emb") or key.endswith(".pos_emb"):
            continue

        parts = key.split(".")

        if parts[0] == "fnet":
            _import_fnet(params, parts[1:], val)
            continue
        if parts[0] == "updateformer":
            _import_updateformer(params, iter_prefix + ("updateformer",), parts[1:], val)
            continue
        if parts[0] == "norm":  # GroupNorm(1, latent) -> affine LayerNorm
            kind = "scale" if parts[1] == "weight" else "bias"
            _set(params, iter_prefix + ("norm", kind), _vec(val))
            continue
        if parts[0] == "track_feat_updater":  # Sequential index 0 = Linear
            kind = "kernel" if parts[2] == "weight" else "bias"
            _set(
                params,
                iter_prefix + ("track_feat_updater", kind),
                _linear(val) if kind == "kernel" else _vec(val),
            )
            continue
        if parts[0] == "vis_predictor":
            kind = "kernel" if parts[2] == "weight" else "bias"
            _set(
                params,
                ("window_core", "vis_predictor", kind),
                _linear(val) if kind == "kernel" else _vec(val),
            )
            continue

    return params


def _np(v) -> np.ndarray:
    return np.asarray(v)


def _export_fnet(params_fnet, out: Dict[str, np.ndarray]):
    for name, node in params_fnet.items():
        if name in ("conv1", "conv2", "conv3"):
            out[f"fnet.{name}.weight"] = np.transpose(_np(node["kernel"]), (3, 2, 0, 1))
            if "bias" in node:
                out[f"fnet.{name}.bias"] = _np(node["bias"])
        elif re.fullmatch(r"layer\d_\d", name):
            layer, block = name.split("_")
            for sub, w in node.items():
                if sub == "downsample":
                    out[f"fnet.{layer}.{block}.downsample.0.weight"] = np.transpose(
                        _np(w["kernel"]), (3, 2, 0, 1)
                    )
                    if "bias" in w:
                        out[f"fnet.{layer}.{block}.downsample.0.bias"] = _np(w["bias"])
                elif sub in ("conv1", "conv2"):
                    out[f"fnet.{layer}.{block}.{sub}.weight"] = np.transpose(
                        _np(w["kernel"]), (3, 2, 0, 1)
                    )
                    if "bias" in w:
                        out[f"fnet.{layer}.{block}.{sub}.bias"] = _np(w["bias"])
                else:
                    raise KeyError(f"unmapped fnet param fnet.{name}.{sub}")
        else:
            raise KeyError(f"unmapped fnet module fnet.{name}")


def _export_updateformer(uf, prefix: str, out: Dict[str, np.ndarray]):
    for name, node in uf.items():
        if name == "virtual_tracks":
            out[f"{prefix}.virual_tracks"] = _np(node)  # reference's spelling
        elif name in ("input_transform", "flow_head", "vis_conf_head"):
            out[f"{prefix}.{name}.weight"] = np.transpose(_np(node["kernel"]))
            out[f"{prefix}.{name}.bias"] = _np(node["bias"])
        elif re.fullmatch(
            r"(time_blocks|space_virtual_blocks|space_point2virtual_blocks|"
            r"space_virtual2point_blocks)_\d+",
            name,
        ):
            family, idx = name.rsplit("_", 1)
            base = f"{prefix}.{family}.{idx}"
            for sub, w in node.items():
                if sub in ("attn", "cross_attn"):
                    for proj, pw in w.items():
                        out[f"{base}.{sub}.{proj}.weight"] = np.transpose(
                            _np(pw["kernel"])
                        )
                        if "bias" in pw:
                            out[f"{base}.{sub}.{proj}.bias"] = _np(pw["bias"])
                elif sub == "mlp":
                    for fc, pw in w.items():
                        out[f"{base}.mlp.{fc}.weight"] = np.transpose(_np(pw["kernel"]))
                        out[f"{base}.mlp.{fc}.bias"] = _np(pw["bias"])
                elif sub == "norm_context":
                    out[f"{base}.norm_context.weight"] = _np(w["scale"])
                    out[f"{base}.norm_context.bias"] = _np(w["bias"])
                else:
                    raise KeyError(f"unmapped updateformer param {base}.{sub}")
        else:
            raise KeyError(f"unmapped updateformer module {prefix}.{name}")


def export_torch_state_dict(params: Mapping[str, Any]) -> Dict[str, np.ndarray]:
    """flax CoTrackerThree params -> reference-format state_dict (numpy).

    The exact inverse of `import_torch_state_dict` — layouts are transposed
    back (NHWC -> NCHW convs, (in, out) -> (out, in) linears), LayerNorm
    scale -> weight, and `virtual_tracks` returns to the reference's
    `virual_tracks` spelling. time_emb / pos_emb buffers are NOT emitted
    (they are deterministic and the reference's own restore path strips
    them, train_on_kubric.py:356-377): load with `strict=False`, or via a
    model whose buffers are already registered (the constructor builds
    them). Unknown tree entries raise instead of being silently dropped —
    the same census guarantee as the importer, in reverse.

    Save with `torch.save({"model": {k: torch.from_numpy(v) ...}}, path)`
    or hand the dict to `torch.nn.Module.load_state_dict(strict=False)`
    after tensor conversion — giving a migration path BACK to the
    reference implementation for params trained in this framework."""
    out: Dict[str, np.ndarray] = {}
    for name, node in params.items():
        if name == "fnet":
            _export_fnet(node, out)
        elif name == "iter_core":
            for sub, w in node.items():
                if sub == "corr_mlp":
                    for pname, pval in w.items():
                        fc, kind = pname.rsplit("_", 1)
                        if kind == "kernel":
                            out[f"corr_mlp.{fc}.weight"] = np.transpose(_np(pval))
                        else:
                            out[f"corr_mlp.{fc}.bias"] = _np(pval)
                elif sub == "updateformer":
                    _export_updateformer(w, "updateformer", out)
                else:
                    raise KeyError(f"unmapped iter_core module {sub}")
        else:
            raise KeyError(f"unmapped top-level module {name}")
    return out


def export_torch_state_dict_v2(params: Mapping[str, Any]) -> Dict[str, np.ndarray]:
    """flax CoTracker2 params -> reference-format state_dict (numpy); the
    inverse of `import_torch_state_dict_v2` (see export_torch_state_dict
    for conventions and the buffer caveat)."""
    out: Dict[str, np.ndarray] = {}
    for name, node in params.items():
        if name == "fnet":
            _export_fnet(node, out)
        elif name == "window_core":
            for sub, w in node.items():
                if sub == "iter_core":
                    for s2, w2 in w.items():
                        if s2 == "updateformer":
                            _export_updateformer(w2, "updateformer", out)
                        elif s2 == "norm":  # affine LN <- GroupNorm(1, C)
                            out["norm.weight"] = _np(w2["scale"])
                            out["norm.bias"] = _np(w2["bias"])
                        elif s2 == "track_feat_updater":
                            out["track_feat_updater.0.weight"] = np.transpose(
                                _np(w2["kernel"])
                            )
                            out["track_feat_updater.0.bias"] = _np(w2["bias"])
                        else:
                            raise KeyError(f"unmapped v2 iter_core module {s2}")
                elif sub == "vis_predictor":
                    out["vis_predictor.0.weight"] = np.transpose(_np(w["kernel"]))
                    out["vis_predictor.0.bias"] = _np(w["bias"])
                else:
                    raise KeyError(f"unmapped v2 window_core module {sub}")
        else:
            raise KeyError(f"unmapped v2 top-level module {name}")
    return out


def save_torch_checkpoint(path: str, params: Mapping[str, Any]) -> None:
    """Write a reference-loadable .pth ({"model": state_dict} wrapping, the
    format the reference factory accepts, build_cotracker.py:39-45)."""
    import torch

    sd = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in
          export_torch_state_dict(params).items()}
    torch.save({"model": sd}, path)


def load_torch_checkpoint(path: str, v2: bool = False) -> Dict[str, Any]:
    """Load a reference .pth checkpoint file (plain state_dict or
    {"model": state_dict}) and convert it."""
    import torch

    with open(path, "rb") as f:
        state_dict = torch.load(f, map_location="cpu", weights_only=False)
    if "model" in state_dict:
        state_dict = state_dict["model"]
    if v2:
        return import_torch_state_dict_v2(state_dict)
    return import_torch_state_dict(state_dict)
