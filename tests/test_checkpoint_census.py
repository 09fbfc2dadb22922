"""Checkpoint-importer census (VERDICT r1 item 10): every key of a
reference-constructed state_dict is either consumed into the flax tree or on
an explicit drop list, and the imported tree is structurally identical to the
model's init tree — silently-ignored weights or unmapped new keys can never
happen."""

import numpy as np
import pytest
import jax

from conftest import requires_reference

torch = pytest.importorskip("torch")

from cotracker_tpu.models.checkpoint import (  # noqa: E402
    import_torch_state_dict,
    import_torch_state_dict_v2,
)
from cotracker_tpu.models.build import init_params  # noqa: E402


# keys the importer intentionally drops: deterministic buffers recomputed at
# model build (reference's own warm-restore strips them too,
# train_on_kubric.py:356-377)
def _is_dropped(key: str) -> bool:
    base = key.removeprefix("module.")
    return (
        base in ("time_emb", "pos_emb")
        or base.endswith(".time_emb")
        or base.endswith(".pos_emb")
        or base.endswith("num_batches_tracked")
    )


def _leaf_paths(tree):
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    return {
        tuple(str(getattr(k, "key", k)) for k in path): np.asarray(v).shape
        for path, v in flat
    }


def _census(sd, imported, init_tree):
    # 1) element conservation: everything not explicitly dropped lands in the tree
    n_src = sum(int(np.prod(v.shape)) for k, v in sd.items() if not _is_dropped(k))
    n_dst = sum(
        int(np.prod(np.asarray(v).shape))
        for v in jax.tree_util.tree_leaves(imported)
    )
    assert n_src == n_dst, f"state_dict has {n_src} params, imported tree {n_dst}"

    # 2) structural identity with the model's init tree (paths AND shapes)
    imp = _leaf_paths(imported)
    ini = _leaf_paths(init_tree)
    missing = set(ini) - set(imp)
    extra = set(imp) - set(ini)
    assert not missing, f"model leaves not filled by importer: {sorted(missing)[:10]}"
    assert not extra, f"imported leaves unknown to the model: {sorted(extra)[:10]}"
    for p in ini:
        assert imp[p] == ini[p], f"shape mismatch at {p}: {imp[p]} vs {ini[p]}"


@requires_reference
class TestImporterCensus:
    def test_v3_offline(self):
        from cotracker.models.core.cotracker.cotracker3_offline import (
            CoTrackerThreeOffline,
        )
        from cotracker_tpu.models.cotracker3 import CoTrackerThree

        torch.manual_seed(0)
        ref = CoTrackerThreeOffline(
            stride=4, corr_radius=3, window_len=60, model_resolution=(384, 512)
        )
        sd = ref.state_dict()
        imported = import_torch_state_dict(sd)
        init = init_params(CoTrackerThree(window_len=60))
        _census(sd, imported, init)

    def test_v3_online(self):
        from cotracker.models.core.cotracker.cotracker3_online import (
            CoTrackerThreeOnline,
        )
        from cotracker_tpu.models.cotracker3 import CoTrackerThree

        torch.manual_seed(1)
        ref = CoTrackerThreeOnline(
            stride=4, corr_radius=3, window_len=16, model_resolution=(384, 512)
        )
        sd = ref.state_dict()
        imported = import_torch_state_dict(sd)
        init = init_params(CoTrackerThree(window_len=16))
        _census(sd, imported, init)

    @pytest.mark.parametrize("v2_1", [False, True])
    def test_v2(self, v2_1):
        from cotracker.models.core.cotracker.cotracker import CoTracker2
        from cotracker_tpu.models.cotracker2 import CoTracker2 as OurV2

        torch.manual_seed(2)
        ref = CoTracker2(
            stride=4, window_len=8, add_space_attn=True,
            model_resolution=(384, 512),
        )
        sd = ref.state_dict()
        imported = import_torch_state_dict_v2(sd)
        init = init_params(OurV2(window_len=8))
        _census(sd, imported, init)

    def test_new_unmapped_key_fails_census(self):
        """The census must actually catch a silently-dropped key."""
        from cotracker.models.core.cotracker.cotracker3_offline import (
            CoTrackerThreeOffline,
        )
        from cotracker_tpu.models.cotracker3 import CoTrackerThree

        torch.manual_seed(3)
        ref = CoTrackerThreeOffline(
            stride=4, corr_radius=3, window_len=60, model_resolution=(384, 512)
        )
        sd = dict(ref.state_dict())
        sd["some_new_module.weight"] = torch.zeros(7, 7)
        imported = import_torch_state_dict(sd)
        init = init_params(CoTrackerThree(window_len=60))
        with pytest.raises(AssertionError):
            _census(sd, imported, init)


@requires_reference
class TestExportRoundtrip:
    """Round 5: export_torch_state_dict is the exact inverse of the importer
    — params trained in this framework can migrate BACK to the reference
    implementation. Verified three ways: value-exact key-for-key roundtrip
    against a reference-constructed state_dict, torch load_state_dict
    accepts the export (missing keys are only the dropped deterministic
    buffers), and import(export(tree)) is bitwise-identical."""

    def test_v3_roundtrip(self, tmp_path):
        from cotracker.models.core.cotracker.cotracker3_offline import (
            CoTrackerThreeOffline,
        )
        from cotracker_tpu.models.checkpoint import (
            export_torch_state_dict,
            save_torch_checkpoint,
            load_torch_checkpoint,
        )

        torch.manual_seed(5)
        ref = CoTrackerThreeOffline(
            stride=4, corr_radius=3, window_len=8, model_resolution=(48, 64)
        )
        sd = ref.state_dict()
        imported = import_torch_state_dict(sd)
        exported = export_torch_state_dict(imported)

        # key-for-key, value-exact against the original state_dict
        src = {k: v for k, v in sd.items() if not _is_dropped(k)}
        assert set(exported) == set(src), (
            set(exported) ^ set(src)
        )
        for k in src:
            np.testing.assert_array_equal(
                exported[k], src[k].detach().cpu().numpy(), err_msg=k
            )

        # the reference model loads it: nothing unexpected, missing keys are
        # exactly the deterministic buffers the exporter documents
        res = ref.load_state_dict(
            {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in exported.items()},
            strict=False,
        )
        assert not res.unexpected_keys, res.unexpected_keys
        assert all(_is_dropped(k) for k in res.missing_keys), res.missing_keys

        # bitwise tree roundtrip
        again = import_torch_state_dict(exported)
        for (p1, v1), (p2, v2) in zip(
            sorted(jax.tree_util.tree_flatten_with_path(imported)[0], key=str),
            sorted(jax.tree_util.tree_flatten_with_path(again)[0], key=str),
        ):
            assert str(p1) == str(p2)
            np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))

        # .pth file form: save_torch_checkpoint -> load_torch_checkpoint
        path = str(tmp_path / "export.pth")
        save_torch_checkpoint(path, imported)
        reloaded = load_torch_checkpoint(path)
        flat = jax.tree_util.tree_flatten_with_path(reloaded)[0]
        assert len(flat) == len(jax.tree_util.tree_leaves(imported))

    def test_v2_roundtrip(self):
        from cotracker.models.core.cotracker.cotracker import CoTracker2
        from cotracker_tpu.models.checkpoint import export_torch_state_dict_v2

        torch.manual_seed(6)
        ref = CoTracker2(
            stride=4, window_len=8, add_space_attn=True,
            model_resolution=(48, 64),
        )
        sd = ref.state_dict()
        imported = import_torch_state_dict_v2(sd)
        exported = export_torch_state_dict_v2(imported)
        src = {k: v for k, v in sd.items() if not _is_dropped(k)}
        assert set(exported) == set(src), set(exported) ^ set(src)
        for k in src:
            np.testing.assert_array_equal(
                exported[k], src[k].detach().cpu().numpy(), err_msg=k
            )
        res = ref.load_state_dict(
            {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in exported.items()},
            strict=False,
        )
        assert not res.unexpected_keys, res.unexpected_keys
        assert all(_is_dropped(k) for k in res.missing_keys), res.missing_keys
