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
