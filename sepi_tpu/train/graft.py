"""Parameter grafting: inject a pretrained subtree into a fresh model.

Replaces the reference's model-surgery pipeline for v4/v5
(`train_xvector_with_am.sh:59-65`): `xconfig_to_configs.py
--existing-model am/final.raw` + `nnet3-init` grafts the pretrained AM
components into the new graph, and `nnet3-copy
--edits=set-learning-rate-factor name=* learning-rate-factor=0.2` scales
the AM part's learning rate.

In a pytree world the graft is a dictionary update and the LR factor is
an optimizer mask (optim.subtree_lr_factors) — no graph surgery needed.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax


def _tree_shapes(tree) -> Dict[str, Tuple]:
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    return {
        "/".join(str(getattr(k, "key", k)) for k in path): v.shape
        for path, v in flat
    }


def graft_subtree(target_variables: Any, source_variables: Any, subtree: str) -> Any:
    """Return target variables with ``subtree`` replaced by the source's.

    ``target_variables``/``source_variables`` are flax variable dicts
    ({'params': ..., 'batch_stats': ...}); ``subtree`` names the target's
    submodule (e.g. 'am') that was pretrained standalone.  Shapes are
    checked leaf-by-leaf — a mismatch means the architectures diverged
    (the same error nnet3-init raises on component mismatch).
    """
    out = {}
    for col, target_col in target_variables.items():
        if not isinstance(target_col, dict) or subtree not in target_col:
            out[col] = target_col
            continue
        src_col = source_variables.get(col, {})
        # Pretrained-standalone models carry the subtree contents at top
        # level; allow either layout.
        src_sub = src_col.get(subtree, src_col)
        tgt_shapes = _tree_shapes(target_col[subtree])
        src_shapes = _tree_shapes(src_sub)
        missing = set(tgt_shapes) - set(src_shapes)
        if missing:
            raise ValueError(
                f"graft: source missing {sorted(missing)[:5]} under {col}/{subtree}"
            )
        for k in tgt_shapes:
            if tgt_shapes[k] != src_shapes[k]:
                raise ValueError(
                    f"graft: shape mismatch at {col}/{subtree}/{k}: "
                    f"target {tgt_shapes[k]} vs source {src_shapes[k]}"
                )
        new_col = dict(target_col)
        # Deep-copy the grafted leaves: the training step donates its
        # state buffers, and sharing them with the pretrained model's
        # pytree would delete the source arrays on the first step.
        import jax.numpy as jnp

        new_col[subtree] = jax.tree.map(
            lambda x: jnp.array(x, copy=True), _select(src_sub, tgt_shapes)
        )
        out[col] = new_col
    return out


def _select(src_tree, keys: Dict[str, Tuple]):
    """Subset src_tree to exactly the target keys (drops e.g. the
    pretrained model's classifier head that the graft doesn't need)."""
    flat = jax.tree_util.tree_flatten_with_path(src_tree)[0]
    by_path = {
        "/".join(str(getattr(k, "key", k)) for k in path): v for path, v in flat
    }
    out: Dict[str, Any] = {}
    for joined in keys:
        parts = joined.split("/")
        node = out
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = by_path[joined]
    return out
