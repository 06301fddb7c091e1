"""Map/state checkpointing: save and resume the full SLAM state.

The reference *claims* map reuse (/root/reference/README.md:6) but its
``Frame::SaveToDisk`` is an empty TODO (/root/reference/src/frame.cc:74-76)
and no load path exists (SURVEY §5).  Here it is real and trivial: the whole
``SlamState`` (keyframe spectra, images, poses, edges, tracking carry,
pending loops) is already a pytree of dense arrays, so a checkpoint is one
``.npz`` with the flattened leaves.

Format: ``leaf_000 … leaf_NNN`` in ``tree_flatten`` order + a ``paths``
array of the flattened key paths used as a structural checksum at load.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np


def _paths_of(tree: Any) -> np.ndarray:
    leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
    return np.asarray([jax.tree_util.keystr(p) for p, _ in leaves])


def save_state(path: str, state: Any) -> str:
    leaves = jax.tree_util.tree_leaves(state)
    arrays = {}
    dtypes = []
    for i, leaf in enumerate(leaves):
        a = np.asarray(leaf)
        dtypes.append(a.dtype.name)
        if a.dtype.name == "bfloat16":
            # npz has no bfloat16 (MapConfig.bank_dtype="bf16" banks):
            # store the bit pattern; load_state views it back.
            a = a.view(np.uint16)
        arrays[f"leaf_{i:03d}"] = a
    np.savez_compressed(
        path, paths=_paths_of(state), dtypes=np.asarray(dtypes), **arrays
    )
    return path


def load_state(path: str, template: Any) -> Any:
    """Load into the structure of ``template`` (e.g. ``engine.init_state()``).

    Shapes/dtypes must match the template's configuration — checkpoints are
    tied to (CF sizes, capacities), which is exactly the jit cache key.
    """
    with np.load(path, allow_pickle=False) as data:
        saved_paths = list(data["paths"])
        tpl_paths = list(_paths_of(template))
        if saved_paths != tpl_paths:
            raise ValueError(
                "checkpoint structure mismatch: saved "
                f"{len(saved_paths)} leaves {saved_paths[:3]}…, template "
                f"{len(tpl_paths)} leaves {tpl_paths[:3]}…"
            )
        dtypes = (
            [str(d) for d in data["dtypes"]]
            if "dtypes" in data
            else [None] * len(saved_paths)  # pre-r4 checkpoints
        )
        leaves = []
        for i in range(len(saved_paths)):
            a = data[f"leaf_{i:03d}"]
            if dtypes[i] == "bfloat16":
                import ml_dtypes

                a = a.view(ml_dtypes.bfloat16)
            leaves.append(a)
    treedef = jax.tree_util.tree_structure(template)
    tpl_leaves = jax.tree_util.tree_leaves(template)
    for i, (got, want) in enumerate(zip(leaves, tpl_leaves)):
        if got.shape != want.shape:
            raise ValueError(
                f"leaf {saved_paths[i]}: shape {got.shape} != template "
                f"{want.shape} — the checkpoint was saved under a "
                "different config: check map capacities "
                "(keyframe_capacity/edge_capacity), image/polar sizes, "
                "and cf.half_polar (it halves every polar tensor's row "
                "count; pre-r4 checkpoints were written with "
                "half_polar=False)"
            )
        if np.dtype(got.dtype) != np.dtype(want.dtype):
            raise ValueError(
                f"leaf {saved_paths[i]}: dtype {got.dtype} != template "
                f"{want.dtype} (checkpoint saved under a different "
                f"bank_dtype/config — resume with the matching config)"
            )
    return jax.tree_util.tree_unflatten(treedef, leaves)
