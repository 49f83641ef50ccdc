"""Checkpoint save/restore for deepv_tpu parameter and training state.

The reference is load-only (diffusers ``from_pretrained``, SURVEY.md §5 —
no saving, no resume). A framework needs both directions: this wraps orbax
for pytree state with an explicit save/restore API used by the Trainer.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax


def save_pytree(path: str, tree: Any, metadata: Optional[dict] = None) -> None:
    """Save a pytree checkpoint (orbax); overwrites any existing step."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, tree, force=True)
    ckptr.wait_until_finished()
    if metadata:
        with open(path + ".meta.json", "w") as f:
            json.dump(metadata, f)


def restore_pytree(path: str, template: Optional[Any] = None) -> Any:
    """Restore a pytree checkpoint.

    ``template`` (a live pytree) is reduced to abstract shape/dtype structs so
    restore is independent of the topology/devices the checkpoint was saved
    on (a raw no-template restore pins the original device names, which
    breaks e.g. CPU-saved -> TPU-default processes).
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if template is not None:
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, template)
        return ckptr.restore(path, abstract)
    return ckptr.restore(path)


def load_metadata(path: str) -> dict:
    meta_path = os.path.abspath(path) + ".meta.json"
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            return json.load(f)
    return {}
