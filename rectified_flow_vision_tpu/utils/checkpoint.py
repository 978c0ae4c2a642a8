"""Checkpoint I/O for param pytrees and train states.

The reference saves ``torch.save({'state_dict', 'config'})`` every
``save_every`` epochs plus a ``_final`` checkpoint (reference:
models/base_flow.py:210-226, train loop at :288-293). This module keeps the
same cadence/naming semantics with a TPU-native format:

* model checkpoints: single-file ``.npz`` holding the flattened param tree
  plus a JSON config blob (unlike the reference, the *full* architecture
  hyperparams are stored, so checkpoints are self-describing — the
  reference's loader requires a pre-constructed matching model),
* torch ``.pt`` checkpoints from the reference are importable via
  ``utils.pt_import`` (dispatched on file extension in ``load_params``).
"""

from __future__ import annotations

import json
import os
import threading
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

Params = Dict[str, Any]

_SEP = "/"
_CONFIG_KEY = "__config__"


def flatten_tree(tree: Params, prefix: str = "") -> Dict[str, Any]:
    """Flatten a nested dict pytree into {path: leaf} with '/'-joined keys.

    Leaves are returned as-is (no host transfer) so this is usable both for
    checkpointing (after ``jax.device_get``) and for sharding-spec trees.
    """
    out: Dict[str, Any] = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(flatten_tree(v, f"{prefix}{k}{_SEP}"))
    else:
        out[prefix.rstrip(_SEP)] = tree
    return out


def unflatten_tree(flat: Dict[str, np.ndarray]) -> Params:
    tree: Params = {}
    for path, arr in flat.items():
        keys = path.split(_SEP)
        node = tree
        for k in keys[:-1]:
            node = node.setdefault(k, {})
        node[keys[-1]] = arr
    return tree


def save_params(
    path: os.PathLike | str, params: Params, config: Optional[dict] = None
) -> None:
    """Save a param pytree (+ JSON config) to a single .npz file."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    flat = flatten_tree(jax.device_get(params))
    if config is not None:
        flat[_CONFIG_KEY] = np.frombuffer(
            json.dumps(config).encode("utf-8"), dtype=np.uint8
        )
    tmp = path.with_suffix(path.suffix + ".tmp")
    with open(tmp, "wb") as f:
        np.savez(f, **flat)
    os.replace(tmp, path)
    print(f"Model saved to: {path}")


def load_params(path: os.PathLike | str) -> Tuple[Params, Optional[dict]]:
    """Load (params, config) from .npz; '.pt' files go through pt_import."""
    path = Path(path)
    if path.suffix == ".pt":
        from rectified_flow_vision_tpu.utils.pt_import import import_pt_checkpoint

        return import_pt_checkpoint(path)
    with np.load(path, allow_pickle=False) as data:
        flat = {k: data[k] for k in data.files}
    config = None
    if _CONFIG_KEY in flat:
        config = json.loads(bytes(flat.pop(_CONFIG_KEY)).decode("utf-8"))
    return unflatten_tree(flat), config


class AsyncSaver:
    """Background-thread checkpoint writer so training never blocks on I/O."""

    def __init__(self):
        self._thread: Optional[threading.Thread] = None

    def save(self, path, params, config=None) -> None:
        self.wait()
        # device_get on the caller thread (ordered w.r.t. the train stream)
        host_params = jax.device_get(params)
        self._thread = threading.Thread(
            target=save_params, args=(path, host_params, config), daemon=True
        )
        self._thread.start()

    def wait(self) -> None:
        if self._thread is not None:
            self._thread.join()
            self._thread = None
