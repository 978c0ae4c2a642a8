"""Mid-training resume via Orbax checkpointing.

The reference only *saves* model weights on an epoch cadence; there is no
resume path — a crashed 50-epoch run restarts from scratch (reference:
models/base_flow.py:210-226,288-293 save-only). This module adds the
failure-recovery subsystem the TPU build needs (SURVEY §5): full train
state (params + optimizer state + epoch + loss history) written
asynchronously per epoch cadence, restart-from-latest on resume.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, List, Optional, Tuple

import jax
import numpy as np


class TrainStateManager:
    """Orbax-backed train-state save/restore keyed by epoch."""

    def __init__(self, directory: str | Path, max_to_keep: int = 3):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self.directory = Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        self.manager = ocp.CheckpointManager(
            str(self.directory),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, enable_async_checkpointing=True
            ),
        )

    def latest_epoch(self) -> Optional[int]:
        return self.manager.latest_step()

    def save(
        self, epoch: int, params, opt_state, losses: List[float], ema=None
    ) -> None:
        state = {
            "params": params,
            "opt_state": opt_state,
            "losses": np.asarray(losses, np.float64),
        }
        if ema is not None:
            state["ema"] = ema
        self.manager.save(epoch, args=self._ocp.args.StandardSave(state))

    def restore(
        self, params_template, opt_state_template
    ) -> Optional[Tuple[Any, Any, List[float], int, Any]]:
        """(params, opt_state, losses, next_epoch, ema_or_None) from the
        latest epoch, or None when no checkpoint exists."""
        epoch = self.latest_epoch()
        if epoch is None:
            return None
        # Restore from stored metadata (no template): returns numpy leaves
        # with the saved treedef, which optax/optimizer pytrees accept after
        # re-structuring against the templates.
        restored = self.manager.restore(epoch)
        losses = [float(x) for x in np.asarray(restored["losses"]).reshape(-1)]
        params = jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(params_template),
            jax.tree_util.tree_leaves(restored["params"]),
        )
        opt_state = jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(opt_state_template),
            jax.tree_util.tree_leaves(restored["opt_state"]),
        )
        ema = None
        if restored.get("ema") is not None:
            ema = jax.tree_util.tree_unflatten(
                jax.tree_util.tree_structure(params_template),
                jax.tree_util.tree_leaves(restored["ema"]),
            )
        return params, opt_state, losses, epoch + 1, ema

    def wait(self) -> None:
        self.manager.wait_until_finished()

    def close(self) -> None:
        self.wait()
        self.manager.close()
