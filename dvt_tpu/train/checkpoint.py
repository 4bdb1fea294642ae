"""Checkpointing with the reference's logical schema, via orbax.

Reference behavior (main_denoiser.py:239-264, dvt/utils/misc.py:111-208):
save {model/denoiser, optimizer, step} every N iters, keep a rolling window,
maintain a ``latest`` pointer, strip frozen ViT weights from stage-2 saves,
restore with tolerant key handling. Orbax gives us atomic multi-host saves;
the ``latest`` pointer falls out of ``latest_step()``.

Also exposes ``save_torch_compatible``/``load_torch`` bridges so checkpoints
interoperate with the reference's released ``.pth`` files (models/convert.py).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3,
                 save_interval: int = 5000):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            create=True,
            enable_async_checkpointing=True,
        )
        self._mgr = ocp.CheckpointManager(self.directory, options=options)
        self.save_interval = save_interval

    def should_save(self, step: int, total_steps: int) -> bool:
        """Reference cadence ((it+1) % save_freq, main_denoiser.py:239):
        first save after save_interval steps, plus the final step - NOT
        step 0 (saving the untrained init would burn a max_to_keep slot
        and could leave 'latest' pointing at random weights after an
        early crash)."""
        return ((step + 1) % self.save_interval == 0
                or step == total_steps - 1)

    def save(self, step: int, state: Dict[str, Any]) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(state))

    def restore(self, step: Optional[int] = None,
                template: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
        if step is None:
            step = self.latest_step()
            if step is None:
                raise FileNotFoundError(f"no checkpoints in {self.directory}")
        if template is not None:
            return self._mgr.restore(
                step, args=ocp.args.StandardRestore(template)
            )
        return self._mgr.restore(step)

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.close()


def strip_vit_params(state: Dict[str, Any]) -> Dict[str, Any]:
    """Drop frozen backbone params before saving (main_denoiser.py:241-246)."""
    return {k: v for k, v in state.items() if k != "vit"}


def save_torch_compatible(path: str, tree: Any) -> None:
    """Persist a pytree as a flat numpy .npz keyed by '/'-joined paths -
    loadable from torch land without jax installed."""
    flat = {}
    for keypath, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        # DictKey -> .key, SequenceKey -> .idx, GetAttrKey (namedtuple /
        # dataclass nodes, e.g. optax states) -> .name
        name = "/".join(
            str(getattr(k, "key",
                        getattr(k, "idx", getattr(k, "name", k))))
            for k in keypath
        )
        flat[name] = np.asarray(leaf)
    np.savez(path, **flat)


def load_reference_checkpoint(path: str):
    """Load a reference ``.pth`` payload (torch) for conversion."""
    import torch

    return torch.load(path, map_location="cpu", weights_only=False)
