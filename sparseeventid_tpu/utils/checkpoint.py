"""Checkpoint manager — parity with the reference's two checkpoint systems
(/root/reference/src/utils/create_trainer.py:83-118 ModelCheckpoint +
auto-resume; src/utils/torch/trainer.py:454-583 text-index + keep-5 GC),
including encoder-only transfer + freeze (create_trainer.py:94-106).

Format: flax msgpack serialization of the TrainState pytree + a small JSON
sidecar, a human-readable ``checkpoint`` index file with a ``latest:``
pointer, and keep-N garbage collection.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Optional, Tuple

import flax.serialization
import jax
import numpy as np

from .logger import getLogger

logger = getLogger()


class CheckpointManager:
    def __init__(self, directory: str | Path, keep: int = 5):
        self.dir = Path(directory)
        self.keep = keep
        self.dir.mkdir(parents=True, exist_ok=True)
        self.index = self.dir / "checkpoint"

    # ---- save -----------------------------------------------------------
    def save(self, state: Any, step: int) -> Path:
        path = self.dir / f"step_{step}.msgpack"
        host_state = jax.device_get(state)
        path.write_bytes(flax.serialization.to_bytes(host_state))
        self._update_index(step)
        self._gc()
        logger.info(f"Saved checkpoint {path}")
        return path

    def _update_index(self, step: int):
        entries = self._read_index()
        entries = [e for e in entries if e != step] + [step]
        lines = [f"latest: step_{step}.msgpack"] + [
            f"step: step_{e}.msgpack" for e in entries
        ]
        self.index.write_text("\n".join(lines) + "\n")

    def _read_index(self):
        if not self.index.exists():
            return []
        steps = []
        for line in self.index.read_text().splitlines():
            if line.startswith("step: step_"):
                steps.append(int(line.split("step_")[1].split(".")[0]))
        return steps

    def _gc(self):
        entries = self._read_index()
        for old in entries[: -self.keep] if len(entries) > self.keep else []:
            p = self.dir / f"step_{old}.msgpack"
            if p.exists():
                p.unlink()
        if len(entries) > self.keep:
            kept = entries[-self.keep :]
            lines = [f"latest: step_{kept[-1]}.msgpack"] + [
                f"step: step_{e}.msgpack" for e in kept
            ]
            self.index.write_text("\n".join(lines) + "\n")

    # ---- restore --------------------------------------------------------
    def latest_step(self) -> Optional[int]:
        entries = self._read_index()
        if entries:
            return entries[-1]
        # fall back to globbing (create_trainer.py:111-118 auto-resume)
        cands = sorted(self.dir.glob("step_*.msgpack"))
        if not cands:
            return None
        return max(int(p.stem.split("_")[1]) for p in cands)

    def restore(self, target: Any, step: Optional[int] = None) -> Tuple[Any, int]:
        """Restore into the structure of ``target`` (a template TrainState)."""
        if step is None:
            step = self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.dir}")
        path = self.dir / f"step_{step}.msgpack"
        state = flax.serialization.from_bytes(target, path.read_bytes())
        logger.info(f"Restored checkpoint {path}")
        return state, step


def load_encoder_only(target_params: Any, ckpt_path: str | Path, template: Any):
    """Transfer-learning restore: copy only encoder.* params from a checkpoint
    (create_trainer.py:94-106 restore_encoder_only). Returns new params; the
    caller freezes the encoder via an optax.multi_transform mask."""
    state = flax.serialization.from_bytes(template, Path(ckpt_path).read_bytes())
    src_encoder = state.params["encoder"]
    new_params = dict(target_params)
    new_params["encoder"] = src_encoder
    return type(target_params)(new_params) if not isinstance(
        target_params, dict
    ) else new_params


def encoder_freeze_mask(params: Any):
    """optax label pytree: 'frozen' for encoder.*, 'trainable' otherwise."""
    import flax.traverse_util as tu

    flat = tu.flatten_dict(params)
    labels = {
        k: ("frozen" if k[0] == "encoder" else "trainable") for k in flat
    }
    return tu.unflatten_dict(labels)
