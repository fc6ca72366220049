"""Checkpoint / resume via orbax.

The TPU replacement for the reference's per-backend save/load hooks
(train_wan.py:968-1055: FSDP consolidated safetensors, DeepSpeed ZeRO shards
+ scripts/zero_to_bf16.py offline conversion, diffusers save_pretrained, EMA
dir) — orbax natively saves sharded pytrees and restores them under any mesh,
so the whole ZeRO/FSDP conversion matrix collapses into one path.

Data-order resume (sampler ``_pos_start`` + epoch pickles,
train_wan.py:980-981, 1587-1593) is carried in the ``extra`` tree.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 2):
        self.directory = os.path.abspath(directory)
        options = ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                               create=True)
        self._mgr = ocp.CheckpointManager(self.directory, options=options)

    def save(self, step: int, params: Any, opt_state: Any = None,
             ema: Any = None, extra: Optional[dict] = None):
        """extra: JSON-serialisable metadata (sampler state, global step...)."""
        items = {"params": ocp.args.StandardSave(params)}
        if opt_state is not None:
            items["opt_state"] = ocp.args.StandardSave(opt_state)
        if ema is not None:
            items["ema"] = ocp.args.StandardSave(ema)
        if extra is not None:
            items["extra"] = ocp.args.JsonSave(extra)
        self._mgr.save(step, args=ocp.args.Composite(**items))
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, step: Optional[int] = None, params_like: Any = None,
                opt_state_like: Any = None, ema_like: Any = None,
                with_extra: bool = False):
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            return None
        items = {}
        if params_like is not None:
            items["params"] = ocp.args.StandardRestore(params_like)
        if opt_state_like is not None:
            items["opt_state"] = ocp.args.StandardRestore(opt_state_like)
        if ema_like is not None:
            items["ema"] = ocp.args.StandardRestore(ema_like)
        if with_extra:
            items["extra"] = ocp.args.JsonRestore()
        out = self._mgr.restore(step, args=ocp.args.Composite(**items))
        return dict(out)

    def restore_params(self, step: Optional[int] = None,
                       item: str = "params"):
        """Template-free restore of one saved tree (for consumers that
        don't know the saved structure, e.g. the infer CLI loading a LoRA
        or fine-tune checkpoint produced by the trainers). item='ema'
        picks the EMA weights when the trainer saved them (the
        reference's EMA dir, train_wan.py:1007-1017)."""
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(
                f"no checkpoints under {self.directory}")
        out = self._mgr.restore(
            step,
            args=ocp.args.Composite(**{item: ocp.args.StandardRestore()}))
        return dict(out)[item]

    def close(self):
        self._mgr.close()
