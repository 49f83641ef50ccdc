"""Minimal training loop with checkpoint/resume over the flow-matching step.

The reference ships no training code (SURVEY.md §4/§5); this provides the
framework capability: optimiser construction, jitted DP/TP-shardable steps,
periodic orbax checkpointing, and resume.
"""

from __future__ import annotations

import os
import time
from typing import Callable, Dict, Iterable, Optional

import jax
import optax

from ..config import MMDiTConfig
from ..io.checkpoint import load_metadata, restore_pytree, save_pytree
from .flow_matching import make_train_step


class Trainer:
    def __init__(self, mcfg: MMDiTConfig, params, learning_rate: float = 1e-4,
                 weight_decay: float = 0.01, ckpt_dir: Optional[str] = None):
        self.mcfg = mcfg
        self.params = params
        self.optimizer = optax.adamw(learning_rate, weight_decay=weight_decay)
        self.opt_state = self.optimizer.init(params)
        self.step_fn = jax.jit(make_train_step(mcfg, self.optimizer))
        self.ckpt_dir = ckpt_dir
        self.step = 0

    def train(self, batches: Iterable[Dict], key: jax.Array,
              ckpt_every: int = 0, log_every: int = 10,
              log_fn: Callable[[str], None] = print):
        losses = []
        for batch in batches:
            key, sub = jax.random.split(key)
            self.params, self.opt_state, loss = self.step_fn(
                self.params, self.opt_state, batch, sub)
            self.step += 1
            losses.append(loss)
            if log_every and self.step % log_every == 0:
                log_fn(f"[train] step {self.step} loss {float(loss):.4f}")
            if ckpt_every and self.ckpt_dir and self.step % ckpt_every == 0:
                self.save()
        return losses

    def save(self, path: Optional[str] = None) -> str:
        path = path or os.path.join(self.ckpt_dir, f"step_{self.step:08d}")
        save_pytree(path, {"params": self.params, "opt_state": self.opt_state},
                    metadata={"step": self.step, "time": time.time()})
        return path

    def restore(self, path: str) -> None:
        state = restore_pytree(path, {"params": self.params, "opt_state": self.opt_state})
        self.params = state["params"]
        self.opt_state = state["opt_state"]
        self.step = int(load_metadata(path).get("step", self.step))
