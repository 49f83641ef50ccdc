"""Training loop with checkpoint/resume over the flow-matching objectives.

The reference ships no training code (SURVEY.md §4/§5); this provides the
framework capability: optimiser construction, jitted DP/TP-shardable steps,
periodic orbax checkpointing, and resume.

The default ``objective="pyramid"`` trains the model the sampler actually
runs (training/flow_matching.py ``pyramid_flow_matching_loss``: packed
multi-clip past-condition layout + per-stage renoised endpoints, the rebuild
of ref pipeline.py:439-524's inference walk as a loss). Each step samples
``(stage, unit_index)`` host-side from a counter-derived RNG — deterministic
and resume-stable, and static under jit so a full run compiles at most
``n_stages x n_unit_layouts`` programs (flow_matching.py:37-42).
``objective="single_clip"`` keeps the generic velocity-regression step.
"""

from __future__ import annotations

import os
import time
from typing import Callable, Dict, Iterable, Optional

import jax
import numpy as np
import optax

from ..config import MMDiTConfig, PipelineConfig
from ..io.checkpoint import load_metadata, restore_pytree, save_pytree
from ..models.scheduler import FlowMatchSchedule
from .flow_matching import make_pyramid_train_step, make_train_step


class Trainer:
    def __init__(self, mcfg: MMDiTConfig, params, learning_rate: float = 1e-4,
                 weight_decay: float = 0.01, ckpt_dir: Optional[str] = None,
                 objective: str = "pyramid",
                 pcfg: Optional[PipelineConfig] = None,
                 sample_seed: int = 0):
        assert objective in ("pyramid", "single_clip"), objective
        self.mcfg = mcfg
        self.params = params
        self.optimizer = optax.adamw(learning_rate, weight_decay=weight_decay)
        self.opt_state = self.optimizer.init(params)
        self.objective = objective
        self.sample_seed = sample_seed
        if objective == "pyramid":
            self.pcfg = pcfg or PipelineConfig()
            schedule = FlowMatchSchedule(self.pcfg.scheduler)
            # jitted inside make_pyramid_train_step (stage/unit static)
            self.step_fn = make_pyramid_train_step(mcfg, self.pcfg, schedule,
                                                   self.optimizer)
        else:
            self.pcfg = pcfg
            self.step_fn = jax.jit(make_train_step(mcfg, self.optimizer))
        self.ckpt_dir = ckpt_dir
        self.step = 0

    def _sample_stage_unit(self, batch: Dict):
        """Host-side (stage, unit_index) draw for this step's batch.

        Seeded by (sample_seed, step) so a restored trainer replays the same
        curriculum; unit_index ranges over the units the batch's clip length
        supports (frame 0 is the conditioning frame, firstframe_mask
        semantics of pyramid_flow_matching_loss)."""
        fpu = self.pcfg.frame_per_unit
        n_units = batch["latents"].shape[2] // fpu
        if n_units < 2:
            raise ValueError(
                f"pyramid objective needs clips of >= 2 latent units "
                f"({2 * fpu} frames at frame_per_unit={fpu}): unit 0 is the "
                f"conditioning context, the denoised unit is drawn from "
                f"units >= 1 — got latents with {batch['latents'].shape[2]} "
                f"frames ({n_units} unit)")
        rng = np.random.default_rng([self.sample_seed, self.step])
        stage = int(rng.integers(0, len(self.pcfg.stages)))
        unit_index = int(rng.integers(1, n_units))
        return stage, unit_index

    def train(self, batches: Iterable[Dict], key: jax.Array,
              ckpt_every: int = 0, log_every: int = 10,
              log_fn: Callable[[str], None] = print):
        losses = []
        for batch in batches:
            key, sub = jax.random.split(key)
            if self.objective == "pyramid":
                stage, unit_index = self._sample_stage_unit(batch)
                self.params, self.opt_state, loss = self.step_fn(
                    self.params, self.opt_state, batch, sub,
                    stage=stage, unit_index=unit_index)
            else:
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
                    metadata={"step": self.step, "time": time.time(),
                              "objective": self.objective,
                              "sample_seed": self.sample_seed})
        return path

    def restore(self, path: str) -> None:
        # validate metadata BEFORE restoring any state: a mismatched
        # checkpoint must leave the trainer untouched, not half-restored
        # (a caller catching the ValueError would otherwise continue with
        # the wrong objective's params and a stale self.step)
        meta = load_metadata(path)
        saved_obj = meta.get("objective")
        if saved_obj is not None and saved_obj != self.objective:
            raise ValueError(
                f"checkpoint {path} was trained with objective={saved_obj!r}; "
                f"this trainer is configured objective={self.objective!r} — "
                "restoring would silently continue with the wrong loss")
        state = restore_pytree(path, {"params": self.params, "opt_state": self.opt_state})
        self.params = state["params"]
        self.opt_state = state["opt_state"]
        self.step = int(meta.get("step", self.step))
        # the (stage, unit) curriculum is derived from (sample_seed, step),
        # so restoring both resumes the exact sampling stream
        self.sample_seed = int(meta.get("sample_seed", self.sample_seed))
