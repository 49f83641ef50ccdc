"""Training-step, trainer, and checkpoint/resume tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepv_tpu.config import MMDiTConfig, PipelineConfig
from deepv_tpu.models.mmdit import init_mmdit_params
from deepv_tpu.models.scheduler import FlowMatchSchedule
from deepv_tpu.training.flow_matching import (flow_matching_loss,
                                              make_pyramid_train_step,
                                              make_train_step,
                                              pyramid_flow_matching_loss)
from deepv_tpu.training.trainer import Trainer

CFG = MMDiTConfig.tiny()


def make_batch(b=2):
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    return {
        "latents": jax.random.normal(ks[0], (b, CFG.in_channels, 2, 8, 8)),
        "text_embeds": jax.random.normal(ks[1], (b, 7, CFG.joint_attention_dim)),
        "text_mask": jnp.ones((b, 7), jnp.int32),
        "pooled": jax.random.normal(ks[2], (b, CFG.pooled_projection_dim)),
    }


def test_loss_finite_and_positive():
    params = init_mmdit_params(jax.random.PRNGKey(0), CFG)
    loss = flow_matching_loss(CFG, params, make_batch(), jax.random.PRNGKey(1))
    assert np.isfinite(float(loss)) and float(loss) > 0


def test_training_reduces_loss():
    import optax
    params = init_mmdit_params(jax.random.PRNGKey(0), CFG)
    opt = optax.adam(3e-3)
    step = jax.jit(make_train_step(CFG, opt))
    opt_state = opt.init(params)
    batch = make_batch()
    key = jax.random.PRNGKey(42)
    first = None
    for i in range(30):
        # fixed key -> fixed noise/sigma: loss must shrink on this example
        params, opt_state, loss = step(params, opt_state, batch, key)
        if first is None:
            first = float(loss)
    assert float(loss) < first * 0.7, (first, float(loss))


# pyramid objective: in_channels must match the pipeline latent (2z + raymap)
PCFG = PipelineConfig()
PYR_CFG = MMDiTConfig(
    sample_size=16, patch_size=2, in_channels=14, num_layers=2,
    attention_head_dim=8, num_attention_heads=4,
    caption_projection_dim=32, pooled_projection_dim=16,
    pos_embed_max_size=32, joint_attention_dim=24)


def make_pyramid_batch(b=2, T=8, hw=8):
    ks = jax.random.split(jax.random.PRNGKey(3), 4)
    return {
        "latents": jax.random.normal(ks[0], (b, 14, T, hw, hw)),
        "text_embeds": jax.random.normal(ks[1], (b, 7, PYR_CFG.joint_attention_dim)),
        "text_mask": jnp.ones((b, 7), jnp.int32),
        "pooled": jax.random.normal(ks[2], (b, PYR_CFG.pooled_projection_dim)),
    }


def test_pyramid_loss_every_stage_finite():
    """The pyramid objective runs the same packed multi-clip layout inference
    compiles — all 3 stages, including renoise-corrupted stage boundaries."""
    params = init_mmdit_params(jax.random.PRNGKey(0), PYR_CFG)
    sched = FlowMatchSchedule(PCFG.scheduler)
    batch = make_pyramid_batch()
    for stage, unit in [(0, 1), (1, 4), (2, 7)]:
        loss = pyramid_flow_matching_loss(PYR_CFG, PCFG, sched, params, batch,
                                          jax.random.PRNGKey(stage), stage, unit)
        assert np.isfinite(float(loss)) and float(loss) > 0, (stage, unit)


def test_pyramid_training_reduces_loss():
    import optax
    params = init_mmdit_params(jax.random.PRNGKey(0), PYR_CFG)
    sched = FlowMatchSchedule(PCFG.scheduler)
    opt = optax.adam(3e-3)
    step = make_pyramid_train_step(PYR_CFG, PCFG, sched, opt)
    opt_state = opt.init(params)
    batch = make_pyramid_batch()
    key = jax.random.PRNGKey(42)
    first = None
    for i in range(25):
        # fixed key/stage/unit -> fixed endpoints: loss must shrink here
        params, opt_state, loss = step(params, opt_state, batch, key,
                                       stage=1, unit_index=3)
        if first is None:
            first = float(loss)
    assert float(loss) < first * 0.7, (first, float(loss))


def test_trainer_pyramid_objective_reduces_loss():
    """The Trainer's DEFAULT objective is the pyramid step (VERDICT r2 #6):
    host-side (stage, unit_index) sampling over the packed multi-clip layout,
    loss decreasing on a fixed batch. T=2 latent frames -> unit_index is
    always 1, so only the 3 stage programs compile."""
    params = init_mmdit_params(jax.random.PRNGKey(0), PYR_CFG)
    trainer = Trainer(PYR_CFG, params, learning_rate=3e-3)
    assert trainer.objective == "pyramid"
    batches = [make_pyramid_batch(T=2) for _ in range(36)]
    losses = [float(l) for l in trainer.train(batches, jax.random.PRNGKey(1),
                                              log_every=0)]
    first, last = np.mean(losses[:6]), np.mean(losses[-6:])
    assert last < first * 0.8, (first, last)


def test_trainer_pyramid_rejects_one_unit_clips():
    """A clip with a single latent unit has no unit >= 1 to denoise (unit 0
    is the conditioning context): the pyramid sampler must fail loudly, not
    draw unit_index=1 and slice an empty current-unit latent."""
    params = init_mmdit_params(jax.random.PRNGKey(0), PYR_CFG)
    trainer = Trainer(PYR_CFG, params, learning_rate=1e-3)
    with pytest.raises(ValueError, match="2 latent units"):
        trainer._sample_stage_unit(make_pyramid_batch(T=1))


def test_trainer_sampling_is_resume_stable():
    """(stage, unit) derive from (sample_seed, step): two trainers at the
    same counter draw the same curriculum, and across steps the curriculum
    covers multiple (stage, unit) layouts."""
    params = init_mmdit_params(jax.random.PRNGKey(0), PYR_CFG)
    t1 = Trainer(PYR_CFG, params, learning_rate=1e-3)
    t2 = Trainer(PYR_CFG, params, learning_rate=1e-3)
    b = make_pyramid_batch()
    seen = set()
    for s in range(30):
        t1.step = t2.step = s
        draw = t1._sample_stage_unit(b)
        assert draw == t2._sample_stage_unit(b)
        stage, unit = draw
        assert 0 <= stage < 3 and 1 <= unit < 8
        seen.add(draw)
    assert len(seen) > 3


def test_trainer_checkpoint_resume(tmp_path):
    params = init_mmdit_params(jax.random.PRNGKey(0), CFG)
    trainer = Trainer(CFG, params, learning_rate=1e-3, ckpt_dir=str(tmp_path),
                      objective="single_clip")
    batches = [make_batch() for _ in range(3)]
    trainer.train(batches, jax.random.PRNGKey(0), log_every=0)
    assert trainer.step == 3
    path = trainer.save()

    trainer2 = Trainer(CFG, init_mmdit_params(jax.random.PRNGKey(7), CFG),
                       learning_rate=1e-3, ckpt_dir=str(tmp_path),
                       objective="single_clip")
    trainer2.restore(path)
    assert trainer2.step == 3
    a = jax.tree.leaves(trainer.params)[0]
    b = jax.tree.leaves(trainer2.params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # a checkpoint saved under one objective must refuse to restore into a
    # trainer configured with the other — silently continuing with the wrong
    # loss is exactly the mismatch the metadata field exists to catch
    trainer3 = Trainer(CFG, init_mmdit_params(jax.random.PRNGKey(7), CFG),
                       learning_rate=1e-3, ckpt_dir=str(tmp_path),
                       objective="pyramid")
    with pytest.raises(ValueError, match="objective"):
        trainer3.restore(path)
