"""Training-step, trainer, and checkpoint/resume tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepv_tpu.config import MMDiTConfig
from deepv_tpu.models.mmdit import init_mmdit_params
from deepv_tpu.training.flow_matching import flow_matching_loss, make_train_step
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


def test_trainer_checkpoint_resume(tmp_path):
    params = init_mmdit_params(jax.random.PRNGKey(0), CFG)
    trainer = Trainer(CFG, params, learning_rate=1e-3, ckpt_dir=str(tmp_path))
    batches = [make_batch() for _ in range(3)]
    trainer.train(batches, jax.random.PRNGKey(0), log_every=0)
    assert trainer.step == 3
    path = trainer.save()

    trainer2 = Trainer(CFG, init_mmdit_params(jax.random.PRNGKey(7), CFG),
                       learning_rate=1e-3, ckpt_dir=str(tmp_path))
    trainer2.restore(path)
    assert trainer2.step == 3
    a = jax.tree.leaves(trainer.params)[0]
    b = jax.tree.leaves(trainer2.params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
