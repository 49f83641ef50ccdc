"""Numerical parity of the JAX MMDiT block + scheduler vs a torch mirror of
the reference math (tests/oracle_torch.py).

The text towers are already pinned to HF torch oracles
(test_text_encoders.py); these tests pin the remaining hot math — the
JointTransformerBlock (AdaLN-Zero, joint attention with q/k RMSNorm,
temporal RoPE, gated residuals; ref mmdit.py:122-433) and the pyramid
flow-match scheduler tables (ref scheduler.py:70-206) — to the reference
implementation itself, with identical weights loaded both ways.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from deepv_tpu.config import MMDiTConfig, SchedulerConfig
from deepv_tpu.models.mmdit import build_attention_bias, joint_block
from deepv_tpu.models.scheduler import FlowMatchSchedule
from deepv_tpu.ops.rope import rope_tables

from oracle_torch import TorchJointBlock, TorchSchedulerOracle, torch_rope_freqs

D, NH, HD = 32, 4, 8
B, LC = 2, 6
CFG = MMDiTConfig(num_attention_heads=NH, attention_head_dim=HD,
                  caption_projection_dim=D, joint_attention_dim=D,
                  pooled_projection_dim=16)


def _lin(m: torch.nn.Linear) -> dict:
    p = {"weight": jnp.asarray(m.weight.detach().numpy())}
    if m.bias is not None:
        p["bias"] = jnp.asarray(m.bias.detach().numpy())
    return p


def _jax_params_from_torch(tb: TorchJointBlock, context_pre_only: bool) -> dict:
    attn = {
        "to_q": _lin(tb.attn.to_q), "to_k": _lin(tb.attn.to_k),
        "to_v": _lin(tb.attn.to_v),
        "add_q_proj": _lin(tb.attn.add_q_proj),
        "add_k_proj": _lin(tb.attn.add_k_proj),
        "add_v_proj": _lin(tb.attn.add_v_proj),
        "norm_q": {"weight": jnp.asarray(tb.attn.norm_q.weight.detach().numpy())},
        "norm_k": {"weight": jnp.asarray(tb.attn.norm_k.weight.detach().numpy())},
        "norm_add_q": {"weight": jnp.asarray(tb.attn.norm_add_q.weight.detach().numpy())},
        "norm_add_k": {"weight": jnp.asarray(tb.attn.norm_add_k.weight.detach().numpy())},
        "to_out": _lin(tb.attn.to_out),
    }
    if not context_pre_only:
        attn["to_add_out"] = _lin(tb.attn.to_add_out)
    block = {
        "norm1": {"linear": _lin(tb.norm1.linear)},
        "norm1_context": {"linear": _lin(tb.norm1_context.linear)},
        "attn": attn,
        "ff": {"proj": _lin(tb.ff.proj), "out": _lin(tb.ff.out)},
    }
    if not context_pre_only:
        block["ff_context"] = {"proj": _lin(tb.ff_context.proj),
                               "out": _lin(tb.ff_context.out)}
    return block


def _randomize(module: torch.nn.Module, seed: int):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.2)


@pytest.mark.parametrize("context_pre_only", [False, True])
def test_joint_block_matches_reference_math(context_pre_only):
    torch.manual_seed(0)
    tb = TorchJointBlock(D, NH, HD, context_pre_only).eval()
    _randomize(tb, 1)
    params = _jax_params_from_torch(tb, context_pre_only)

    # packed sequence: ctx (one masked token) + 3 frames x 4 tokens of video
    rng = np.random.default_rng(2)
    times = np.concatenate([np.zeros(LC),
                            np.repeat(np.arange(3, dtype=np.float64), 4)])
    lv = 12
    s = LC + lv
    hidden = rng.standard_normal((B, lv, D)).astype(np.float32)
    ctx = rng.standard_normal((B, LC, D)).astype(np.float32)
    temb = rng.standard_normal((B, D)).astype(np.float32)
    text_mask = np.ones((B, LC), np.int32)
    text_mask[:, -1] = 0

    # identical mask semantics both ways: same-validity group AND t_q >= t_k
    valid = np.concatenate([text_mask, np.ones((B, lv), np.int32)], axis=1)
    causal = times[:, None] >= times[None, :]
    allowed = (valid[:, :, None] == valid[:, None, :]) & causal[None]

    # torch reference path
    rotary = torch_rope_freqs(torch.from_numpy(np.tile(times, (B, 1))), HD)
    t_mask = torch.from_numpy(allowed)[:, None]  # [B,1,S,S] bool
    with torch.no_grad():
        t_hid, t_ctx = tb(torch.from_numpy(hidden), torch.from_numpy(ctx),
                          torch.from_numpy(temb), [t_mask], [lv], [rotary])

    # jax path
    cos, sin = rope_tables(times, HD)
    bias = build_attention_bias(jnp.asarray(valid), jnp.asarray(causal))
    j_hid, j_ctx = joint_block(
        CFG, params, jnp.asarray(hidden), jnp.asarray(ctx), jnp.asarray(temb),
        ("ref", bias), jnp.asarray(cos, jnp.float32), jnp.asarray(sin, jnp.float32),
        context_pre_only)

    np.testing.assert_allclose(np.asarray(j_hid), t_hid.numpy(),
                               atol=1e-5, rtol=1e-5)
    if not context_pre_only:
        np.testing.assert_allclose(np.asarray(j_ctx), t_ctx.numpy(),
                                   atol=1e-5, rtol=1e-5)


def test_scheduler_tables_match_reference_math():
    cfg = SchedulerConfig()          # deployed: gamma=0.3333, shift=1.0
    mine = FlowMatchSchedule(cfg)
    oracle = TorchSchedulerOracle(cfg.num_train_timesteps, cfg.shift,
                                  cfg.stages, cfg.stage_range, cfg.gamma)

    for i_s in range(cfg.stages):
        assert mine.ori_start_sigmas[i_s] == pytest.approx(
            oracle.ori_start_sigmas[i_s], abs=1e-12)
        assert mine.start_sigmas[i_s] == pytest.approx(
            oracle.start_sigmas[i_s], abs=1e-12)
        assert mine.end_sigmas[i_s] == pytest.approx(
            oracle.end_sigmas[i_s], abs=1e-12)
        np.testing.assert_allclose(mine.timestep_ratios[i_s],
                                   oracle.timestep_ratios[i_s], atol=1e-12)
        np.testing.assert_allclose(
            np.asarray(mine.timesteps_per_stage[i_s]),
            oracle.timesteps_per_stage[i_s].numpy(), atol=1e-4)

    for n in (5, 10):
        for i_s in range(cfg.stages):
            ts, sig = oracle.set_timesteps(n, i_s)
            ss = mine.stage_schedule(n, i_s)
            np.testing.assert_allclose(ss.timesteps, ts.numpy().astype(np.float32),
                                       atol=1e-3)
            np.testing.assert_allclose(ss.sigmas, sig.numpy().astype(np.float32),
                                       atol=1e-6)


def test_scheduler_tables_match_with_shift():
    """Non-trivial SD3 shift exercises the sigma transform (ref scheduler.py:82)."""
    cfg = SchedulerConfig(shift=3.0, gamma=0.5)
    mine = FlowMatchSchedule(cfg)
    oracle = TorchSchedulerOracle(cfg.num_train_timesteps, cfg.shift,
                                  cfg.stages, cfg.stage_range, cfg.gamma)
    for i_s in range(cfg.stages):
        assert mine.start_sigmas[i_s] == pytest.approx(oracle.start_sigmas[i_s], abs=1e-9)
        assert mine.end_sigmas[i_s] == pytest.approx(oracle.end_sigmas[i_s], abs=1e-9)
        ts, sig = oracle.set_timesteps(7, i_s)
        ss = mine.stage_schedule(7, i_s)
        np.testing.assert_allclose(ss.timesteps, ts.numpy().astype(np.float32), rtol=1e-5)
        np.testing.assert_allclose(ss.sigmas, sig.numpy().astype(np.float32), atol=1e-6)
