"""Test-local torch mirror of the reference MMDiT block + scheduler math.

The reference (ref model/mmdit.py, model/scheduler.py) depends on diffusers,
which is not installed here, so its modules cannot be imported directly. This
file re-implements, in plain torch, exactly the math of:

  - ``JointTransformerBlock`` with AdaLN-Zero / AdaLN-continuous, joint
    attention with q/k RMSNorm, temporal RoPE, gated residuals
    (ref mmdit.py:122-433, 435-578)
  - the reference RoPE rotation-matrix construction (ref mmdit.py:999-1028)
  - ``PyramidFlowMatchEulerDiscreteScheduler`` table construction and
    ``set_timesteps`` (ref scheduler.py:70-206)

It exists ONLY as a numerical oracle for tests/test_torch_oracle.py, pinning
the JAX implementation to the reference's math rather than to the builder's
reading of it. Not imported by the package.
"""

import math

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


# ---------------------------------------------------------------------------
# RoPE (ref mmdit.py:999-1028 rope/EmbedNDRoPE + 131-136 apply_rope)
# ---------------------------------------------------------------------------

def torch_rope_freqs(pos: torch.Tensor, dim: int, theta: float = 10000.0):
    """Rotation-matrix tensor [b, seq, 1, dim/2, 2, 2] (ref mmdit.py:999-1013).

    Stacks [cos, -sin, sin, cos] per frequency; the f64 frequency table is
    cast to f32 at the end exactly as the reference does.
    """
    assert dim % 2 == 0
    scale = torch.arange(0, dim, 2, dtype=torch.float64) / dim
    omega = 1.0 / (theta ** scale)
    out = torch.einsum("...n,d->...nd", pos.to(torch.float64), omega)
    stacked = torch.stack([torch.cos(out), -torch.sin(out),
                           torch.sin(out), torch.cos(out)], dim=-1)
    b, s = pos.shape
    return stacked.view(b, s, dim // 2, 2, 2).float().unsqueeze(2)


def torch_apply_rope(xq: torch.Tensor, xk: torch.Tensor, freqs_cis: torch.Tensor):
    """(ref mmdit.py:131-136): contract the 2x2 rotation against (even, odd)."""
    xq_ = xq.float().reshape(*xq.shape[:-1], -1, 1, 2)
    xk_ = xk.float().reshape(*xk.shape[:-1], -1, 1, 2)
    xq_out = freqs_cis[..., 0] * xq_[..., 0] + freqs_cis[..., 1] * xq_[..., 1]
    xk_out = freqs_cis[..., 0] * xk_[..., 0] + freqs_cis[..., 1] * xk_[..., 1]
    return xq_out.reshape(*xq.shape).type_as(xq), xk_out.reshape(*xk.shape).type_as(xk)


# ---------------------------------------------------------------------------
# norms (ref mmdit.py:435-578)
# ---------------------------------------------------------------------------

class TorchRMSNorm(nn.Module):
    """(ref mmdit.py:435-464): f32 variance, scale in input dtype."""

    def __init__(self, dim: int, eps: float):
        super().__init__()
        self.eps = eps
        self.weight = nn.Parameter(torch.ones(dim))

    def forward(self, x):
        dtype = x.dtype
        var = x.to(torch.float32).pow(2).mean(-1, keepdim=True)
        x = x * torch.rsqrt(var + self.eps)
        return (x * self.weight).to(dtype)


class TorchAdaLNZero(nn.Module):
    """AdaLN-Zero (ref mmdit.py:518-578); ``forward_with_pad`` scatter with
    num_stages stage groups (identical to a broadcast at num_stages=1)."""

    def __init__(self, dim: int):
        super().__init__()
        self.linear = nn.Linear(dim, 6 * dim, bias=True)
        self.norm = nn.LayerNorm(dim, elementwise_affine=False, eps=1e-6)

    def forward_with_pad(self, x, emb, hidden_length):
        emb = self.linear(F.silu(emb))
        batch_emb = torch.zeros_like(x).repeat(1, 1, 6)
        i_sum = 0
        num_stages = len(hidden_length)
        for i_p, length in enumerate(hidden_length):
            batch_emb[:, i_sum:i_sum + length] = emb[i_p::num_stages][:, None]
            i_sum += length
        shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = \
            batch_emb.chunk(6, dim=2)
        x = self.norm(x) * (1 + scale_msa) + shift_msa
        return x, gate_msa, shift_mlp, scale_mlp, gate_mlp

    def forward(self, x, emb):
        emb = self.linear(F.silu(emb))
        shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = \
            emb.chunk(6, dim=1)
        x = self.norm(x) * (1 + scale_msa[:, None]) + shift_msa[:, None]
        return x, gate_msa, shift_mlp, scale_mlp, gate_mlp


class TorchAdaLNContinuous(nn.Module):
    """AdaLN-continuous, scale/shift order (ref mmdit.py:467-515)."""

    def __init__(self, dim: int, eps: float = 1e-6):
        super().__init__()
        self.linear = nn.Linear(dim, 2 * dim, bias=True)
        self.norm = nn.LayerNorm(dim, elementwise_affine=False, eps=eps)

    def forward(self, x, emb):
        emb = self.linear(F.silu(emb).to(x.dtype))
        scale, shift = torch.chunk(emb, 2, dim=1)
        return self.norm(x) * (1 + scale)[:, None] + shift[:, None]

    def forward_with_pad(self, x, emb, hidden_length):
        emb = self.linear(F.silu(emb).to(x.dtype))
        batch_emb = torch.zeros_like(x).repeat(1, 1, 2)
        i_sum = 0
        num_stages = len(hidden_length)
        for i_p, length in enumerate(hidden_length):
            batch_emb[:, i_sum:i_sum + length] = emb[i_p::num_stages][:, None]
            i_sum += length
        scale, shift = torch.chunk(batch_emb, 2, dim=2)
        return self.norm(x) * (1 + scale) + shift


class TorchFeedForward(nn.Module):
    """gelu-approximate feed-forward (ref mmdit.py:65-120): the diffusers
    GELU(approximate='tanh') module is a Linear named ``proj`` + tanh gelu."""

    def __init__(self, dim: int, mult: int = 4):
        super().__init__()
        self.proj = nn.Linear(dim, dim * mult, bias=True)   # net.0.proj
        self.out = nn.Linear(dim * mult, dim, bias=True)    # net.2

    def forward(self, x):
        return self.out(F.gelu(self.proj(x), approximate="tanh"))


# ---------------------------------------------------------------------------
# joint attention + block (ref mmdit.py:122-433)
# ---------------------------------------------------------------------------

class TorchJointAttention(nn.Module):
    """JointAttention + VarlenSelfAttentionWithT5Mask (ref mmdit.py:122-324),
    with the per-stage python loop over ``hidden_length``."""

    def __init__(self, dim: int, heads: int, head_dim: int, context_pre_only: bool):
        super().__init__()
        inner = heads * head_dim
        self.heads, self.head_dim = heads, head_dim
        self.context_pre_only = context_pre_only
        self.to_q = nn.Linear(dim, inner, bias=True)
        self.to_k = nn.Linear(dim, inner, bias=True)
        self.to_v = nn.Linear(dim, inner, bias=True)
        self.add_q_proj = nn.Linear(dim, inner, bias=True)
        self.add_k_proj = nn.Linear(dim, inner, bias=True)
        self.add_v_proj = nn.Linear(dim, inner, bias=True)
        self.norm_q = TorchRMSNorm(head_dim, eps=1e-5)
        self.norm_k = TorchRMSNorm(head_dim, eps=1e-5)
        self.norm_add_q = TorchRMSNorm(head_dim, eps=1e-5)
        self.norm_add_k = TorchRMSNorm(head_dim, eps=1e-5)
        self.to_out = nn.Linear(inner, dim, bias=True)
        if not context_pre_only:
            self.to_add_out = nn.Linear(inner, dim, bias=True)

    def forward(self, hidden, ctx, attention_mask, hidden_length, rotary_emb):
        b = hidden.shape[0]
        h, d = self.heads, self.head_dim

        def heads_view(x):
            return x.view(x.shape[0], -1, h, d)

        q = self.norm_q(heads_view(self.to_q(hidden)))
        k = self.norm_k(heads_view(self.to_k(hidden)))
        v = heads_view(self.to_v(hidden))
        cq = self.norm_add_q(heads_view(self.add_q_proj(ctx)))
        ck = self.norm_add_k(heads_view(self.add_k_proj(ctx)))
        cv = heads_view(self.add_v_proj(ctx))

        encoder_length = ctx.shape[1]
        num_stages = len(hidden_length)
        enc_qkv = torch.stack([cq, ck, cv], dim=2)
        qkv = torch.stack([q, k, v], dim=2)

        i_sum = 0
        out_enc_list, out_hid_list = [], []
        for i_p, length in enumerate(hidden_length):
            enc_tokens = enc_qkv[i_p::num_stages]
            vid_tokens = qkv[:, i_sum:i_sum + length]
            cat = torch.cat([enc_tokens, vid_tokens], dim=1)
            if rotary_emb is not None:
                cat[:, :, 0], cat[:, :, 1] = torch_apply_rope(
                    cat[:, :, 0], cat[:, :, 1], rotary_emb[i_p])
            qq, kk, vv = cat.unbind(2)
            o = F.scaled_dot_product_attention(
                qq.transpose(1, 2), kk.transpose(1, 2), vv.transpose(1, 2),
                attn_mask=attention_mask[i_p])
            o = o.transpose(1, 2).flatten(2, 3)
            out_enc_list.append(o[:, :encoder_length])
            out_hid_list.append(o[:, encoder_length:])
            i_sum += length

        out_enc = torch.cat(out_enc_list, dim=0) if num_stages > 1 else out_enc_list[0]
        out_hid = torch.cat(out_hid_list, dim=1)

        out_hid = self.to_out(out_hid)
        if not self.context_pre_only:
            out_enc = self.to_add_out(out_enc)
        return out_hid, out_enc


class TorchJointBlock(nn.Module):
    """JointTransformerBlock (ref mmdit.py:327-433)."""

    def __init__(self, dim: int, heads: int, head_dim: int, context_pre_only: bool):
        super().__init__()
        self.context_pre_only = context_pre_only
        self.norm1 = TorchAdaLNZero(dim)
        self.norm1_context = (TorchAdaLNContinuous(dim) if context_pre_only
                              else TorchAdaLNZero(dim))
        self.attn = TorchJointAttention(dim, heads, head_dim, context_pre_only)
        self.norm2 = nn.LayerNorm(dim, elementwise_affine=False, eps=1e-6)
        self.ff = TorchFeedForward(dim)
        if not context_pre_only:
            self.norm2_context = nn.LayerNorm(dim, elementwise_affine=False, eps=1e-6)
            self.ff_context = TorchFeedForward(dim)

    def forward(self, hidden, ctx, temb, attention_mask, hidden_length, rotary_emb):
        hn, gate_msa, shift_mlp, scale_mlp, gate_mlp = self.norm1.forward_with_pad(
            hidden, temb, hidden_length)
        if self.context_pre_only:
            cn = self.norm1_context(ctx, temb)
        else:
            cn, c_gate_msa, c_shift_mlp, c_scale_mlp, c_gate_mlp = \
                self.norm1_context(ctx, temb)

        attn_out, ctx_attn = self.attn(hn, cn, attention_mask, hidden_length, rotary_emb)

        hidden = hidden + gate_msa * attn_out
        hn2 = self.norm2(hidden) * (1 + scale_mlp) + shift_mlp
        hidden = hidden + gate_mlp * self.ff(hn2)

        if self.context_pre_only:
            return hidden, None
        ctx = ctx + c_gate_msa.unsqueeze(1) * ctx_attn
        cn2 = self.norm2_context(ctx) * (1 + c_scale_mlp[:, None]) + c_shift_mlp[:, None]
        ctx = ctx + c_gate_mlp.unsqueeze(1) * self.ff_context(cn2)
        return hidden, ctx


# ---------------------------------------------------------------------------
# scheduler tables (ref scheduler.py:70-206)
# ---------------------------------------------------------------------------

class TorchSchedulerOracle:
    """Table construction of PyramidFlowMatchEulerDiscreteScheduler.

    init_sigmas (ref scheduler.py:70-88) + init_sigmas_for_each_stage
    (ref scheduler.py:90-149) + set_timesteps (ref scheduler.py:179-206),
    kept in torch to preserve the reference's exact dtype flow
    (f32 sigma table, f64 linspaces).
    """

    def __init__(self, num_train_timesteps=1000, shift=1.0, stages=3,
                 stage_range=(0, 1 / 3, 2 / 3, 1), gamma=1 / 3):
        self.N = num_train_timesteps
        self.gamma = gamma

        timesteps = np.linspace(1, self.N, self.N, dtype=np.float32)[::-1].copy()
        timesteps = torch.from_numpy(timesteps).to(dtype=torch.float32)
        sigmas = timesteps / self.N
        sigmas = shift * sigmas / (1 + (shift - 1) * sigmas)
        self.timesteps = sigmas * self.N
        self.sigmas = sigmas

        stage_distance = []
        self.start_sigmas, self.end_sigmas, self.ori_start_sigmas = {}, {}, {}
        for i_s in range(stages):
            start_indice = max(int(stage_range[i_s] * self.N), 0)
            end_indice = min(int(stage_range[i_s + 1] * self.N), self.N)
            start_sigma = self.sigmas[start_indice].item()
            end_sigma = self.sigmas[end_indice].item() if end_indice < self.N else 0.0
            self.ori_start_sigmas[i_s] = start_sigma
            if i_s != 0:
                ori_sigma = 1 - start_sigma
                corrected_sigma = (1 / (math.sqrt(1 + (1 / gamma)) * (1 - ori_sigma)
                                        + ori_sigma)) * ori_sigma
                start_sigma = 1 - corrected_sigma
            stage_distance.append(start_sigma - end_sigma)
            self.start_sigmas[i_s] = start_sigma
            self.end_sigmas[i_s] = end_sigma

        tot_distance = sum(stage_distance)
        self.timestep_ratios = {}
        for i_s in range(stages):
            start_ratio = 0.0 if i_s == 0 else sum(stage_distance[:i_s]) / tot_distance
            end_ratio = 1.0 if i_s == stages - 1 else sum(stage_distance[:i_s + 1]) / tot_distance
            self.timestep_ratios[i_s] = (start_ratio, end_ratio)

        self.timesteps_per_stage, self.sigmas_per_stage = {}, {}
        for i_s in range(stages):
            ratio = self.timestep_ratios[i_s]
            timestep_max = self.timesteps[int(ratio[0] * self.N)]
            timestep_min = self.timesteps[min(int(ratio[1] * self.N), self.N - 1)]
            ts = np.linspace(timestep_max, timestep_min, self.N + 1)
            # np.linspace on tensor endpoints array-wraps back to a Tensor;
            # the reference guards for exactly this (ref scheduler.py:145)
            self.timesteps_per_stage[i_s] = (
                ts[:-1] if isinstance(ts, torch.Tensor) else torch.from_numpy(ts[:-1]))
            ss = np.linspace(1, 0, self.N + 1)
            self.sigmas_per_stage[i_s] = torch.from_numpy(ss[:-1])

    def set_timesteps(self, num_inference_steps: int, stage_index: int):
        """Returns (timesteps [n], sigmas [n+1]) (ref scheduler.py:179-206)."""
        stage_timesteps = self.timesteps_per_stage[stage_index]
        timesteps = np.linspace(stage_timesteps[0].item(),
                                stage_timesteps[-1].item(), num_inference_steps)
        stage_sigmas = self.sigmas_per_stage[stage_index]
        ratios = np.linspace(stage_sigmas[0].item(), stage_sigmas[-1].item(),
                             num_inference_steps)
        sigmas = torch.cat([torch.from_numpy(ratios), torch.zeros(1)])
        return torch.from_numpy(timesteps), sigmas
