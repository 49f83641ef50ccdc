"""Test-local torch mirror of the reference causal VAE stack + raymap codec.

The reference (ref model/vae.py, pipeline.py:29-163) depends on diffusers /
einops, which are not importable here, so this file re-implements — in plain
torch, preserving the reference's exact semantics — the fidelity-bearing
pieces that tests/test_torch_oracle_vae.py pins the JAX rebuild against:

  - ``CausalConv3d`` with the mutable ``cache_front_feat`` deque and the
    is_init_image / temporal_chunk modes (ref vae.py:169-252)
  - ``CausalGroupNorm`` per-frame statistics (ref vae.py:161-167)
  - ``CausalResnetBlock3D`` (ref vae.py:254-310)
  - spatial/temporal down/up-samplers incl. the pixel-shuffle upsample and
    the temporal unshuffle that drops the duplicated first frame
    (ref vae.py:312-410)
  - ``CausalUNetMidBlock2D`` with per-frame single-head spatial attention
    (diffusers ``Attention`` with heads = C/attention_head_dim = 1,
    group-norm, residual; ref vae.py:412-469)
  - ``CausalVaeEncoder`` / ``CausalVaeDecoder`` + quant convs
    (ref vae.py:630-824) and the chunked window drivers (ref vae.py:865-920)
  - ``get_raymap_from_camera_parameters`` and ``raymap_to_trans_matrix``
    (ref pipeline.py:29-163)

It exists ONLY as a numerical oracle; not imported by the package.
"""

from collections import deque

import torch
import torch.nn as nn
import torch.nn.functional as F


# ---------------------------------------------------------------------------
# causal conv + norm (ref vae.py:161-252)
# ---------------------------------------------------------------------------

class TorchCausalGroupNorm(nn.GroupNorm):
    def forward(self, x):
        b, c, t, h, w = x.shape
        x = x.permute(0, 2, 1, 3, 4).reshape(b * t, c, h, w)
        x = super().forward(x)
        return x.reshape(b, t, c, h, w).permute(0, 2, 1, 3, 4)


class TorchCausalConv3d(nn.Module):
    def __init__(self, in_channels, out_channels, kernel_size=3, stride=1, bias=True):
        super().__init__()
        if isinstance(kernel_size, int):
            kernel_size = (kernel_size,) * 3
        if isinstance(stride, int):
            stride = (stride, 1, 1)
        kt, kh, kw = kernel_size
        self.time_kernel_size = kt
        self.temporal_stride = stride[0]
        self.time_pad = kt - 1
        hp, wp = kh // 2, kw // 2
        self.time_causal_padding = (wp, wp, hp, hp, self.time_pad, 0)
        self.time_uncausal_padding = (wp, wp, hp, hp, 0, 0)
        self.conv = nn.Conv3d(in_channels, out_channels, kernel_size,
                              stride=stride, padding=0, bias=bias)
        self.cache_front_feat = deque()

    def forward(self, x, is_init_image=True, temporal_chunk=False):
        if not temporal_chunk:
            x = F.pad(x, self.time_causal_padding)
        elif is_init_image:
            x = F.pad(x, self.time_causal_padding)
            self.cache_front_feat.clear()
            self.cache_front_feat.append(x[:, :, -2:].clone().detach())
        else:
            x = F.pad(x, self.time_uncausal_padding)
            front = self.cache_front_feat.pop()
            self.cache_front_feat.clear()
            if self.temporal_stride == 1 and self.time_kernel_size == 3:
                x = torch.cat([front, x], dim=2)
            elif self.temporal_stride == 2 and self.time_kernel_size == 3:
                x = torch.cat([front[:, :, -1:], x], dim=2)
            self.cache_front_feat.append(x[:, :, -2:].clone().detach())
        return self.conv(x)


class TorchCausalResnetBlock3D(nn.Module):
    """(ref vae.py:254-310), output_scale_factor=1."""

    def __init__(self, in_channels, out_channels, groups):
        super().__init__()
        self.norm1 = TorchCausalGroupNorm(groups, in_channels, eps=1e-6, affine=True)
        self.conv1 = TorchCausalConv3d(in_channels, out_channels, 3)
        self.norm2 = TorchCausalGroupNorm(groups, out_channels, eps=1e-6, affine=True)
        self.conv2 = TorchCausalConv3d(out_channels, out_channels, 3)
        self.conv_shortcut = (TorchCausalConv3d(in_channels, out_channels, 1)
                              if in_channels != out_channels else None)

    def forward(self, x, is_init_image=True, temporal_chunk=False):
        h = self.conv1(F.silu(self.norm1(x)), is_init_image, temporal_chunk)
        h = self.conv2(F.silu(self.norm2(h)), is_init_image, temporal_chunk)
        if self.conv_shortcut is not None:
            x = self.conv_shortcut(x, is_init_image, temporal_chunk)
        return x + h


class TorchCausalUpsample2x(nn.Module):
    """conv to 4c then 'b (c p1 p2) t h w -> b c t (h p1) (w p2)'
    (ref vae.py:359-383)."""

    def __init__(self, channels):
        super().__init__()
        self.conv = TorchCausalConv3d(channels, channels * 4, 3)

    def forward(self, x, is_init_image=True, temporal_chunk=False):
        y = self.conv(x, is_init_image, temporal_chunk)
        b, c4, t, h, w = y.shape
        y = y.reshape(b, c4 // 4, 2, 2, t, h, w)
        y = y.permute(0, 1, 4, 5, 2, 6, 3)          # b c t h p1 w p2
        return y.reshape(b, c4 // 4, t, h * 2, w * 2)


class TorchCausalTemporalUpsample2x(nn.Module):
    """conv to 2c, 'b (c p) t h w -> b c (t p) h w', drop duplicated first
    frame on the initial chunk (ref vae.py:385-410)."""

    def __init__(self, channels):
        super().__init__()
        self.conv = TorchCausalConv3d(channels, channels * 2, 3)

    def forward(self, x, is_init_image=True, temporal_chunk=False):
        y = self.conv(x, is_init_image, temporal_chunk)
        b, c2, t, h, w = y.shape
        y = y.reshape(b, c2 // 2, 2, t, h, w)
        y = y.permute(0, 1, 3, 2, 4, 5).reshape(b, c2 // 2, t * 2, h, w)
        if is_init_image:
            y = y[:, :, 1:]
        return y


class TorchMidAttention(nn.Module):
    """diffusers ``Attention`` as instantiated by the mid block
    (ref vae.py:439-445): heads = C // attention_head_dim = 1 (the factories
    pass attention_head_dim = C), group-norm on the input, scale 1/sqrt(C),
    residual connection, rescale factor 1."""

    def __init__(self, channels, groups):
        super().__init__()
        self.group_norm = nn.GroupNorm(groups, channels, eps=1e-6, affine=True)
        self.to_q = nn.Linear(channels, channels, bias=True)
        self.to_k = nn.Linear(channels, channels, bias=True)
        self.to_v = nn.Linear(channels, channels, bias=True)
        self.to_out = nn.Linear(channels, channels, bias=True)

    def forward(self, x):
        # x: [bt, c, h, w] (the mid block flattens time into batch,
        # ref vae.py:462-466)
        bt, c, h, w = x.shape
        residual = x
        hs = x.view(bt, c, h * w).transpose(1, 2)         # [bt, hw, c]
        hs = self.group_norm(hs.transpose(1, 2)).transpose(1, 2)
        q, k, v = self.to_q(hs), self.to_k(hs), self.to_v(hs)
        logits = torch.einsum("bqc,bkc->bqk", q, k) / (c ** 0.5)
        # diffusers upcasts the softmax to AT LEAST f32; for the f64 oracle
        # runs a hard .float() would downcast and leak f32 noise.
        ct = torch.promote_types(logits.dtype, torch.float32)
        weights = torch.softmax(logits.to(ct), dim=-1).to(v.dtype)
        out = torch.einsum("bqk,bkc->bqc", weights, v)
        out = self.to_out(out)
        out = out.transpose(1, 2).view(bt, c, h, w)
        return out + residual


class TorchCausalMidBlock(nn.Module):
    """(ref vae.py:412-469): resnet, then (attn, resnet); attention applied
    per frame by folding time into batch."""

    def __init__(self, channels, groups):
        super().__init__()
        self.resnets = nn.ModuleList([
            TorchCausalResnetBlock3D(channels, channels, groups),
            TorchCausalResnetBlock3D(channels, channels, groups)])
        self.attentions = nn.ModuleList([TorchMidAttention(channels, groups)])

    def forward(self, x, is_init_image=True, temporal_chunk=False):
        x = self.resnets[0](x, is_init_image, temporal_chunk)
        b, c, t, h, w = x.shape
        for attn, resnet in zip(self.attentions, self.resnets[1:]):
            x = x.permute(0, 2, 1, 3, 4).reshape(b * t, c, h, w)
            x = attn(x)
            x = x.reshape(b, t, c, h, w).permute(0, 2, 1, 3, 4)
            x = resnet(x, is_init_image, temporal_chunk)
        return x


# ---------------------------------------------------------------------------
# encoder / decoder (ref vae.py:630-824); topology driven by VAEConfig fields
# ---------------------------------------------------------------------------

class TorchCausalVaeEncoder(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        ech = cfg.encoder_block_out_channels
        g = cfg.encoder_norm_num_groups
        self.conv_in = TorchCausalConv3d(cfg.encoder_in_channels, ech[0], 3)
        self.down_blocks = nn.ModuleList()
        c_prev = ech[0]
        for i, c_out in enumerate(ech):
            block = nn.Module()
            block.resnets = nn.ModuleList([
                TorchCausalResnetBlock3D(c_prev if j == 0 else c_out, c_out, g)
                for j in range(cfg.encoder_layers_per_block[i])])
            block.downsampler = (TorchCausalConv3d(c_out, c_out, 3, stride=(1, 2, 2))
                                 if cfg.encoder_spatial_down_sample[i] else None)
            block.temporal_downsampler = (
                TorchCausalConv3d(c_out, c_out, 3, stride=(2, 1, 1))
                if cfg.encoder_temporal_down_sample[i] else None)
            self.down_blocks.append(block)
            c_prev = c_out
        self.mid_block = TorchCausalMidBlock(ech[-1], g)
        self.conv_norm_out = TorchCausalGroupNorm(g, ech[-1], eps=1e-6, affine=True)
        self.conv_out = TorchCausalConv3d(ech[-1], 2 * cfg.encoder_out_channels, 3)
        self.quant_conv = TorchCausalConv3d(2 * cfg.encoder_out_channels,
                                            2 * cfg.encoder_out_channels, 1)

    def forward(self, x, is_init_image=True, temporal_chunk=False):
        x = self.conv_in(x, is_init_image, temporal_chunk)
        for block in self.down_blocks:
            for resnet in block.resnets:
                x = resnet(x, is_init_image, temporal_chunk)
            if block.downsampler is not None:
                x = block.downsampler(x, is_init_image, temporal_chunk)
            if block.temporal_downsampler is not None:
                x = block.temporal_downsampler(x, is_init_image, temporal_chunk)
        x = self.mid_block(x, is_init_image, temporal_chunk)
        x = F.silu(self.conv_norm_out(x))
        x = self.conv_out(x, is_init_image, temporal_chunk)
        return self.quant_conv(x, is_init_image, temporal_chunk)


class TorchCausalVaeDecoder(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        dch = cfg.decoder_block_out_channels
        rev = list(reversed(dch))
        g = cfg.decoder_norm_num_groups
        self.post_quant_conv = TorchCausalConv3d(cfg.encoder_out_channels,
                                                 cfg.decoder_in_channels, 1)
        self.conv_in = TorchCausalConv3d(cfg.decoder_in_channels, dch[-1], 3)
        self.mid_block = TorchCausalMidBlock(dch[-1], g)
        self.up_blocks = nn.ModuleList()
        c_prev = rev[0]
        for i, c_out in enumerate(rev):
            block = nn.Module()
            block.resnets = nn.ModuleList([
                TorchCausalResnetBlock3D(c_prev if j == 0 else c_out, c_out, g)
                for j in range(cfg.decoder_layers_per_block[i])])
            block.upsampler = (TorchCausalUpsample2x(c_out)
                               if cfg.decoder_spatial_up_sample[i] else None)
            block.temporal_upsampler = (TorchCausalTemporalUpsample2x(c_out)
                                        if cfg.decoder_temporal_up_sample[i] else None)
            self.up_blocks.append(block)
            c_prev = c_out
        self.conv_norm_out = TorchCausalGroupNorm(g, dch[0], eps=1e-6, affine=True)
        self.conv_out = TorchCausalConv3d(dch[0], cfg.decoder_out_channels, 3)

    def forward(self, z, is_init_image=True, temporal_chunk=False):
        x = self.post_quant_conv(z, is_init_image, temporal_chunk)
        x = self.conv_in(x, is_init_image, temporal_chunk)
        x = self.mid_block(x, is_init_image, temporal_chunk)
        for block in self.up_blocks:
            for resnet in block.resnets:
                x = resnet(x, is_init_image, temporal_chunk)
            if block.upsampler is not None:
                x = block.upsampler(x, is_init_image, temporal_chunk)
            if block.temporal_upsampler is not None:
                x = block.temporal_upsampler(x, is_init_image, temporal_chunk)
        x = F.silu(self.conv_norm_out(x))
        return self.conv_out(x, is_init_image, temporal_chunk)


def chunk_windows(t: int, window: int):
    """Reference window split (ref vae.py:867-876): [window+1, window, ...,
    rest]."""
    init = window + 1
    sizes = [min(init, t)]
    fid = init
    while fid + window <= t:
        sizes.append(window)
        fid += window
    if fid < t:
        sizes.append(t - fid)
    return sizes


def torch_chunked(module, x, window: int):
    """chunk_encode / chunk_decode driver (ref vae.py:865-920): first window
    is_init_image=True, later windows reuse the per-layer cache deques."""
    outs = []
    fid = 0
    for idx, size in enumerate(chunk_windows(x.shape[2], window)):
        outs.append(module(x[:, :, fid:fid + size], is_init_image=(idx == 0),
                           temporal_chunk=True))
        fid += size
    return torch.cat(outs, dim=2)


# ---------------------------------------------------------------------------
# raymap codec (ref pipeline.py:29-163)
# ---------------------------------------------------------------------------

def torch_raymap_from_camera(trans2d, trans3d, depth_shape, vae_downsample=1):
    """(ref pipeline.py:42-75). trans2d/trans3d: [t, 4, 4]; returns
    [t, 6, H/ds, W/ds]."""
    H, W = depth_shape
    fu = trans2d[:, 0, 0].unsqueeze(-1).unsqueeze(-1)
    fv = trans2d[:, 1, 1].unsqueeze(-1).unsqueeze(-1)
    cu = trans2d[:, 0, 2].unsqueeze(-1).unsqueeze(-1)
    cv = trans2d[:, 1, 2].unsqueeze(-1).unsqueeze(-1)
    u, v = torch.meshgrid(torch.arange(W, dtype=trans2d.dtype),
                          torch.arange(H, dtype=trans2d.dtype), indexing="xy")
    u = u.unsqueeze(0).repeat(trans2d.shape[0], 1, 1)
    v = v.unsqueeze(0).repeat(trans2d.shape[0], 1, 1)
    x_cam = (u - cu) / fu
    y_cam = (v - cv) / fv
    ones = torch.ones_like(u)
    ray_d = torch.stack((x_cam, y_cam, ones, ones), dim=-1)      # [t,H,W,4]
    ray_d = ray_d.permute(0, 3, 1, 2)                             # t c h w

    rot = trans3d.clone()
    rot[:, :3, 3] = 0.0
    ray_d = F.avg_pool2d(ray_d, kernel_size=vae_downsample, stride=vae_downsample)
    t_, _, rh, rw = ray_d.shape
    ray_d = ray_d.reshape(t_, 4, rh * rw)
    ray_d_world = torch.bmm(rot, ray_d).reshape(t_, 4, rh, rw)[:, :3]
    ray_d_world = ray_d_world / ray_d_world.norm(dim=1, keepdim=True)
    ray_o_world = (torch.ones_like(ray_d_world)
                   * trans3d[:, :3, 3].unsqueeze(-1).unsqueeze(-1))
    return torch.cat([ray_d_world, ray_o_world], dim=1)


def torch_raymap_to_trans_matrix(raymap, trans3d_scale_factor=1.0,
                                 append_first_reference=False,
                                 from_relative_to_absolute=False,
                                 vae_downsample=8):
    """(ref pipeline.py:77-163); operates on a clone (the reference mutates
    its input in place)."""
    raymap = raymap.clone()
    b, _, t, h, w = raymap.shape
    ref_ray = raymap[:, :3].mean(dim=[-1, -2]).unsqueeze(-1).unsqueeze(-1)
    ref_ray = ref_ray / ref_ray.norm(dim=1, keepdim=True)
    projection = (raymap[:, :3] * ref_ray).sum(dim=1, keepdim=True)
    raymap[:, :3] = raymap[:, :3] / projection

    ray_o = raymap[:, 3:].permute(0, 2, 3, 4, 1) / trans3d_scale_factor
    ray_d = raymap[:, :3].permute(0, 2, 3, 4, 1)
    ray_o = torch.sign(ray_o) * (ray_o.abs() ** 2)

    location = ray_o.reshape(b, t, -1, 3).mean(dim=-2)
    image_location = (ray_o + ray_d).reshape(b, t, -1, 3).mean(dim=-2)
    focal = torch.norm(image_location - location, dim=-1)
    z_dir = image_location - location

    w_left = ray_d[:, :, :, :1, :].reshape(b, t, -1, 3).mean(dim=-2)
    w_right = ray_d[:, :, :, -1:, :].reshape(b, t, -1, 3).mean(dim=-2)
    wvec = w_right - w_left
    w_real = torch.norm(torch.cross(wvec, z_dir, dim=-1), dim=-1) / (w - 1) * w
    h_up = ray_d[:, :, :1, :, :].reshape(b, t, -1, 3).mean(dim=-2)
    h_down = ray_d[:, :, -1:, :, :].reshape(b, t, -1, 3).mean(dim=-2)
    hvec = h_up - h_down
    h_real = torch.norm(torch.cross(hvec, z_dir, dim=-1), dim=-1) / (h - 1) * h

    x_dir = w_right - w_left
    y_dir = torch.cross(z_dir, x_dir, dim=-1)
    x_dir = torch.cross(y_dir, z_dir, dim=-1)
    x_dir = x_dir / torch.norm(x_dir, dim=-1, keepdim=True)
    y_dir = y_dir / torch.norm(y_dir, dim=-1, keepdim=True)
    z_dir = z_dir / torch.norm(z_dir, dim=-1, keepdim=True)

    camera_pose = torch.zeros((b, t, 4, 4), dtype=raymap.dtype)
    camera_pose[:, :, :3, 0] = x_dir
    camera_pose[:, :, :3, 1] = y_dir
    camera_pose[:, :, :3, 2] = z_dir
    camera_pose[:, :, :3, 3] = location
    camera_pose[:, :, 3, 3] = 1.0

    intri_rescale = (w / w_real + h / h_real) / 2 * vae_downsample
    intrinsic = torch.zeros((b, t, 4, 4), dtype=raymap.dtype)
    intrinsic[:, :, 0, 0] = focal * intri_rescale
    intrinsic[:, :, 1, 1] = focal * intri_rescale
    intrinsic[:, :, 0, 2] = w / 2 * vae_downsample
    intrinsic[:, :, 1, 2] = h / 2 * vae_downsample
    intrinsic[:, :, 2, 2] = 1.0
    intrinsic[:, :, 3, 3] = 1.0

    if append_first_reference:
        eye = torch.eye(4, dtype=camera_pose.dtype)[None, None].repeat(b, 1, 1, 1)
        camera_pose = torch.cat([eye, camera_pose], dim=1)
        intrinsic = torch.cat([intrinsic[:, :1], intrinsic], dim=1)

    if from_relative_to_absolute:
        for i in range(t):
            camera_pose[:, i + 1] = torch.bmm(camera_pose[:, i],
                                              camera_pose[:, i + 1])
    return camera_pose, intrinsic
