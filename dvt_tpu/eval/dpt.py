"""DPT decoder head for depth (alternative to the linear BNHead).

TPU rebuild of the reference's DPTHead fork (evaluation/depth/models/
decode_heads/dpt_head.py, itself from the DPT paper): four ViT feature maps
are "reassembled" to a 4-scale pyramid, projected to a common width, then
fused coarsest-to-finest with residual conv units and 2x upsampling; a
small conv stack regresses depth. Output is a (B, 16h, 16w) depth map from
(B, h, w, C) taps. NHWC, flax.

Two variants:

* ``variant="tpu"`` (default): parameterless bilinear upsampling for the
  up-reassembles and post-act residual units — fewer params, the same
  output geometry, fastest on TPU.
* ``variant="reference"``: weight-compatible with the reference head so
  torch DPT checkpoints map through ``models/convert.py``
  (``convert_dpt_state_dict``): learnable k4s4 / k2s2 deconv reassembles
  (dpt_head.py:88-115), pre-act ResidualConvUnits with bias-free convs
  (dpt_head.py:199-211), torch-exact pad-1 stride-2 conv for the coarsest
  reassemble, skip resized *before* its residual unit with
  align_corners=False (dpt_head.py:238-252), a project conv+ReLU stage
  before the depth head (dpt_head.py:310-316), and ``relu + min_depth``
  output (decode_head.py:68,191 — scale_up defaults False).
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from dvt_tpu.eval.seg import bilinear_upsample

Array = jax.Array


def block_deconv(x: Array, kernel: Array, bias: Array, k: int) -> Array:
    """torch ConvTranspose2d with kernel_size == stride == k (the DPT
    reassemble deconvs): output blocks never overlap, so the whole op is
    one einsum (an MXU matmul) + reshape — no lax.conv_transpose semantics
    to match. kernel layout is torch's (in, out, kH, kW);
    out[b, i*k+a, j*k+c, o] = sum_ci x[b, i, j, ci] * kernel[ci, o, a, c].
    """
    b, h, w, _ = x.shape
    y = jnp.einsum("bhwc,coal->bhawlo", x, kernel)
    y = y.reshape(b, h * k, w * k, kernel.shape[1])
    return y + bias


class ResidualConvUnit(nn.Module):
    """Post-act RCU (tpu variant): x + conv2(relu(conv1(relu(x))))."""

    channels: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        y = nn.relu(x)
        y = nn.Conv(self.channels, (3, 3), padding="SAME", name="conv1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.channels, (3, 3), padding="SAME", name="conv2")(y)
        return x + y


class PreActResidualConvUnit(nn.Module):
    """Reference PreActResidualConvUnit (dpt_head.py:199-211): ConvModule
    order ('act','conv','norm') with norm_cfg=None and bias=False — i.e.
    x + conv2(relu(conv1(relu(x)))) with bias-free convs."""

    channels: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        y = nn.relu(x)
        y = nn.Conv(self.channels, (3, 3), padding="SAME", use_bias=False,
                    name="conv1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.channels, (3, 3), padding="SAME", use_bias=False,
                    name="conv2")(y)
        return x + y


class FeatureFusionBlock(nn.Module):
    channels: int
    preact: bool = False  # reference-variant residual units + skip order

    @nn.compact
    def __call__(self, x: Array, skip: Optional[Array] = None) -> Array:
        rcu = PreActResidualConvUnit if self.preact else ResidualConvUnit
        if skip is not None:
            if self.preact:
                # reference order (dpt_head.py:238-249): resize the skip
                # FIRST (align_corners=False), then its residual unit
                if skip.shape[1:3] != x.shape[1:3]:
                    skip = bilinear_upsample(skip, x.shape[1:3],
                                             align_corners=False)
                x = x + rcu(self.channels, name="rcu1")(skip)
            else:
                y = rcu(self.channels, name="rcu1")(skip)
                if y.shape[1:3] != x.shape[1:3]:
                    # odd grids (e.g. the default 37x37 DINOv2 grid): the
                    # stride-2 reassemble gives ceil(h/2), whose 2x upsample
                    # overshoots by one - resize the skip to x like the
                    # reference head does before adding
                    y = bilinear_upsample(y, x.shape[1:3],
                                          align_corners=True)
                x = x + y
        x = rcu(self.channels, name="rcu2")(x)
        b, h, w, c = x.shape
        x = bilinear_upsample(x, (h * 2, w * 2), align_corners=True)
        x = nn.Conv(self.channels, (1, 1), name="project")(x)
        return x


class DPTHead(nn.Module):
    """4 x (B, h, w, C) ViT taps -> (B, 16h, 16w) depth map."""

    post_process_channels: Sequence[int] = (96, 192, 384, 768)
    channels: int = 256
    min_depth: float = 0.001
    max_depth: float = 10.0
    variant: str = "tpu"  # "reference" = torch-checkpoint-compatible

    @nn.compact
    def __call__(self, feats: Sequence[Array]) -> Array:
        assert len(feats) == 4
        ref = self.variant == "reference"
        # reassemble: scale taps to strides (1/4x, 1/2x, 1x, 2x of the grid)
        outs = []
        for i, (f, ch) in enumerate(zip(feats, self.post_process_channels)):
            y = nn.Conv(ch, (1, 1), name=f"reassemble_{i}_proj")(f)
            b, h, w, _ = y.shape
            if i == 0:
                if ref:  # ConvTranspose2d k4 s4 (dpt_head.py:91-97)
                    kern = self.param(
                        "reassemble_0_deconv_kernel",
                        nn.initializers.lecun_normal(),
                        (ch, ch, 4, 4))
                    bias = self.param("reassemble_0_deconv_bias",
                                      nn.initializers.zeros, (ch,))
                    y = block_deconv(y, kern, bias, 4)
                else:
                    y = bilinear_upsample(y, (h * 4, w * 4))
            elif i == 1:
                if ref:  # ConvTranspose2d k2 s2 (dpt_head.py:98-104)
                    kern = self.param(
                        "reassemble_1_deconv_kernel",
                        nn.initializers.lecun_normal(),
                        (ch, ch, 2, 2))
                    bias = self.param("reassemble_1_deconv_bias",
                                      nn.initializers.zeros, (ch,))
                    y = block_deconv(y, kern, bias, 2)
                else:
                    y = bilinear_upsample(y, (h * 2, w * 2))
            elif i == 3:
                # torch Conv2d k3 s2 p1 pads (1,1) both sides; SAME at
                # stride 2 pads (0,1) — same output size, different taps,
                # so the reference variant pads explicitly
                y = nn.Conv(ch, (3, 3), strides=(2, 2),
                            padding=((1, 1), (1, 1)) if ref else "SAME",
                            name="reassemble_3_down")(y)
            y = nn.Conv(self.channels, (3, 3), padding="SAME", use_bias=False,
                        name=f"scratch_{i}")(y)
            outs.append(y)

        # fuse coarsest -> finest (the reference's fusion_blocks[0] has
        # res_conv_unit1=None — matched here by calling without a skip)
        x = FeatureFusionBlock(self.channels, preact=ref,
                               name="fusion_3")(outs[3])
        for i in (2, 1, 0):
            x = FeatureFusionBlock(self.channels, preact=ref,
                                   name=f"fusion_{i}")(x, outs[i])

        if ref:
            # ConvModule(channels, channels, 3) with default order
            # conv->act (ReLU), before HeadDepth (dpt_head.py:310-316)
            x = nn.Conv(self.channels, (3, 3), padding="SAME",
                        name="project_out")(x)
            x = nn.relu(x)

        x = nn.Conv(self.channels // 2, (3, 3), padding="SAME",
                    name="head_conv1")(x)
        b, h, w, _ = x.shape
        x = bilinear_upsample(x, (h * 2, w * 2), align_corners=ref)
        x = nn.Conv(32, (3, 3), padding="SAME", name="head_conv2")(x)
        x = nn.relu(x)
        x = nn.Conv(1, (1, 1), name="head_conv3")(x)
        if ref:
            # DepthBaseDecodeHead default (scale_up=False) semantics:
            # relu + min_depth (decode_head.py:68,191)
            depth = nn.relu(x[..., 0]) + self.min_depth
        else:
            depth = nn.sigmoid(x[..., 0]) * self.max_depth + self.min_depth
        return depth
