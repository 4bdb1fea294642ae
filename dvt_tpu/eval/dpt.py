"""DPT decoder head for depth (alternative to the linear BNHead).

TPU rebuild of the reference's DPTHead fork (evaluation/depth/models/
decode_heads/dpt_head.py, itself from the DPT paper): four ViT feature maps
are "reassembled" to a 4-scale pyramid (the reference uses deconv x4 /
deconv x2 / identity / stride-2 conv; this rebuild uses parameterless
bilinear upsampling for the up scales - same output geometry, different
params, so reference DPT weights do NOT map onto this head), projected to
a common width, then fused coarsest-to-finest with residual conv units
and 2x upsampling; a small conv stack regresses depth. Output is a
(B, 16h, 16w) depth map from (B, h, w, C) taps. NHWC, flax.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax

from dvt_tpu.eval.seg import bilinear_upsample

Array = jax.Array


class ResidualConvUnit(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        y = nn.relu(x)
        y = nn.Conv(self.channels, (3, 3), padding="SAME", name="conv1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.channels, (3, 3), padding="SAME", name="conv2")(y)
        return x + y


class FeatureFusionBlock(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, x: Array, skip: Optional[Array] = None) -> Array:
        if skip is not None:
            y = ResidualConvUnit(self.channels, name="rcu1")(skip)
            if y.shape[1:3] != x.shape[1:3]:
                # odd grids (e.g. the default 37x37 DINOv2 grid): the
                # stride-2 reassemble gives ceil(h/2), whose 2x upsample
                # overshoots by one - resize the skip to x like the
                # reference head does before adding
                y = bilinear_upsample(y, x.shape[1:3], align_corners=True)
            x = x + y
        x = ResidualConvUnit(self.channels, name="rcu2")(x)
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

    @nn.compact
    def __call__(self, feats: Sequence[Array]) -> Array:
        assert len(feats) == 4
        # reassemble: scale taps to strides (1/4x, 1/2x, 1x, 2x of the grid)
        outs = []
        for i, (f, ch) in enumerate(zip(feats, self.post_process_channels)):
            y = nn.Conv(ch, (1, 1), name=f"reassemble_{i}_proj")(f)
            b, h, w, _ = y.shape
            if i == 0:
                y = bilinear_upsample(y, (h * 4, w * 4))
            elif i == 1:
                y = bilinear_upsample(y, (h * 2, w * 2))
            elif i == 3:
                y = nn.Conv(ch, (3, 3), strides=(2, 2), padding="SAME",
                            name="reassemble_3_down")(y)
            y = nn.Conv(self.channels, (3, 3), padding="SAME", use_bias=False,
                        name=f"scratch_{i}")(y)
            outs.append(y)

        # fuse coarsest -> finest
        x = FeatureFusionBlock(self.channels, name="fusion_3")(outs[3])
        for i in (2, 1, 0):
            x = FeatureFusionBlock(self.channels, name=f"fusion_{i}")(
                x, outs[i]
            )

        x = nn.Conv(self.channels // 2, (3, 3), padding="SAME",
                    name="head_conv1")(x)
        b, h, w, _ = x.shape
        x = bilinear_upsample(x, (h * 2, w * 2))
        x = nn.Conv(32, (3, 3), padding="SAME", name="head_conv2")(x)
        x = nn.relu(x)
        x = nn.Conv(1, (1, 1), name="head_conv3")(x)
        depth = nn.sigmoid(x[..., 0]) * self.max_depth + self.min_depth
        return depth
