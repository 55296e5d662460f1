"""FPN + LastLevelP6P7 (flax, NHWC).

Capability twin of maskrcnn_benchmark/modeling/backbone/fpn.py as wired for
SWINT-FPN-RETINANET (modeling/backbone/__init__.py:37-81): lateral 1x1 +
output 3x3 convs over Swin stages 3-5 (stage 2 skipped via in_channels 0),
then P6 = conv_s2(P5), P7 = conv_s2(relu(P6)) — use_P5=True since
in_channels_p6p7 == out_channels (fpn.py:137-154).

Upsampling in the top-down path uses nearest-neighbor x2 like the reference
(F.interpolate(scale_factor=2, mode="nearest")), with cropping to the lateral
size when the coarser map rounds up.
"""
from __future__ import annotations

from typing import Any, List

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def _upsample_nearest_2x(x, out_h: int, out_w: int):
    b, h, w, c = x.shape
    x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    return x[:, :out_h, :out_w]


class FPN(nn.Module):
    """3 input levels -> 5 output levels (P3..P7 at strides 8..128)."""

    out_channels: int = 256
    # MODEL.FPN.USE_GN / USE_RELU (reference conv_with_kaiming_uniform
    # blocks, modeling/make_layers.py: optional GroupNorm + ReLU after each
    # lateral/output conv; GLIP configs keep both off)
    use_gn: bool = False
    use_relu: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: List[jnp.ndarray]) -> List[jnp.ndarray]:
        """feats: [stage3 (s8), stage4 (s16), stage5 (s32)] NHWC."""
        assert len(feats) == 3
        c = self.out_channels

        def block(x, ksize, name):
            y = nn.Conv(
                c, (ksize, ksize), padding=(ksize - 1) // 2,
                use_bias=not self.use_gn, dtype=self.dtype, name=name,
            )(x)
            if self.use_gn:
                y = nn.GroupNorm(num_groups=32, dtype=self.dtype, name=f"{name}_gn")(y)
            if self.use_relu:
                y = nn.relu(y)
            return y

        laterals = [
            block(f, 1, f"fpn_inner{i+2}") for i, f in enumerate(feats)
        ]
        # top-down
        merged = [laterals[-1]]
        for i in range(len(laterals) - 2, -1, -1):
            up = _upsample_nearest_2x(
                merged[0], laterals[i].shape[1], laterals[i].shape[2]
            )
            merged.insert(0, laterals[i] + up)

        outs = [
            block(m, 3, f"fpn_layer{i+2}") for i, m in enumerate(merged)
        ]

        p5 = outs[-1]
        p6 = nn.Conv(c, (3, 3), strides=(2, 2), padding=1, dtype=self.dtype, name="p6")(p5)
        p7 = nn.Conv(c, (3, 3), strides=(2, 2), padding=1, dtype=self.dtype, name="p7")(
            nn.relu(p6)
        )
        return outs + [p6, p7]
