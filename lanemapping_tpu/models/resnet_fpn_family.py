"""KLane conv-FPN backbone family (ResnetFPN .. ResnetFPN4_Dilated, CBAM).

Parity with `/root/reference/baseline/models/backbone/resnet_fpn.py:13-568`:
nine registered variants that are one architecture parameterised by stage
count, CBAM attention, and dilation — expressed here as a single flax module
with a factory per registered name.  None are used by the shipped configs
(SURVEY.md §2.5: KLane leftovers); transposed-conv up-paths use SAME padding
(shape-equivalent to the reference's explicit output_padding arithmetic).
"""

from __future__ import annotations


import flax.linen as nn
import jax.numpy as jnp

from ..registry import BACKBONE

BN_MOMENTUM = 0.9
BN_EPS = 1e-5


class PlainResidualBlock(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, x, train: bool):
        norm = lambda n: nn.BatchNorm(use_running_average=not train,
                                      momentum=BN_MOMENTUM, epsilon=BN_EPS,
                                      name=n)
        y = nn.Conv(self.channels, (3, 3), padding=[(1, 1), (1, 1)],
                    name="conv1")(x)
        y = norm("bn1")(y)
        y = nn.Conv(self.channels, (3, 3), padding=[(1, 1), (1, 1)],
                    name="conv2")(y)
        y = norm("bn2")(y)
        return x + y  # note: the reference applies no activation here


class CBAMBlock(nn.Module):
    """Conv + channel/spatial attention (reference `ResidualBlockCBAM:33-59`)."""

    channels: int
    r: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.Conv(self.channels, (3, 3), padding=[(1, 1), (1, 1)],
                    name="conv1")(x)
        hidden = int(self.channels * self.r)
        mlp1 = nn.Dense(hidden, name="mlp1")
        mlp2 = nn.Dense(self.channels, name="mlp2")
        fc_avg = x.mean(axis=(1, 2))
        fc_max = x.max(axis=(1, 2))
        fc = nn.sigmoid(mlp2(nn.relu(mlp1(fc_avg)))
                        + mlp2(nn.relu(mlp1(fc_max))))
        xc = x * fc[:, None, None, :]
        fs_avg = xc.mean(axis=-1, keepdims=True)
        fs_max = xc.max(axis=-1, keepdims=True)
        fs = nn.sigmoid(nn.Conv(1, (7, 7), padding=[(3, 3), (3, 3)],
                                name="conv_cbam")(
            jnp.concatenate([fs_avg, fs_max], axis=-1)))
        return x + xc * fs


class ResnetFPNFamily(nn.Module):
    """n_stages conv stages (stride 2 after the first, widening x2 at stages
    3-4) with transposed-conv up-paths concatenated at full resolution."""

    num_channels: int
    n_stages: int = 5
    use_cbam: bool = False
    dilated: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.num_channels
        widths = [c, c, 2 * c, 4 * c, 4 * c][:self.n_stages]
        up_widths = [2 * c, 2 * c, 2 * c, 4 * c, 4 * c][:self.n_stages]
        norm = lambda n: nn.BatchNorm(use_running_average=not train,
                                      momentum=BN_MOMENTUM, epsilon=BN_EPS,
                                      name=n)
        Block = CBAMBlock if self.use_cbam else PlainResidualBlock
        outs = []
        scale = 1
        for s in range(self.n_stages):
            stride = 1 if s == 0 else 2
            d = 2 if (self.dilated and s > 0) else 1
            x = nn.Conv(widths[s], (3, 3),
                        strides=(1, 1) if self.dilated and s > 0 else
                        (stride, stride),
                        padding=[(d, d), (d, d)], kernel_dilation=(d, d),
                        name=f"block{s}_conv")(x)
            x = norm(f"block{s}_bn")(x)
            n_res = 1 if s == 0 else 2
            for r in range(n_res):
                x = Block(widths[s], name=f"block{s}_res{r}")(x, train)
            if not (self.dilated and s > 0):
                scale = scale if s == 0 else scale * 2
            up = nn.ConvTranspose(up_widths[s], (3, 3),
                                  strides=(scale, scale), padding="SAME",
                                  name=f"up{s}")(x)
            outs.append(up)
        return jnp.concatenate(outs, axis=-1)


def _family_factory(n_stages, use_cbam=False, dilated=False):
    def build(cfg=None, num_channels=64, **kw):
        return ResnetFPNFamily(num_channels=num_channels, n_stages=n_stages,
                               use_cbam=use_cbam, dilated=dilated)
    return build


BACKBONE.register_module(_family_factory(5), name="ResnetFPN")
BACKBONE.register_module(_family_factory(2), name="ResnetFPN2")
BACKBONE.register_module(_family_factory(3), name="ResnetFPN3")
BACKBONE.register_module(_family_factory(4), name="ResnetFPN4")
BACKBONE.register_module(_family_factory(3, use_cbam=True),
                         name="ResnetFPN3_CBAM")
BACKBONE.register_module(_family_factory(4, use_cbam=True),
                         name="ResnetFPN4_CBAM")
BACKBONE.register_module(_family_factory(2, dilated=True),
                         name="ResnetFPN2_Dilated")
BACKBONE.register_module(_family_factory(3, dilated=True),
                         name="ResnetFPN3_Dilated")
BACKBONE.register_module(_family_factory(4, dilated=True),
                         name="ResnetFPN4_Dilated")
