"""V2V-PoseNet-style 3D volumetric U-Net, flax/NDHWC.

Re-design of the reference V2VNet (ref: lib/models/v2v_net.py:10-144):
Basic3DBlock(k=7) -> Res3D(16->32) front, 2-level pool2 encoder (32->64->128),
mid res block, mirrored ConvTranspose3d(k=2,s=2) decoder with skip Res3D
blocks, 1x1x1 output conv. Channel-minor (NDHWC) layout keeps the channel
contraction on the MXU lanes; compute dtype is configurable (bf16 by default
on TPU) with fp32 BatchNorm statistics.
"""

from __future__ import annotations

from typing import Any, Callable

import jax.numpy as jnp
from flax import linen as nn

# torch BatchNorm momentum 0.1 == flax momentum 0.9 (ra = m*ra + (1-m)*batch)
BN_MOMENTUM = 0.9


def conv_init(key, shape, dtype=jnp.float32):
    """normal(0, 0.001) matching reference V2V init (ref: v2v_net.py:135-144)."""
    import jax

    return jax.random.normal(key, shape, dtype) * 0.001


class Basic3DBlock(nn.Module):
    out_ch: int
    kernel: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, mask=None):
        x = nn.Conv(
            self.out_ch,
            (self.kernel,) * 3,
            padding=(self.kernel - 1) // 2,
            kernel_init=conv_init,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=BN_MOMENTUM, dtype=self.dtype, name="bn"
        )(x, mask=mask)
        return nn.relu(x)


class Res3DBlock(nn.Module):
    out_ch: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, mask=None):
        in_ch = x.shape[-1]
        res = nn.Conv(
            self.out_ch, (3, 3, 3), padding=1, kernel_init=conv_init,
            dtype=self.dtype, name="conv1",
        )(x)
        res = nn.BatchNorm(
            use_running_average=not train, momentum=BN_MOMENTUM, dtype=self.dtype, name="bn1"
        )(res, mask=mask)
        res = nn.relu(res)
        res = nn.Conv(
            self.out_ch, (3, 3, 3), padding=1, kernel_init=conv_init,
            dtype=self.dtype, name="conv2",
        )(res)
        res = nn.BatchNorm(
            use_running_average=not train, momentum=BN_MOMENTUM, dtype=self.dtype, name="bn2"
        )(res, mask=mask)

        if in_ch == self.out_ch:
            skip = x
        else:
            skip = nn.Conv(
                self.out_ch, (1, 1, 1), kernel_init=conv_init,
                dtype=self.dtype, name="skip_conv",
            )(x)
            skip = nn.BatchNorm(
                use_running_average=not train, momentum=BN_MOMENTUM,
                dtype=self.dtype, name="skip_bn",
            )(skip, mask=mask)
        return nn.relu(res + skip)


class Upsample3DBlock(nn.Module):
    out_ch: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, mask=None):
        # ConvTranspose3d(k=2, s=2, p=0): exact 2x upsampling, no tap overlap
        x = nn.ConvTranspose(
            self.out_ch,
            (2, 2, 2),
            strides=(2, 2, 2),
            padding="VALID",
            kernel_init=conv_init,
            dtype=self.dtype,
            name="deconv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=BN_MOMENTUM, dtype=self.dtype, name="bn"
        )(x, mask=mask)
        return nn.relu(x)


def _max_pool_3d(x, window: int):
    return nn.max_pool(x, (window,) * 3, strides=(window,) * 3)


class EncoderDecoder(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, mask=None):
        skip1 = Res3DBlock(32, dtype=self.dtype, name="skip_res1")(x, train, mask)
        x = _max_pool_3d(x, 2)
        x = Res3DBlock(64, dtype=self.dtype, name="encoder_res1")(x, train, mask)

        skip2 = Res3DBlock(64, dtype=self.dtype, name="skip_res2")(x, train, mask)
        x = _max_pool_3d(x, 2)
        x = Res3DBlock(128, dtype=self.dtype, name="encoder_res2")(x, train, mask)

        x = Res3DBlock(128, dtype=self.dtype, name="mid_res")(x, train, mask)

        x = Res3DBlock(128, dtype=self.dtype, name="decoder_res2")(x, train, mask)
        x = Upsample3DBlock(64, dtype=self.dtype, name="decoder_upsample2")(x, train, mask)
        x = x + skip2

        x = Res3DBlock(64, dtype=self.dtype, name="decoder_res1")(x, train, mask)
        x = Upsample3DBlock(32, dtype=self.dtype, name="decoder_upsample1")(x, train, mask)
        x = x + skip1
        return x


class V2VNet(nn.Module):
    """Input (B, X, Y, Z, C_in) -> (B, X, Y, Z, C_out).

    ``mask`` (broadcastable to x, e.g. (B, 1, 1, 1, 1) bools) restricts
    BatchNorm *statistics* to the selected examples without changing shapes —
    the TPU-native equivalent of the reference's valid-candidates-only python
    loop through V2V (ref: lib/models/pose_regression_net.py:49-51), where BN
    batch moments never see the padding candidates.
    """

    out_ch: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, mask=None):
        x = x.astype(self.dtype)
        x = Basic3DBlock(16, 7, dtype=self.dtype, name="front_basic")(x, train, mask)
        x = Res3DBlock(32, dtype=self.dtype, name="front_res")(x, train, mask)
        x = EncoderDecoder(dtype=self.dtype, name="encoder_decoder")(x, train, mask)
        x = nn.Conv(
            self.out_ch, (1, 1, 1), kernel_init=conv_init,
            dtype=jnp.float32, name="output_layer",
        )(x.astype(jnp.float32))
        return x
