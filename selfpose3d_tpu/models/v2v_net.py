"""V2V-PoseNet-style 3D volumetric U-Net, flax/NDHWC.

Re-design of the reference V2VNet (ref: lib/models/v2v_net.py:10-144):
Basic3DBlock(k=7) -> Res3D(16->32) front, 2-level pool2 encoder (32->64->128),
mid res block, mirrored ConvTranspose3d(k=2,s=2) decoder with skip Res3D
blocks, 1x1x1 output conv. Channel-minor (NDHWC) layout keeps the channel
contraction on the MXU lanes; compute dtype is configurable (bf16 by default
on TPU) with fp32 BatchNorm statistics.

TPU-specific execution (identical math, same parameter trees):
  * the k=7^3 front convolution runs as 7 zero-shifted 2D convolutions
    over (Y, Z) with X folded into the batch — XLA's TPU emitter lowers the
    volumetric 7^3 kernel at <1%% MXU utilization (measured 7.4x slower than
    the decomposition); k=3^3 convolutions keep the native 3D lowering,
    which measured FASTER than their 2D decomposition at these shapes;
  * ConvTranspose(k=2, s=2) is a 1x1 matmul into 8x channels followed by
    depth-to-space (the taps don't overlap);
  * max-pool 2^3 is a reshape + max over the sub-voxel axes.
"""

from __future__ import annotations

from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

# torch BatchNorm momentum 0.1 == flax momentum 0.9 (ra = m*ra + (1-m)*batch)
BN_MOMENTUM = 0.9


def conv_init(key, shape, dtype=jnp.float32):
    """normal(0, 0.001) matching reference V2V init (ref: v2v_net.py:135-144)."""
    import jax

    return jax.random.normal(key, shape, dtype) * 0.001


class FastConv3D(nn.Module):
    """k^3 stride-1 SAME 3D conv as k shifted 2D convs (exact).

    Parameter layout matches nn.Conv ((kx, ky, kz, ci, co) 'kernel' +
    (co,) 'bias'), so converted checkpoints are indistinguishable.
    """

    features: int
    kernel: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = self.kernel
        ci = x.shape[-1]
        w = self.param(
            "kernel", conv_init, (k, k, k, ci, self.features), jnp.float32
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        w = w.astype(self.dtype)
        x = x.astype(self.dtype)
        B, X, Y, Z, _ = x.shape
        half = (k - 1) // 2
        xb = x.reshape(B * X, Y, Z, ci) if k == 1 else None
        out = None
        for i in range(k):
            dx = i - half
            if k == 1:
                sh = xb
            else:
                # zero-shift along X, fold X into batch for the 2D conv
                if dx < 0:
                    sh = jnp.pad(x[:, :dx], ((0, 0), (-dx, 0), (0, 0), (0, 0), (0, 0)))
                elif dx > 0:
                    sh = jnp.pad(x[:, dx:], ((0, 0), (0, dx), (0, 0), (0, 0), (0, 0)))
                else:
                    sh = x
                sh = sh.reshape(B * X, Y, Z, ci)
            y = jax.lax.conv_general_dilated(
                sh, w[i],
                window_strides=(1, 1), padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=self.dtype,
            )
            out = y if out is None else out + y
        out = out + b.astype(self.dtype)
        return out.reshape(B, X, Y, Z, self.features)


class FastConvTranspose3D(nn.Module):
    """ConvTranspose3d(k=2, s=2, VALID): non-overlapping taps == a 1x1
    matmul into 8x channels + depth-to-space. Parameter layout matches
    nn.ConvTranspose ((2, 2, 2, ci, co) 'kernel' + (co,) 'bias')."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        ci = x.shape[-1]
        co = self.features
        w = self.param("kernel", conv_init, (2, 2, 2, ci, co), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (co,), jnp.float32)
        B, X, Y, Z, _ = x.shape
        # (2,2,2,ci,co) -> (ci, 2*2*2*co): y[..., (i,j,k,co)] = x @ w
        # (flax ConvTranspose applies the spatially flipped kernel)
        wm = jnp.transpose(w[::-1, ::-1, ::-1], (3, 0, 1, 2, 4)).reshape(ci, 8 * co)
        y = jnp.einsum(
            "bxyzc,cf->bxyzf", x.astype(self.dtype), wm.astype(self.dtype)
        )
        y = y.reshape(B, X, Y, Z, 2, 2, 2, co)
        # depth-to-space: out[b, 2x+i, 2y+j, 2z+k] = y[b, x, y, z, i, j, k]
        y = jnp.transpose(y, (0, 1, 4, 2, 5, 3, 6, 7))
        y = y.reshape(B, 2 * X, 2 * Y, 2 * Z, co)
        return y + b.astype(self.dtype)


class Basic3DBlock(nn.Module):
    out_ch: int
    kernel: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, mask=None):
        x = FastConv3D(self.out_ch, self.kernel, dtype=self.dtype, name="conv")(x)
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
        x = FastConvTranspose3D(self.out_ch, dtype=self.dtype, name="deconv")(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=BN_MOMENTUM, dtype=self.dtype, name="bn"
        )(x, mask=mask)
        return nn.relu(x)


def _max_pool_3d(x, window: int):
    """Non-overlapping max-pool as reshape + max (exact for stride==window)."""
    B, X, Y, Z, C = x.shape
    w = window
    x = x.reshape(B, X // w, w, Y // w, w, Z // w, w, C)
    return x.max(axis=(2, 4, 6))


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
