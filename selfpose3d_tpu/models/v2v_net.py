"""V2V-PoseNet-style 3D volumetric U-Net, flax/NDHWC.

Re-design of the reference V2VNet (ref: lib/models/v2v_net.py:10-144):
Basic3DBlock(k=7) -> Res3D(16->32) front, 2-level pool2 encoder (32->64->128),
mid res block, mirrored ConvTranspose3d(k=2,s=2) decoder with skip Res3D
blocks, 1x1x1 output conv. Channel-minor (NDHWC) layout keeps the channel
contraction on the MXU lanes; compute dtype is configurable (bf16 by default
on TPU) with fp32 BatchNorm statistics.

TPU-specific execution (identical math, same parameter trees):
  * the k=7^3 front convolution runs as ONE widened-tap 2D convolution
    per X-chunk (x-taps folded into output channels, N=7*co=112) with a
    shifted-slice sum — XLA's TPU emitter lowers the volumetric 7^3
    kernel at <1%% MXU utilization and the per-tap 2D decomposition is
    N=16-bound; the widened form measured 62.8 -> 52.1 ms at 40x64^3.
    k=3^3 convolutions keep the native 3D lowering, which measured FASTER
    than both 2D decompositions at these shapes (see _conv3x3x3);
  * ConvTranspose(k=2, s=2) is a 1x1 matmul into 8x channels followed by
    depth-to-space (the taps don't overlap);
  * max-pool 2^3 is a reshape + max over the sub-voxel axes.
"""

from __future__ import annotations

from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from selfpose3d_tpu.models.norm import FastBatchNorm, conv_fence

# torch BatchNorm momentum 0.1 == flax momentum 0.9 (ra = m*ra + (1-m)*batch)
BN_MOMENTUM = 0.9


def conv_init(key, shape, dtype=jnp.float32):
    """normal(0, 0.001) matching reference V2V init (ref: v2v_net.py:135-144)."""
    import jax

    return jax.random.normal(key, shape, dtype) * 0.001


class FastConv3D(nn.Module):
    """k^3 stride-1 SAME 3D conv via widened-tap 2D decomposition (exact).

    Parameter layout matches nn.Conv ((kx, ky, kz, ci, co) 'kernel' +
    (co,) 'bias'), so converted checkpoints are indistinguishable.

    Execution (measured on v5e, see ARCHITECTURE.md): the TPU conv
    emitter's throughput is bounded by the matmul N dimension (= output
    channels) — a 16..32-channel 3D conv runs at ~18-27 TF/s however it is
    formulated. This module folds the k x-axis taps INTO the output
    channels of one 2D conv over (Y, Z) planes (N = k*co: 112 for the k=7
    front, 96 for k=3 res blocks) and reconstructs out[x] = sum_i
    y[x + i - half, tap i] with a shifted static-slice sum, X-chunked so
    the k-times-wider intermediate stays bounded. Identical FLOPs, near-
    full MXU tiles.
    """

    features: int
    kernel: int
    dtype: Any = jnp.float32
    x_chunk: int = 16

    @nn.compact
    def __call__(self, x):
        k = self.kernel
        ci = x.shape[-1]
        co = self.features
        w = self.param(
            "kernel", conv_init, (k, k, k, ci, co), jnp.float32
        )
        b = self.param("bias", nn.initializers.zeros, (co,), jnp.float32)
        w = w.astype(self.dtype)
        x = x.astype(self.dtype)
        if k > 1:
            x = conv_fence(x)
        B, X, Y, Z, _ = x.shape
        half = (k - 1) // 2

        if k == 1:
            y = jax.lax.conv_general_dilated(
                x.reshape(B * X, Y, Z, ci), w[0],
                window_strides=(1, 1), padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=self.dtype,
            )
            return (y + b.astype(self.dtype)).reshape(B, X, Y, Z, co)

        # widened 2D kernel: x-taps become extra output channels
        w2 = jnp.transpose(w, (1, 2, 3, 0, 4)).reshape(k, k, ci, k * co)
        chunk = min(self.x_chunk, X)
        while X % chunk:  # largest divisor of X not exceeding x_chunk
            chunk -= 1
        xp = jnp.pad(x, ((0, 0), (half, half), (0, 0), (0, 0), (0, 0)))
        rows = chunk + 2 * half
        outs = []
        for c0 in range(0, X, chunk):
            seg = jax.lax.dynamic_slice_in_dim(xp, c0, rows, axis=1)
            y = jax.lax.conv_general_dilated(
                seg.reshape(B * rows, Y, Z, ci), w2,
                window_strides=(1, 1), padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=self.dtype,
            ).reshape(B, rows, Y, Z, k, co)
            # out[x=c0+j] = sum_i y[j + i, tap i]  (i - half is the x shift)
            outs.append(
                sum(y[:, i : i + chunk, :, :, i, :] for i in range(k))
            )
        out = jnp.concatenate(outs, axis=1) + b.astype(self.dtype)
        return out


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
        x = FastBatchNorm(
            use_running_average=not train, momentum=BN_MOMENTUM, dtype=self.dtype, name="bn"
        )(x, mask=mask)
        return nn.relu(x)


def _conv3x3x3(x, features, dtype, name):
    """k=3 convs keep XLA's native 3D lowering: the widened-tap
    decomposition was MEASURED SLOWER here (skip_res1 62->85 ms,
    front_res 37->144 ms at 40x64^3) — the k-times-wider intermediate's
    HBM traffic and the strided per-tap slice reads swamp the MXU gain
    that works for k=7 (where taps amortize 7x). See ARCHITECTURE.md."""
    return nn.Conv(
        features, (3, 3, 3), padding=1, kernel_init=conv_init,
        dtype=dtype, name=name,
    )(conv_fence(x))


class Res3DBlock(nn.Module):
    out_ch: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, mask=None):
        in_ch = x.shape[-1]
        res = _conv3x3x3(x, self.out_ch, self.dtype, "conv1")
        res = FastBatchNorm(
            use_running_average=not train, momentum=BN_MOMENTUM, dtype=self.dtype, name="bn1"
        )(res, mask=mask)
        res = nn.relu(res)
        res = _conv3x3x3(res, self.out_ch, self.dtype, "conv2")
        res = FastBatchNorm(
            use_running_average=not train, momentum=BN_MOMENTUM, dtype=self.dtype, name="bn2"
        )(res, mask=mask)

        if in_ch == self.out_ch:
            skip = x
        else:
            skip = nn.Conv(
                self.out_ch, (1, 1, 1), kernel_init=conv_init,
                dtype=self.dtype, name="skip_conv",
            )(x)
            skip = FastBatchNorm(
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
        x = FastBatchNorm(
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
        # hierarchical remat in training: per-block remat alone still keeps
        # every block BOUNDARY live from forward to backward (measured 30G
        # at flagship PoseNet shapes; unrematerialized: 139G — see
        # scripts/bench_train.py). Grouping encoder and decoder into outer
        # remat regions stores only (x, skip1, skip2, bottleneck) between
        # phases; the inner per-block remats bound each group's recompute.
        # Remat never changes numerics — BN semantics are untouched.
        res = (nn.remat(Res3DBlock, static_argnums=(2,)) if train else Res3DBlock)
        up = (nn.remat(Upsample3DBlock, static_argnums=(2,)) if train else Upsample3DBlock)

        def enc(mdl, x_, m):
            skip1 = res(32, dtype=mdl.dtype, name="skip_res1")(x_, train, m)
            h = _max_pool_3d(x_, 2)
            h = res(64, dtype=mdl.dtype, name="encoder_res1")(h, train, m)
            skip2 = res(64, dtype=mdl.dtype, name="skip_res2")(h, train, m)
            h = _max_pool_3d(h, 2)
            h = res(128, dtype=mdl.dtype, name="encoder_res2")(h, train, m)
            h = res(128, dtype=mdl.dtype, name="mid_res")(h, train, m)
            return h, skip1, skip2

        def dec(mdl, h, skip1, skip2, m):
            h = res(128, dtype=mdl.dtype, name="decoder_res2")(h, train, m)
            h = up(64, dtype=mdl.dtype, name="decoder_upsample2")(h, train, m)
            h = h + skip2
            h = res(64, dtype=mdl.dtype, name="decoder_res1")(h, train, m)
            h = up(32, dtype=mdl.dtype, name="decoder_upsample1")(h, train, m)
            return h + skip1

        if train:
            h, s1, s2 = nn.remat(enc)(self, x, mask)
            return nn.remat(dec)(self, h, s1, s2, mask)
        h, s1, s2 = enc(self, x, mask)
        return dec(self, h, s1, s2, mask)


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
        basic = (nn.remat(Basic3DBlock, static_argnums=(2,)) if train else Basic3DBlock)
        res = (nn.remat(Res3DBlock, static_argnums=(2,)) if train else Res3DBlock)

        def front(mdl, x_, m):
            h = basic(16, 7, dtype=mdl.dtype, name="front_basic")(x_, train, m)
            return res(32, dtype=mdl.dtype, name="front_res")(h, train, m)

        if train:
            x = nn.remat(front)(self, x, mask)
        else:
            x = front(self, x, mask)
        x = EncoderDecoder(dtype=self.dtype, name="encoder_decoder")(x, train, mask)
        x = nn.Conv(
            self.out_ch, (1, 1, 1), kernel_init=conv_init,
            dtype=jnp.float32, name="output_layer",
        )(x.astype(jnp.float32))
        return x
