"""PoseResNet backbone: ResNet-{18,34,50,101,152} + deconv head, flax/NHWC.

Re-design of the reference backbone (ref: lib/models/pose_resnet.py:26-284):
stem conv7x7/s2 + maxpool, 4 bottleneck stages, 3 ConvTranspose2d(k=4,s=2,p=1)
deconv layers (256ch), 1x1 final conv -> per-view 2D joint heatmaps
(960x512 input -> 240x128 heatmaps at stride 4).

TPU-first details: NHWC layout, configurable compute dtype (bf16 default on
TPU) with fp32 BN stats, and the whole (batch x views x augs) folded into one
batch axis by the caller — one big conv pass instead of the reference's
per-view python loop (ref: multi_person_posenet_ssv.py:227-275).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from selfpose3d_tpu.models.norm import FastBatchNorm, conv_fence

BN_MOMENTUM = 0.9  # torch 0.1 (ref: pose_resnet.py:17)


def head_init(key, shape, dtype=jnp.float32):
    """normal(0, 0.001) for deconv/final layers (ref: pose_resnet.py:228-248)."""
    return jax.random.normal(key, shape, dtype) * 0.001


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32
    expansion: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        out = nn.Conv(
            self.planes, (3, 3), strides=self.stride, padding=1, use_bias=False,
            dtype=self.dtype, name="conv1",
        )(conv_fence(x))
        out = FastBatchNorm(
            use_running_average=not train, momentum=BN_MOMENTUM, dtype=self.dtype, name="bn1"
        )(out)
        out = nn.relu(out)
        out = nn.Conv(
            self.planes, (3, 3), padding=1, use_bias=False, dtype=self.dtype, name="conv2"
        )(conv_fence(out))
        out = FastBatchNorm(
            use_running_average=not train, momentum=BN_MOMENTUM, dtype=self.dtype, name="bn2"
        )(out)
        if self.downsample:
            residual = nn.Conv(
                self.planes, (1, 1), strides=self.stride, use_bias=False,
                dtype=self.dtype, name="downsample_conv",
            )(x)
            residual = FastBatchNorm(
                use_running_average=not train, momentum=BN_MOMENTUM,
                dtype=self.dtype, name="downsample_bn",
            )(residual)
        return nn.relu(out + residual)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        out = nn.Conv(
            self.planes, (1, 1), use_bias=False, dtype=self.dtype, name="conv1"
        )(x)
        out = FastBatchNorm(
            use_running_average=not train, momentum=BN_MOMENTUM, dtype=self.dtype, name="bn1"
        )(out)
        out = nn.relu(out)
        out = nn.Conv(
            self.planes, (3, 3), strides=self.stride, padding=1, use_bias=False,
            dtype=self.dtype, name="conv2",
        )(conv_fence(out))
        out = FastBatchNorm(
            use_running_average=not train, momentum=BN_MOMENTUM, dtype=self.dtype, name="bn2"
        )(out)
        out = nn.relu(out)
        out = nn.Conv(
            self.planes * 4, (1, 1), use_bias=False, dtype=self.dtype, name="conv3"
        )(out)
        out = FastBatchNorm(
            use_running_average=not train, momentum=BN_MOMENTUM, dtype=self.dtype, name="bn3"
        )(out)
        if self.downsample:
            residual = nn.Conv(
                self.planes * 4, (1, 1), strides=self.stride, use_bias=False,
                dtype=self.dtype, name="downsample_conv",
            )(x)
            residual = FastBatchNorm(
                use_running_average=not train, momentum=BN_MOMENTUM,
                dtype=self.dtype, name="downsample_bn",
            )(residual)
        return nn.relu(out + residual)


RESNET_SPEC = {
    18: (BasicBlock, (2, 2, 2, 2)),
    34: (BasicBlock, (3, 4, 6, 3)),
    50: (Bottleneck, (3, 4, 6, 3)),
    101: (Bottleneck, (3, 4, 23, 3)),
    152: (Bottleneck, (3, 8, 36, 3)),
}


class PoseResNet(nn.Module):
    """(B, H, W, 3) -> (B, H/4, W/4, num_joints) heatmaps (NHWC)."""

    num_layers: int = 50
    num_joints: int = 15
    deconv_filters: Sequence[int] = (256, 256, 256)
    deconv_kernels: Sequence[int] = (4, 4, 4)
    final_conv_kernel: int = 1
    deconv_with_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, return_features: bool = False):
        block_cls, layers = RESNET_SPEC[self.num_layers]
        x = x.astype(self.dtype)

        x = nn.Conv(
            64, (7, 7), strides=2, padding=3, use_bias=False, dtype=self.dtype, name="conv1"
        )(x)
        x = FastBatchNorm(
            use_running_average=not train, momentum=BN_MOMENTUM, dtype=self.dtype, name="bn1"
        )(x)
        x = nn.relu(x)
        # torch MaxPool2d(k=3, s=2, p=1): pad with -inf then pool
        x = jnp.pad(
            x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf
        )
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")

        inplanes = 64
        # nested remat in training: per-stage remat stores only the 4 stage
        # boundaries; per-block remat inside bounds the recompute peak to
        # one block's internals. 3Bx5-view 960x512 ResNet-50 activations
        # don't fit HBM unrematerialized (bench_train OOM: 139G).
        blk = nn.remat(block_cls, static_argnums=(2,)) if train else block_cls
        for stage, (planes, blocks) in enumerate(
            zip((64, 128, 256, 512), layers)
        ):
            stride = 1 if stage == 0 else 2
            expansion = block_cls.expansion

            def stage_fn(mdl, xs, _stage=stage, _planes=planes,
                         _blocks=blocks, _stride=stride, _inplanes=inplanes):
                inp = _inplanes
                for b in range(_blocks):
                    downsample = b == 0 and (
                        _stride != 1 or inp != _planes * expansion
                    )
                    xs = blk(
                        _planes,
                        stride=_stride if b == 0 else 1,
                        downsample=downsample,
                        dtype=mdl.dtype,
                        name=f"layer{_stage + 1}_{b}",
                    )(xs, train)
                    inp = _planes * expansion
                return xs

            if train:
                x = nn.remat(stage_fn)(self, x)
            else:
                x = stage_fn(self, x)
            inplanes = planes * expansion

        for i, (filters, kernel) in enumerate(
            zip(self.deconv_filters, self.deconv_kernels)
        ):
            # torch ConvTranspose2d(k=4, s=2, p=1, op=0) == flax 'SAME' 2x up
            assert kernel == 4, "only k=4 deconvs supported (reference default)"
            x = nn.ConvTranspose(
                filters,
                (kernel, kernel),
                strides=(2, 2),
                padding="SAME",
                use_bias=self.deconv_with_bias,
                kernel_init=head_init,
                dtype=self.dtype,
                name=f"deconv{i}",
            )(conv_fence(x))
            x = FastBatchNorm(
                use_running_average=not train, momentum=BN_MOMENTUM,
                dtype=self.dtype, name=f"deconv_bn{i}",
            )(x)
            x = nn.relu(x)

        features = x
        pad = 1 if self.final_conv_kernel == 3 else 0
        out = nn.Conv(
            self.num_joints,
            (self.final_conv_kernel,) * 2,
            padding=pad,
            kernel_init=head_init,
            dtype=jnp.float32,
            name="final_layer",
        )(features.astype(jnp.float32))

        if return_features:
            return out, features
        return out


class PoseResAttnNet(nn.Module):
    """Sigmoid-headed PoseResNet producing supervision-attention maps in [0,1]
    (ref: lib/models/pose_resnet.py:287-299)."""

    num_layers: int = 18
    num_joints: int = 15
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = PoseResNet(
            num_layers=self.num_layers,
            num_joints=self.num_joints,
            dtype=self.dtype,
            name="backbone",
        )(x, train)
        return nn.sigmoid(out)
