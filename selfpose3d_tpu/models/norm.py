"""Drop-in BatchNorm with a TPU-fast eval path.

flax ``nn.BatchNorm``'s ``use_running_average`` path normalizes with the
float32 running statistics, which promotes the whole activation tensor to
f32 — on v5e the 64^3 C=32 bf16 activations carry a 4x-padded (lane)
layout, so that promotion costs ~104 ms per Res3DBlock at BK=80 against
~36 ms for the two convolutions themselves (measured,
scripts/microbench_blockanat.py: block_prod 140.2 ms vs block_affine
36.2 ms). ``FastBatchNorm`` instead folds the running stats into ONE
per-channel scale/shift computed in f32 on (C,)-vectors and applies it in
the compute dtype, which XLA fuses into the producing conv's epilogue.

Variable layout, initialization, and train-mode (masked) statistics are
IDENTICAL to ``nn.BatchNorm`` — the train path delegates to the same flax
internals — so converted torch checkpoints and existing param trees are
indistinguishable. (ref: the torch reference relies on stock
``nn.BatchNorm2d/3d`` eval semantics, e.g. lib/models/v2v_net.py:16-43.)
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

# pinned flax internals (container-vendored flax): _compute_stats implements
# the (masked) moment computation, _normalize the train-path normalization +
# scale/bias param declaration. Reusing them keeps train-mode math and the
# 'scale'/'bias' param creation bit-identical to nn.BatchNorm.
from flax.linen import normalization as _fnz

# import-time guard (advisor r4): both calls below pass keyword arguments,
# so a flax upgrade that RENAMES/REMOVES a parameter fails loudly here
# instead of silently changing train-path BN math.
import inspect as _inspect

_need = {
    "_normalize": {"mdl", "x", "mean", "var", "reduction_axes", "feature_axes",
                   "dtype", "param_dtype", "epsilon", "use_bias", "use_scale",
                   "bias_init", "scale_init"},
    "_compute_stats": {"x", "axes", "dtype", "axis_name", "axis_index_groups",
                       "use_fast_variance", "mask", "force_float32_reductions"},
}
for _fn, _params in _need.items():
    _have = set(_inspect.signature(getattr(_fnz, _fn)).parameters)
    _missing = _params - _have
    if _missing:  # pragma: no cover - trips only on an incompatible flax
        raise ImportError(
            f"flax.linen.normalization.{_fn} lost parameters {_missing} — "
            "FastBatchNorm (selfpose3d_tpu/models/norm.py) pins this private "
            "API; re-verify train-path BN math against nn.BatchNorm"
        )


def conv_fence(x):
    """Barrier against XLA:TPU's conv-into-conv producer fusion.

    When convolution weights are runtime parameters (the normal train/eval
    case), XLA:TPU may fuse a producer convolution INTO a consumer
    convolution's input window loop, recomputing the producer once per
    overlapping window: a chained k3^3 res pair at (80, 64^3, 32) bf16
    measured 133 ms (17 TF/s, HLO `estimated_cycles` 263M) against 33 ms
    (70 TF/s) with this barrier — the same program with CONSTANT weights
    compiles to the fast form on its own (scripts/microbench_blockanat3.py).
    Place on the INPUT of every windowed (kernel > 1) convolution; per-conv
    epilogue fusion (bias/BN-affine/relu) is unaffected.
    """
    return jax.lax.optimization_barrier(x)


class FastBatchNorm(nn.Module):
    """``nn.BatchNorm`` semantics; eval path as a fused per-channel affine.

    y_eval = x * s + b with s = scale * rsqrt(var + eps) and
    b = bias - mean * s, both computed in f32 on (C,) vectors and cast to
    the compute dtype once. Mathematically the same affine flax applies;
    the only difference is rounding (one bf16 round of s/b instead of a
    full-tensor f32 round-trip).
    """

    use_running_average: Optional[bool] = None
    axis: int = -1
    momentum: float = 0.99
    epsilon: float = 1e-5
    dtype: Any = None
    use_fast_variance: bool = True

    @nn.compact
    def __call__(self, x, use_running_average: Optional[bool] = None, *,
                 mask=None):
        use_ra = nn.merge_param(
            "use_running_average", self.use_running_average, use_running_average
        )
        feature_axes = _fnz._canonicalize_axes(x.ndim, self.axis)
        reduction_axes = tuple(
            i for i in range(x.ndim) if i not in feature_axes
        )
        feature_shape = [x.shape[ax] for ax in feature_axes]

        ra_mean = self.variable(
            "batch_stats", "mean",
            lambda s: jnp.zeros(s, jnp.float32), feature_shape,
        )
        ra_var = self.variable(
            "batch_stats", "var",
            lambda s: jnp.ones(s, jnp.float32), feature_shape,
        )

        if use_ra:
            # same names/shapes/inits/order as flax _normalize
            scale = self.param(
                "scale", nn.initializers.ones, feature_shape, jnp.float32
            )
            bias = self.param(
                "bias", nn.initializers.zeros, feature_shape, jnp.float32
            )
            s = scale * jax.lax.rsqrt(ra_var.value + self.epsilon)
            b = bias - ra_mean.value * s
            dt = (
                self.dtype
                if self.dtype is not None
                else jnp.promote_types(x.dtype, jnp.float32)
            )
            bshape = [1] * x.ndim
            for ax in feature_axes:
                bshape[ax] = x.shape[ax]
            s = s.reshape(bshape).astype(dt)
            b = b.reshape(bshape).astype(dt)
            return x.astype(dt) * s + b

        mean, var = _fnz._compute_stats(
            x,
            reduction_axes,
            dtype=self.dtype,
            axis_name=None,
            axis_index_groups=None,
            use_fast_variance=self.use_fast_variance,
            mask=mask,
            force_float32_reductions=True,
        )
        if not self.is_initializing():
            ra_mean.value = (
                self.momentum * ra_mean.value + (1 - self.momentum) * mean
            )
            ra_var.value = (
                self.momentum * ra_var.value + (1 - self.momentum) * var
            )
        return _fnz._normalize(
            mdl=self,
            x=x,
            mean=mean,
            var=var,
            reduction_axes=reduction_axes,
            feature_axes=feature_axes,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            epsilon=self.epsilon,
            use_bias=True,
            use_scale=True,
            bias_init=nn.initializers.zeros,
            scale_init=nn.initializers.ones,
            force_float32_reductions=True,
        )
