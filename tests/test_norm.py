"""FastBatchNorm is a drop-in for nn.BatchNorm: identical variable trees,
bit-identical train-mode (masked) statistics, and an eval affine equal to
flax's eval normalization up to dtype rounding."""

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from selfpose3d_tpu.models.norm import FastBatchNorm


def _mods(dtype):
    kw = dict(use_running_average=None, momentum=0.9, dtype=dtype)
    return FastBatchNorm(**kw), nn.BatchNorm(**kw)


class TestFastBatchNorm:
    def test_variable_tree_matches_flax(self):
        x = jnp.ones((2, 4, 4, 3), jnp.float32)
        fast, ref = _mods(jnp.float32)
        vf = fast.init(jax.random.PRNGKey(0), x, use_running_average=False)
        vr = ref.init(jax.random.PRNGKey(0), x, use_running_average=False)
        sf = jax.tree.map(lambda a: (a.shape, a.dtype), vf)
        sr = jax.tree.map(lambda a: (a.shape, a.dtype), vr)
        assert sf == sr
        for a, b in zip(jax.tree.leaves(vf), jax.tree.leaves(vr)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_eval_matches_flax(self):
        rs = np.random.RandomState(0)
        x = jnp.asarray(rs.randn(2, 5, 5, 8).astype(np.float32))
        fast, ref = _mods(jnp.float32)
        v = ref.init(jax.random.PRNGKey(0), x, use_running_average=False)
        # non-trivial stats/params
        v = {
            "params": {
                "scale": jnp.asarray(rs.rand(8).astype(np.float32) + 0.5),
                "bias": jnp.asarray(rs.randn(8).astype(np.float32)),
            },
            "batch_stats": {
                "mean": jnp.asarray(rs.randn(8).astype(np.float32)),
                "var": jnp.asarray(rs.rand(8).astype(np.float32) + 0.2),
            },
        }
        yf = fast.apply(v, x, use_running_average=True)
        yr = ref.apply(v, x, use_running_average=True)
        np.testing.assert_allclose(
            np.asarray(yf), np.asarray(yr), rtol=2e-6, atol=2e-6
        )

        # bf16: one affine round instead of a full-tensor f32 round-trip
        fast16, ref16 = _mods(jnp.bfloat16)
        y16f = fast16.apply(v, x.astype(jnp.bfloat16), use_running_average=True)
        y16r = ref16.apply(v, x.astype(jnp.bfloat16), use_running_average=True)
        assert y16f.dtype == jnp.bfloat16 == y16r.dtype
        np.testing.assert_allclose(
            np.asarray(y16f, np.float32), np.asarray(y16r, np.float32),
            rtol=3e-2, atol=3e-2,
        )

    def test_train_bitwise_matches_flax(self):
        rs = np.random.RandomState(1)
        x = jnp.asarray(rs.randn(4, 6, 6, 5).astype(np.float32))
        mask = jnp.asarray(
            (rs.rand(4, 1, 1, 1) > 0.4).astype(np.float32)
        ).astype(bool)
        fast, ref = _mods(jnp.float32)
        v = ref.init(jax.random.PRNGKey(0), x, use_running_average=False)
        for m in (None, jnp.broadcast_to(mask, x.shape)):
            yf, mf = fast.apply(
                v, x, use_running_average=False, mask=m,
                mutable=["batch_stats"],
            )
            yr, mr = ref.apply(
                v, x, use_running_average=False, mask=m,
                mutable=["batch_stats"],
            )
            np.testing.assert_array_equal(np.asarray(yf), np.asarray(yr))
            for a, b in zip(jax.tree.leaves(mf), jax.tree.leaves(mr)):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
