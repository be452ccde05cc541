"""Jitted train/eval steps.

Replaces the reference's python train loops (ref: lib/core/function.py:27-350)
with jit-compiled step functions. The total loss is the sum of the mean of
every loss term that carries gradient (ref: function.py:95), which under a
batch-sharded jit compiles to per-device compute + an XLA-inserted psum —
the SPMD equivalent of DataParallel's gather/mean.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from selfpose3d_tpu.data.structures import AugBranch
from selfpose3d_tpu.train.train_state import TrainState

_STEP_CACHE: dict = {}


def make_ssv_train_step(
    model, train_posenet_stage: bool, use_l1_stage: bool, k_cap=None
):
    """Build the jitted SSV train step for the current epoch stage gates.

    Cached per (model, gates, k_cap): rebuilding a jit wrapper every epoch
    would recompile an identical graph at each stage boundary crossing and
    back. ``k_cap`` is the static PoseNet candidate cap of the host-level
    bucket dispatch (TRAIN.BUCKET_DISPATCH='meta'); each cap is its own
    compiled single-branch graph.
    """
    key = (id(model), "ssv", train_posenet_stage, use_l1_stage, k_cap)
    if key in _STEP_CACHE:
        return _STEP_CACHE[key]
    step = _make_ssv_train_step(model, train_posenet_stage, use_l1_stage, k_cap)
    _STEP_CACHE[key] = step
    return step


def _make_ssv_train_step(
    model, train_posenet_stage: bool, use_l1_stage: bool, k_cap=None
):

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(
        state: TrainState,
        b1: AugBranch,
        b2: AugBranch,
        b3: AugBranch,
        rng: jax.Array,
    ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        step_rng = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            (pred2, hm3, gc, losses), mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                b1, b2, b3,
                train_posenet_stage=train_posenet_stage,
                use_l1_stage=use_l1_stage,
                train=True,
                k_cap=k_cap,
                method="ssv_losses",
                rngs={"synth": step_rng},
                mutable=["batch_stats"],
            )
            total = sum(jnp.mean(v) for v in losses.values())
            return total, (losses, mut)

        (total, (losses, mut)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        new_state = state.apply_gradients(grads).replace(
            batch_stats=mut["batch_stats"]
        )
        metrics = {k: jnp.mean(v) for k, v in losses.items()}
        metrics["loss"] = total
        return new_state, metrics

    return train_step


def make_supervised_train_step(model):
    """Train step for the VoxelPose baseline (ref: function.py:219-350)."""
    key = (id(model), "supervised")
    if key in _STEP_CACHE:
        return _STEP_CACHE[key]
    step = _make_supervised_train_step(model)
    _STEP_CACHE[key] = step
    return step


def _make_supervised_train_step(model):

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, branch: AugBranch):
        def loss_fn(params):
            (pred, hm, gc, losses), mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                branch, train=True, mutable=["batch_stats"],
            )
            total = sum(jnp.mean(v) for v in losses.values())
            return total, (losses, mut)

        (total, (losses, mut)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        new_state = state.apply_gradients(grads).replace(
            batch_stats=mut["batch_stats"]
        )
        metrics = {k: jnp.mean(v) for k, v in losses.items()}
        metrics["loss"] = total
        return new_state, metrics

    return train_step


def make_inference_step(model):
    """Jitted inference (ref: multi_person_posenet_ssv.py:105-153)."""
    key = (id(model), "infer")
    if key in _STEP_CACHE:
        return _STEP_CACHE[key]
    step = _make_inference_step(model)
    _STEP_CACHE[key] = step
    return step


def _make_inference_step(model):

    @jax.jit
    def infer(params, batch_stats, branch: AugBranch):
        return model.apply(
            {"params": params, "batch_stats": batch_stats},
            branch,
            method="do_inference",
        )

    return infer


def make_ssv_debug_forward(model, train_posenet_stage: bool, use_l1_stage: bool):
    """Jitted prediction-bearing forward for PRINT_FREQ debug dumps
    (the reference's train loop renders predicted heatmaps, 3D poses, and
    root cubes every PRINT_FREQ, ref: lib/core/function.py:176-217; the
    train step itself only returns metrics, so debug steps re-run a
    forward)."""
    key = (id(model), "ssv_debug", train_posenet_stage, use_l1_stage)
    if key in _STEP_CACHE:
        return _STEP_CACHE[key]

    @jax.jit
    def fwd(params, batch_stats, b1, b2, b3, rng):
        pred2, hm3, gc, _ = model.apply(
            {"params": params, "batch_stats": batch_stats},
            b1, b2, b3,
            train_posenet_stage=train_posenet_stage,
            use_l1_stage=use_l1_stage,
            train=False,
            method="ssv_losses",
            rngs={"synth": rng},
        )
        return pred2, hm3, gc

    _STEP_CACHE[key] = fwd
    return fwd
