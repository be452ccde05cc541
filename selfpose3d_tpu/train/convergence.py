"""Convergence harness: prove the SSV training loop actually LEARNS.

The reference's only quality mechanism for training dynamics was per-epoch
AP validation gating model_best.pth.tar during real training
(ref: lib/core/function.py:352-490, tools/train_3d.py:210-230). This
harness is the rebuild's equivalent evidence: it drives the REAL training
code path (train_epoch_ssv -> jitted ssv train step -> validate_3d) on the
tiny synthetic-scene curriculum (configs/synthetic/tiny_ssv.yaml) from
random init, records every per-step loss term, and evaluates root/pose
metrics before and after.

Used by scripts/train_convergence.py (writes the loss-curve artifact) and
tests/test_convergence.py (asserts losses drop + root localization
improves; run with SP3D_SLOW=1 — a few hundred CPU train steps).
"""

from __future__ import annotations

import json
import logging
import time
from typing import Dict, List, Optional

import numpy as np

logger = logging.getLogger(__name__)


class RecordingWriter:
    """TensorBoard-writer-compatible recorder (train_epoch_ssv logs each
    loss term through writer.add_scalar at PRINT_FREQ)."""

    def __init__(self):
        self.series: Dict[str, List[float]] = {}

    def add_scalar(self, key: str, value: float, step: int):
        self.series.setdefault(key, []).append(float(value))

    def close(self):
        pass


def run_convergence(
    cfg_path: str = "configs/synthetic/tiny_ssv.yaml",
    epochs: int = 4,
    out_path: Optional[str] = None,
    num_frames: int = 64,
    platform: str = "cpu",
    eval_every: int = 0,
) -> dict:
    """Train `epochs` epochs of the tiny SSV config from scratch and
    return {"series": per-term loss lists, "eval_init": metrics,
    "eval_final": metrics, "steps": N, "seconds": wall}.

    platform: "cpu" (default — the harness is a dynamics check; the
    container's sitecustomize would otherwise send every op over the axon
    TPU tunnel) or "tpu"/"axon" for long magnitude runs where the chip's
    step rate is the point.

    eval_every: if > 0, run validate_3d every N epochs and record the
    metric trajectory in result["eval_curve"] (the plateau evidence).
    When out_path is set, the partial result is flushed to disk after
    every epoch so a dead tunnel cannot lose the run.
    """
    import jax

    if platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    # else: leave the container default (axon TPU) in place

    import dataclasses

    from selfpose3d_tpu.config import load_config
    from selfpose3d_tpu.data.registry import get_dataset
    from selfpose3d_tpu.models import get_model
    from selfpose3d_tpu.train.loop import train_epoch_ssv, validate_3d
    from selfpose3d_tpu.train.train_state import create_train_state

    cfg = load_config(cfg_path)
    cfg = dataclasses.replace(cfg, PRINT_FREQ=1)  # record every step

    model = get_model(cfg)
    from selfpose3d_tpu.cli.train_3d import init_variables

    variables = init_variables(cfg, model)

    train_ds = get_dataset(
        cfg, cfg.DATASET.TRAIN_DATASET, cfg.DATASET.TRAIN_SUBSET, True
    )
    if hasattr(train_ds, "num_frames"):
        train_ds.num_frames = num_frames
    test_ds = get_dataset(
        cfg, cfg.DATASET.TEST_DATASET, cfg.DATASET.TEST_SUBSET, False
    )
    steps_per_epoch = max(1, len(train_ds) // max(1, cfg.TRAIN.BATCH_SIZE))
    state = create_train_state(cfg, variables, steps_per_epoch)

    eval_init: dict = {}
    validate_3d(cfg, model, state, test_ds, metrics_out=eval_init)
    logger.info(
        "init eval: recall500_root=%.4f mpjpe_root=%.1f",
        eval_init.get("recall500_root", float("nan")),
        eval_init.get("mpjpe_root", float("nan")),
    )

    writer = RecordingWriter()
    eval_curve: List[dict] = []
    t0 = time.time()
    for epoch in range(epochs):
        state = train_epoch_ssv(
            cfg, model, state, train_ds, epoch, writer=writer
        )
        if eval_every and (epoch + 1) % eval_every == 0:
            m: dict = {}
            validate_3d(cfg, model, state, test_ds, metrics_out=m)
            m = _jsonable(m)
            m["epoch"] = epoch + 1
            eval_curve.append(m)
            logger.info(
                "epoch %d eval: recall500_root=%.4f mpjpe_root=%.1f",
                epoch + 1,
                m.get("recall500_root", float("nan")),
                m.get("mpjpe_root", float("nan")),
            )
        if out_path:
            partial = {
                "cfg": cfg_path,
                "epochs_done": epoch + 1,
                "epochs": epochs,
                "steps": len(writer.series.get("train/loss", [])),
                "seconds": time.time() - t0,
                "series": writer.series,
                "eval_init": _jsonable(eval_init),
                "eval_curve": eval_curve,
            }
            with open(out_path + ".partial", "w") as fh:
                json.dump(partial, fh)
    wall = time.time() - t0

    eval_final: dict = {}
    validate_3d(cfg, model, state, test_ds, metrics_out=eval_final)
    logger.info(
        "final eval: recall500_root=%.4f mpjpe_root=%.1f",
        eval_final.get("recall500_root", float("nan")),
        eval_final.get("mpjpe_root", float("nan")),
    )

    result = {
        "cfg": cfg_path,
        "epochs": epochs,
        "steps": len(writer.series.get("train/loss", [])),
        "seconds": wall,
        "series": writer.series,
        "eval_init": _jsonable(eval_init),
        "eval_curve": eval_curve,
        "eval_final": _jsonable(eval_final),
    }
    if out_path:
        with open(out_path, "w") as fh:
            json.dump(result, fh)
        logger.info("wrote %s", out_path)
    return result


def _jsonable(d: dict) -> dict:
    out = {}
    for k, v in d.items():
        if isinstance(v, (list, tuple)):
            out[k] = [float(x) for x in v]
        elif isinstance(v, (int, float, np.floating, np.integer)):
            out[k] = float(v)
    return out


def head_tail_means(series: List[float], k: int = 10):
    """(mean of first k, mean of last k) — the drop statistic."""
    arr = np.asarray(series, np.float64)
    k = min(k, len(arr) // 2) or 1
    return float(arr[:k].mean()), float(arr[-k:].mean())
