"""Training-dynamics proof: the SSV loop LEARNS, not just runs.

Gated behind SP3D_SLOW=1 (160 CPU train steps, ~80 min on a 1-core host): drives the REAL code path (train_epoch_ssv -> jitted step ->
validate_3d) on configs/synthetic/tiny_ssv.yaml from random init and
asserts (a) the total loss and >=3 individual SSV terms decrease
materially, (b) root localization improves over the random-init eval —
the rebuild's equivalent of the reference's per-epoch AP gate
(ref: lib/core/function.py:352-490, tools/train_3d.py:210-230).

A full 5-epoch run's raw curves are committed as
docs/convergence_curves.json and summarized in ARCHITECTURE.md ("Training
dynamics"); scripts/train_convergence.py regenerates them.
"""

import os

import numpy as np
import pytest

slow = pytest.mark.skipif(
    os.environ.get("SP3D_SLOW", "") != "1",
    reason="convergence run takes ~1h of CPU; set SP3D_SLOW=1",
)


@slow
class TestConvergence:
    def test_losses_drop_and_roots_localize(self, tmp_path):
        from selfpose3d_tpu.train.convergence import (
            head_tail_means,
            run_convergence,
        )

        res = run_convergence(
            epochs=5, out_path=str(tmp_path / "curves.json")
        )
        assert res["steps"] >= 150

        # thresholds carry margin over a MEASURED 5-epoch run
        # (docs/convergence_curves.json: total 0.643 -> 0.440 = 0.684x,
        # terms 0.52/0.60/0.61/0.79x, root recall 0.024 -> 0.087)
        total_h, total_t = head_tail_means(res["series"]["train/loss"])
        assert total_t < 0.8 * total_h, (total_h, total_t)

        dropped = []
        for term in ("loss_2d", "loss_root_syn", "loss_pose3d_ssv",
                     "loss_pose3d_l1_ssv", "loss_root_reg"):
            h, t = head_tail_means(res["series"][f"train/{term}"])
            if t < 0.85 * h:
                dropped.append(term)
        assert len(dropped) >= 3, dropped

        # root localization beats random init: recall@500 up or MPJPE down
        r0 = res["eval_init"].get("recall500_root", 0.0)
        r1 = res["eval_final"].get("recall500_root", 0.0)
        m0 = res["eval_init"].get("mpjpe_root", float("inf"))
        m1 = res["eval_final"].get("mpjpe_root", float("inf"))
        assert (r1 > r0 + 0.04) or (m1 < 0.8 * m0), (
            f"roots did not improve: recall {r0}->{r1}, mpjpe {m0}->{m1}"
        )
