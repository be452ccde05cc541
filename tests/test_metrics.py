"""Tests for the evaluation metric protocol."""

import numpy as np
import pytest

from selfpose3d_tpu.eval.metrics import (
    build_eval_list,
    eval_list_to_ap,
    eval_list_to_mpjpe,
    eval_list_to_recall,
    panoptic_metrics,
    pcp_shelf,
)


def make_frame(rng, n_gt, n_pred, noise=10.0, J=15):
    gts = [rng.rand(J, 3) * 2000 for _ in range(n_gt)]
    vis = [np.ones((J, 3)) for _ in range(n_gt)]
    preds = np.zeros((n_pred, J, 5))
    for i in range(n_pred):
        src = gts[i % n_gt] if n_gt else rng.rand(J, 3) * 2000
        preds[i, :, :3] = src + rng.randn(J, 3) * noise
        preds[i, :, 3] = 0.0
        preds[i, :, 4] = 1.0 - 0.1 * i
    return preds, gts, vis


class TestPanopticAP:
    def test_perfect_predictions(self, rng):
        frames = [make_frame(rng, 3, 3, noise=0.0) for _ in range(4)]
        m = panoptic_metrics(
            [f[0] for f in frames], [f[1] for f in frames], [f[2] for f in frames]
        )
        assert m["aps"][0] == pytest.approx(1.0, abs=1e-3)
        assert m["mpjpe"] == pytest.approx(0.0, abs=1e-6)
        assert m["recall500"] == 1.0

    def test_all_wrong(self, rng):
        preds, gts, vis = make_frame(rng, 2, 2, noise=0.0)
        preds[:, :, :3] += 10000.0  # move predictions far away
        m = panoptic_metrics([preds], [gts], [vis])
        assert m["aps"][-1] == 0.0
        assert m["recall500"] == 0.0

    def test_duplicate_predictions_penalized(self, rng):
        preds, gts, vis = make_frame(rng, 1, 1, noise=0.0)
        dup = np.concatenate([preds, preds], axis=0)  # duplicate -> 1 TP 1 FP
        m_single = panoptic_metrics([preds], [gts], [vis])
        m_dup = panoptic_metrics([dup], [gts], [vis])
        assert m_dup["aps"][0] <= m_single["aps"][0]

    def test_invalid_flag_rows_dropped(self, rng):
        preds, gts, vis = make_frame(rng, 2, 2, noise=0.0)
        preds[1, :, 3] = -1.0  # invalidate second pred
        el, total = build_eval_list([preds], [gts], [vis])
        assert len(el) == 1 and total == 2

    def test_mpjpe_greedy_unique_gt(self, rng):
        el = [
            {"mpjpe": 10.0, "score": 0.9, "gt_id": 0},
            {"mpjpe": 5.0, "score": 0.8, "gt_id": 0},  # same gt, lower score
            {"mpjpe": 20.0, "score": 0.7, "gt_id": 1},
        ]
        assert eval_list_to_mpjpe(el) == pytest.approx(15.0)
        assert eval_list_to_recall(el, 2) == 1.0


class TestPCP:
    def test_perfect(self, rng):
        gt = rng.rand(14, 3) * 1000
        r = pcp_shelf([gt.copy()], [gt])
        assert r["avg"] == 1.0

    def test_missing_prediction(self, rng):
        gt = rng.rand(14, 3) * 1000
        r = pcp_shelf([None], [gt])
        assert r["avg"] == 0.0
