"""PoseNet: per-candidate fine 3D pose regression.

Re-design of PoseRegressionNet (ref: lib/models/pose_regression_net.py:31-53):
a 2m^3 cube of 64^3 voxels is centered at every root candidate, per-view
heatmaps are unprojected into it, a V2VNet (J->J) scores each joint per voxel,
and a soft-argmax regresses metric joint positions.

TPU-first: the reference loops python-side over the MAX_PEOPLE_NUM candidates,
calling the whole stack per candidate (ref: multi_person_posenet_ssv.py:354-383).
Here all K candidates are a masked array axis: sampling coordinates are built
for (B, K, N) points against the *same* per-view heatmaps (no data
duplication), and one V2V pass runs on the folded (B*K) batch — big, regular
MXU work instead of K small launches.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from selfpose3d_tpu.geometry.cameras import CameraParams
from selfpose3d_tpu.geometry.grid import compute_grid
from selfpose3d_tpu.models.v2v_net import V2VNet
from selfpose3d_tpu.ops.softargmax import soft_argmax_ndhwc
from selfpose3d_tpu.ops.unproject import (
    compute_sample_grid,
    sample_and_aggregate_cmajor,
    sample_and_aggregate_slicewarp,
    slicewarp_supported,
)


class PoseNet(nn.Module):
    grid_size: Tuple[float, float, float] = (2000.0, 2000.0, 2000.0)
    cube_size: Tuple[int, int, int] = (64, 64, 64)
    image_wh: Tuple[int, int] = (960, 512)
    num_joints: int = 15
    beta: float = 100.0
    sampling: str = "gather"
    # candidate-count buckets: when set (ascending, last == MAX_PEOPLE_NUM),
    # the candidate axis is truncated to the smallest bucket covering every
    # valid candidate and dispatched via a lifted switch — the TPU-native
    # equivalent of the reference's valid-candidates-only python loop
    # (ref: multi_person_posenet_ssv.py:365-383): sampling + V2V + soft-argmax
    # all scale with the actual people count instead of always paying K=10.
    buckets: Tuple[int, ...] = ()
    dtype: Any = jnp.float32

    def setup(self):
        self.v2v_net = V2VNet(out_ch=self.num_joints, dtype=self.dtype)

    def __call__(
        self,
        heatmaps: jnp.ndarray,
        cam: CameraParams,
        trans: jnp.ndarray,
        orig_wh: jnp.ndarray,
        grid_centers: jnp.ndarray,
        hflip: Optional[jnp.ndarray] = None,
        train: bool = False,
        bucketed: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """All-candidate pose regression.

        Args:
          heatmaps:     (B, V, H, W, J)
          cam:          CameraParams batched (B, V)
          trans:        (B, V, 2or3, 3)
          orig_wh:      (B, V, 2)
          grid_centers: (B, K, 5) proposals [x, y, z, flag, score]
          hflip:        optional (B,)
          bucketed:     False skips the in-graph nn.switch bucket dispatch
                        and runs the given K directly — used by the
                        train-step-level host dispatch (TRAIN.BUCKET_DISPATCH),
                        whose per-bucket compiled graphs must stay
                        single-branch (the multi-branch TRAIN graph blows up
                        remote compilation; ARCHITECTURE.md).
        Returns:
          pred:  (B, K, J, 3) world-mm joints (zeros for invalid candidates)
          valid: (B, K) float candidate mask (flag >= 0)
        """
        K = grid_centers.shape[1]
        buckets = tuple(b for b in self.buckets if b < K) + (K,)
        if len(buckets) == 1 or not bucketed:
            return self._run(
                heatmaps, cam, trans, orig_wh, grid_centers, hflip, train
            )

        # smallest prefix covering every valid candidate, across the batch
        # (proposals are score-sorted, so valid ones are normally a prefix;
        # the supervised GT-matched path can leave holes — max-index covers
        # both)
        flags = grid_centers[..., 3] >= 0  # (B, K)
        idx1 = jnp.arange(1, K + 1)[None, :]
        needed = jnp.max(jnp.where(flags, idx1, 0))
        branch = jnp.sum(
            (needed > jnp.asarray(buckets[:-1]))
            .astype(jnp.int32)
        )

        def make_branch(k):
            def run_k(mdl, hm, cam_, trans_, wh, gc, hf):
                pred_k, valid_k = mdl._run(
                    hm, cam_, trans_, wh, gc[:, :k], hf, train
                )
                pad = K - k
                return (
                    jnp.pad(pred_k, ((0, 0), (0, pad), (0, 0), (0, 0))),
                    jnp.pad(valid_k, ((0, 0), (0, pad))),
                )

            return run_k

        pred, valid_pref = nn.switch(
            branch,
            [make_branch(k) for k in buckets],
            self, heatmaps, cam, trans, orig_wh, grid_centers, hflip,
        )
        # report the true validity mask (padding slots are invalid anyway)
        valid = flags.astype(jnp.float32)
        return pred, valid

    def _apply_v2v(self, cubes, bn_mask, B, K, train):
        """V2V over the candidate fold (hierarchical remat inside V2VNet
        bounds training memory; see models/v2v_net.py)."""
        return self.v2v_net(cubes, train=train, mask=bn_mask)

    def _run(
        self,
        heatmaps: jnp.ndarray,
        cam: CameraParams,
        trans: jnp.ndarray,
        orig_wh: jnp.ndarray,
        grid_centers: jnp.ndarray,
        hflip: Optional[jnp.ndarray],
        train: bool,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        B, V, H, W, J = heatmaps.shape
        K = grid_centers.shape[1]
        X, Y, Z = (int(s) for s in self.cube_size)
        N = X * Y * Z

        centers = grid_centers[..., :3]  # (B, K, 3)
        valid = (grid_centers[..., 3] >= 0).astype(jnp.float32)  # (B, K)

        hflip_bv = (
            None if hflip is None else jnp.broadcast_to(
                jnp.asarray(hflip).reshape(-1, 1), (B, V)
            )
        )
        use_sw = self.sampling == "slicewarp" and slicewarp_supported(
            heatmaps, self.cube_size
        )
        if use_sw:
            # slice-major (z-grouped) grid: the sampler's slice regrouping
            # and the V2V NDHWC handoff then cost ONE transpose total
            # instead of five (B, V, K*N)-sized ones (measured r4,
            # scripts/microbench_sampwrap.py). The analytic grid costs
            # ~3 ms to build a second time.
            grids_sw = jax.vmap(jax.vmap(
                lambda c: compute_grid(
                    self.grid_size, c, self.cube_size, order="zxy"
                )
            ))(centers)
            flat_grids = grids_sw.reshape(B, 1, K * N, 3)
        else:
            # x-major per-candidate voxel grids (gather-path sampling)
            grids = jax.vmap(jax.vmap(
                lambda c: compute_grid(self.grid_size, c, self.cube_size)
            ))(centers)
            flat_grids = grids.reshape(B, 1, K * N, 3)
        # sampling coords for all candidates against each view's heatmap:
        # grid (B, 1(V), K*N, 3) vs cam (B, V) -> (B, V, K*N, 2)
        sample_grid, bounding = compute_sample_grid(
            flat_grids, cam, trans, self.image_wh, (W, H),
            hflip=hflip_bv,
            orig_wh=orig_wh,
        )
        if use_sw:
            # bf16 model dtype selects the channel-pair-packed kernel (two
            # bf16 channels per gather/transpose inside one bitpacked f32;
            # kernel 25.9 -> 16.7 ms at PoseNet shapes, value precision =
            # the V2V consumer's own bf16). f32 models keep exact tables.
            sw_dtype = (
                jnp.bfloat16 if self.dtype == jnp.bfloat16 else None
            )
            cubes = sample_and_aggregate_slicewarp(
                heatmaps, sample_grid, bounding, self.cube_size, num_cubes=K,
                mode="flags",  # per-slice orientation/lattice selection
                dtype=sw_dtype,
                pre_sliced=True,
                out_layout="ndhwc",
                # inference: multi-view fused kernel (samples + f32
                # accumulators stay in VMEM across views); training keeps
                # the per-view path, whose custom VJP is the Pallas adjoint.
                # DEFAULT ON since r5: first real Mosaic compile validated
                # on v5e (after widening the SMEM flip/nfail blocks to full
                # trailing dims) and measured faster than the per-view path
                # at K=10 bench shapes — 236.2 vs 243.3 ms/batch
                # (scripts/microbench_sampwrap.py). SP3D_FUSED_AGG=0 opts
                # back out to the per-view path.
                fused=(not train) and os.environ.get(
                    "SP3D_FUSED_AGG", "1"
                ) == "1",
            ).reshape(B * K, X, Y, Z, J)
        else:
            feats = sample_and_aggregate_cmajor(
                heatmaps, sample_grid, bounding
            )  # (B, J, K*N) — channel-major keeps the K*N axis in the lanes
            cubes = (
                feats.reshape(B, J, K, X, Y, Z)
                .transpose(0, 2, 3, 4, 5, 1)
                .reshape(B * K, X, Y, Z, J)
            )
        # zero invalid candidates' cubes so they contribute nothing downstream
        cubes = cubes * valid.reshape(B * K, 1, 1, 1, 1)
        # BatchNorm statistics only over valid candidates (the reference runs
        # V2V on valid candidates alone, ref pose_regression_net.py:49-51);
        # when nothing is valid, fall back to the full batch so masked
        # moments stay finite (the loss is masked out either way).
        bn_mask = None
        if train:
            any_valid = jnp.any(valid > 0)
            stats_sel = jnp.where(any_valid, valid, jnp.ones_like(valid))
            bn_mask = (stats_sel > 0).reshape(B * K, 1, 1, 1, 1)
        scored = self._apply_v2v(cubes, bn_mask, B, K, train)  # (B*K, X, Y, Z, J)

        # separable soft-argmax directly on the NDHWC volume: no
        # (B, K, J, N) score transpose and no (B, K, N, 3) grid tensor
        # (identical math — the voxel grid is axis-separable)
        offs = [
            jnp.linspace(
                -float(self.grid_size[d]) / 2.0,
                float(self.grid_size[d]) / 2.0,
                int(self.cube_size[d]),
            )
            for d in range(3)
        ]
        c_flat = centers.reshape(B * K, 3)
        axes = tuple(c_flat[:, d : d + 1] + offs[d][None] for d in range(3))
        pred = soft_argmax_ndhwc(scored, axes, beta=self.beta).reshape(
            B, K, J, 3
        )
        pred = pred * valid[..., None, None]
        return pred, valid
