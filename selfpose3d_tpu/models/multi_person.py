"""Top-level multi-person pose models.

MultiPersonPoseNetSSV: the SelfPose3d model — per-view backbone heatmaps,
self-supervised RootNet (synthetic roots), per-candidate PoseNet, and the six
SSV loss terms (ref: lib/models/multi_person_posenet_ssv.py:29-501).

MultiPersonPoseNet: the supervised VoxelPose baseline
(ref: lib/models/multi_person_posenet.py:20-111).

TPU-first design notes:
  * (batch, views) and (batch, augs) are folded into one leading axis for the
    backbone — 1 conv pass instead of the reference's 15 sequential ones.
  * All person/candidate dimensions are fixed-shape + masked; the reference's
    data-dependent branches (empty-candidate dummy losses,
    ref: multi_person_posenet_ssv.py:429,496) become multiplicative gates, so
    one jit graph covers every batch.
  * Hungarian matching runs on-device (ops/matching.py) — no scipy sync.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from selfpose3d_tpu.config import Config
from selfpose3d_tpu.data.structures import AugBranch
from selfpose3d_tpu.geometry.cameras import project_points_with_trans
from selfpose3d_tpu.models.pose_net import PoseNet
from selfpose3d_tpu.models.pose_resnet import PoseResNet, PoseResAttnNet
from selfpose3d_tpu.models.root_net import RootNet
from selfpose3d_tpu.ops.gaussian import render_gaussian_heatmaps
from selfpose3d_tpu.ops.matching import masked_assignment_cost


def _mse(a, b):
    return jnp.mean((a - b) ** 2)


class MultiPersonPoseNetSSV(nn.Module):
    """Self-supervised multi-view multi-person 3D pose model."""

    cfg: Config
    dtype: Any = jnp.float32

    def setup(self):
        c = self.cfg
        if c.BACKBONE_MODEL:
            self.backbone = PoseResNet(
                num_layers=c.POSE_RESNET.NUM_LAYERS,
                num_joints=c.NETWORK.NUM_JOINTS,
                deconv_filters=tuple(c.POSE_RESNET.NUM_DECONV_FILTERS),
                deconv_kernels=tuple(c.POSE_RESNET.NUM_DECONV_KERNELS),
                final_conv_kernel=c.POSE_RESNET.FINAL_CONV_KERNEL,
                deconv_with_bias=c.POSE_RESNET.DECONV_WITH_BIAS,
                dtype=self.dtype,
            )
        if c.WITH_ATTN:
            self.attn = PoseResAttnNet(
                num_layers=c.ATTN_NUM_LAYERS,
                num_joints=c.NETWORK.NUM_JOINTS,
                dtype=self.dtype,
            )
        use_root_gt = c.NETWORK.USE_GT or c.NETWORK.TRAIN_ONLY_2D
        if not use_root_gt:
            self.root_net = RootNet(
                space_size=tuple(c.MULTI_PERSON.SPACE_SIZE),
                space_center=tuple(c.MULTI_PERSON.SPACE_CENTER),
                cube_size=tuple(c.MULTI_PERSON.INITIAL_CUBE_SIZE),
                image_wh=tuple(c.NETWORK.IMAGE_SIZE),
                max_people=c.MULTI_PERSON.MAX_PEOPLE_NUM,
                threshold=c.MULTI_PERSON.THRESHOLD,
                syn_range=tuple(c.NETWORK.ROOTNET_SYN_RANGE),
                hm_sigma=float(c.NETWORK.SIGMA),
                sampling=c.NETWORK.SAMPLING,
                dtype=self.dtype,
            )
        if not c.NETWORK.TRAIN_ONLY_2D and not c.NETWORK.TRAIN_ONLY_ROOTNET:
            self.pose_net = PoseNet(
                grid_size=tuple(c.PICT_STRUCT.GRID_SIZE),
                cube_size=tuple(c.PICT_STRUCT.CUBE_SIZE),
                image_wh=tuple(c.NETWORK.IMAGE_SIZE),
                num_joints=c.NETWORK.NUM_JOINTS,
                beta=c.NETWORK.BETA,
                sampling=c.NETWORK.SAMPLING,
                buckets=tuple(c.MULTI_PERSON.CANDIDATE_BUCKETS),
                dtype=self.dtype,
            )

    # ------------------------------------------------------------------
    def _heatmaps(self, branch: AugBranch, train: bool) -> jnp.ndarray:
        """Backbone -> (B, V, Hh, Wh, J).

        Training folds (B, V) into one batch for maximum MXU occupancy; at
        inference the views are processed as V sequential B-sized chunks,
        keeping only one view's ResNet activations live (a 5x peak-HBM
        reduction at 960x512 — the folded version OOMs a 16G v5e at B=4).
        """
        if branch.views is None:
            return branch.input_heatmaps
        B, V, H, W, C = branch.views.shape
        bn_train = train and self.cfg.NETWORK.TRAIN_BACKBONE
        if train:
            flat = branch.views.reshape(B * V, H, W, C)
            hm = self.backbone(flat, train=bn_train)
            return hm.reshape(B, V, hm.shape[1], hm.shape[2], hm.shape[3])
        hm = nn.scan(
            lambda mdl, _, v: (None, mdl(v, train=False)),
            variable_broadcast=["params", "batch_stats"],
            split_rngs={"params": False},
            in_axes=0,
            out_axes=0,
        )(self.backbone, None, jnp.moveaxis(branch.views, 1, 0))[1]
        return jnp.moveaxis(hm, 0, 1)

    def _attns(self, branch: AugBranch, train: bool) -> jnp.ndarray:
        B, V, H, W, C = branch.views.shape
        flat = branch.views.reshape(B * V, H, W, C)
        a = self.attn(flat, train=train)
        return a.reshape(B, V, a.shape[1], a.shape[2], a.shape[3])

    def _root_heatmaps(self, heatmaps: jnp.ndarray) -> jnp.ndarray:
        """Select the root-joint channel when ROOTNET_ROOTHM
        (ref: cuboid_proposal_net_soft.py:129-135)."""
        if self.cfg.NETWORK.ROOTNET_ROOTHM:
            rid = self.cfg.DATASET.ROOTIDX
            return jax.lax.stop_gradient(heatmaps[..., rid : rid + 1])
        return heatmaps

    def _gt_grid_centers(self, branch: AugBranch) -> jnp.ndarray:
        """Candidate slots from GT roots (ref: multi_person_posenet_ssv.py:124-131)."""
        B = branch.batch_size
        K = self.cfg.MULTI_PERSON.MAX_PEOPLE_NUM
        gc = jnp.zeros((B, K, 5))
        P = branch.roots_3d.shape[1]
        roots = branch.roots_3d[:, :K]
        gc = gc.at[:, : roots.shape[1], 0:3].set(roots)
        slot = jnp.arange(K, dtype=jnp.float32)[None]
        is_person = slot < branch.num_person[:, None].astype(jnp.float32)
        gc = gc.at[:, :, 3].set(jnp.where(is_person, slot, -1.0))
        gc = gc.at[:, :, 4].set(is_person.astype(jnp.float32))
        return gc

    # ------------------------------------------------------------------
    def do_inference(
        self,
        branch: AugBranch,
        visualize_attn: bool = False,
    ):
        """Inference path (ref: multi_person_posenet_ssv.py:105-153).

        Returns (pred (B, K, J, 5), heatmaps, grid_centers[, attns]).
        """
        c = self.cfg
        heatmaps = self._heatmaps(branch, train=False)
        B = heatmaps.shape[0]
        K = c.MULTI_PERSON.MAX_PEOPLE_NUM
        J = c.NETWORK.NUM_JOINTS

        if c.NETWORK.USE_GT or c.NETWORK.TRAIN_ONLY_2D:
            grid_centers = self._gt_grid_centers(branch)
        else:
            _, grid_centers = self.root_net(
                self._root_heatmaps(heatmaps),
                branch.cam,
                branch.trans,
                branch.orig_wh,
                hflip=None,
                train=False,
            )

        pred = jnp.zeros((B, K, J, 5))
        pred = pred.at[..., 3:].set(grid_centers[:, :, None, 3:])

        run_posenet = (
            not c.EVAL_ROOTNET_ONLY
            and not c.NETWORK.TRAIN_ONLY_ROOTNET
            and not c.NETWORK.TRAIN_ONLY_2D
        )
        if run_posenet:
            poses, _ = self.pose_net(
                heatmaps, branch.cam, branch.trans, branch.orig_wh,
                grid_centers, hflip=None, train=False,
            )
            pred = pred.at[..., 0:3].set(jax.lax.stop_gradient(poses))

        if visualize_attn:
            attns = self._attns(branch, train=False)
            return pred, heatmaps, grid_centers, attns
        return pred, heatmaps, grid_centers

    # ------------------------------------------------------------------
    def _l1_matching_loss(
        self,
        kps_2d: jnp.ndarray,
        cand_valid: jnp.ndarray,
        joints: jnp.ndarray,
        joints_vis: jnp.ndarray,
    ) -> jnp.ndarray:
        """Hungarian-matched normalized L1 (ref: multi_person_posenet_ssv.py:155-194).

        Args:
          kps_2d:     (B, V, K, J, 2) projected candidate joints (pixels).
          cand_valid: (B, K)
          joints:     (B, V, P, J, 2) pseudo-label joints.
          joints_vis: (B, V, P, J, 2)
        """
        c = self.cfg
        W = float(c.NETWORK.IMAGE_SIZE[0])
        H = float(c.NETWORK.IMAGE_SIZE[1])
        norm = jnp.array([W, H], jnp.float32)

        pred_n = kps_2d / norm
        tgt_n = joints / norm

        # gt validity: person has any nonzero joint coordinate
        gt_valid = jnp.sum(jnp.abs(joints), axis=(-1, -2)) != 0  # (B, V, P)

        # cost[b,v,t,p] = mean_{j,c} |pred_p - tgt_t| * vis_t
        diff = jnp.abs(
            pred_n[:, :, None, :, :, :] - tgt_n[:, :, :, None, :, :]
        )  # (B, V, P, K, J, 2)
        cost = jnp.mean(diff * joints_vis[:, :, :, None, :, :], axis=(-1, -2))

        B, V, P, K = cost.shape
        flat_cost = cost.reshape(B * V, P, K)
        flat_gt = gt_valid.reshape(B * V, P)
        flat_cand = jnp.broadcast_to(
            (cand_valid > 0)[:, None, :], (B, V, K)
        ).reshape(B * V, K)

        def one(cst, rv, cv):
            # pad rows/cols to the common max size for the square solver
            M = max(P, K)
            sq = jnp.zeros((M, M), jnp.float32)
            sq = sq.at[:P, :K].set(cst)
            rmask = jnp.zeros(M, bool).at[:P].set(rv)
            cmask = jnp.zeros(M, bool).at[:K].set(cv)
            total = masked_assignment_cost(sq, rmask, cmask)
            any_pair = jnp.any(rv) & jnp.any(cv)
            return total * any_pair.astype(jnp.float32)

        losses = jax.vmap(one)(flat_cost, flat_gt, flat_cand)  # (B*V,)

        if c.L1_ATTN:
            # drop the single worst view-sample term (ref: :187-191)
            mask = jnp.ones_like(losses).at[jnp.argmax(losses)].set(0.0)
            return jnp.sum(losses * mask) / (losses.shape[0] - 1)
        return jnp.mean(losses)

    # ------------------------------------------------------------------
    def ssv_losses(
        self,
        branch1: AugBranch,
        branch2: AugBranch,
        branch3: AugBranch,
        train_posenet_stage: bool = True,
        use_l1_stage: bool = False,
        train: bool = True,
        synth_inject: Optional[dict] = None,
        bn_eval: bool = False,
        attn_inject: Optional[jnp.ndarray] = None,
        k_cap: Optional[int] = None,
    ) -> Tuple[Optional[jnp.ndarray], jnp.ndarray, Optional[jnp.ndarray], Dict[str, jnp.ndarray]]:
        """The six SSV loss terms (ref: multi_person_posenet_ssv.py:197-501).

        ``train_posenet_stage`` / ``use_l1_stage`` are the static epoch gates
        (epoch >= INIT_TRAIN_EPOCHS_ROOTNET / L1_EPOCH); recompiling once per
        stage boundary beats carrying traced epoch conditionals.

        ``k_cap``: static candidate cap for the PoseNet stage — the
        train-step-level bucket dispatch (TRAIN.BUCKET_DISPATCH='meta')
        compiles one single-branch graph per bucket and slices the
        score-sorted proposals to ``k_cap`` here, instead of the in-graph
        nn.switch (whose multi-branch TRAIN graph blows up remote
        compilation). Valid proposals beyond ``k_cap`` are dropped — the
        documented deviation of that mode (config.py TRAIN.BUCKET_DISPATCH).

        TPU-first restructuring: the reference runs each network once per
        augmentation branch (15 sequential ResNet passes per step,
        ref: :227-275). Here the branches are FOLDED into the batch axis —
        one backbone call on 3B, one attention call on 2B, one RootNet main +
        one synthetic pass on 3B, one PoseNet pass on 2B — algebraically
        identical losses (branch shapes are equal so concatenated means
        decompose exactly), one-third the traced graph, and far better MXU
        utilisation. The one intentional deviation: train-mode BatchNorm
        statistics pool over branches/views instead of per-call (the
        reference itself computes them per DataParallel replica).

        Returns (pred2, heatmaps3, grid_centers, losses-dict).
        """
        c = self.cfg
        losses: Dict[str, jnp.ndarray] = {}
        B = branch1.batch_size
        # bn_eval: keep the train-stage loss composition but run every BN in
        # running-average mode — used by the torch-oracle loss-parity tests,
        # where train-mode statistics pooling over the 3B fold (the one
        # documented numerics deviation, see class docstring) would mask
        # loss-composition errors.
        net_train = train and not bn_eval

        def cat(*trees):
            return jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *trees)

        branches_all = cat(branch1, branch2, branch3)  # (3B, ...)
        heatmaps_all = self._heatmaps(branches_all, train=net_train)  # (3B, V, H, W, J)
        heatmaps1, heatmaps2, heatmaps3 = jnp.split(heatmaps_all, 3, axis=0)

        branches_12 = cat(branch1, branch2)  # (2B, ...)
        if c.WITH_ATTN:
            # attn_inject: fixed attention maps (2B, V, Hh, Wh, J) — used by
            # the torch-oracle parity tests to pin the attention-weighted
            # loss composition without an image backbone
            attns_12 = (
                attn_inject
                if attn_inject is not None
                else self._attns(branches_12, train=net_train)
            )  # (2B, V, H, W, J)

        # ---- 2D heatmap loss vs pseudo labels (ref: :281-290)
        if branch1.target_2d is not None:
            # equal-size branches: mse over the fold == mean of the 3 mses
            losses["loss_2d"] = _mse(branches_all.target_2d, heatmaps_all)
        else:
            losses["loss_2d"] = jnp.float32(0.0)

        if c.NETWORK.TRAIN_ONLY_2D:
            return None, heatmaps3, None, losses

        # ---- RootNet (ref: :297-335)
        use_root_gt = c.NETWORK.USE_GT
        if use_root_gt:
            grid_centers = self._gt_grid_centers(branch3)
        elif c.NETWORK.FREEZE_ROOTNET:
            _, grid_centers = self.root_net(
                self._root_heatmaps(heatmaps3),
                branch3.cam, branch3.trans, branch3.orig_wh,
                hflip=branch3.hflip, train=False,
            )
            grid_centers = jax.lax.stop_gradient(grid_centers)
        else:
            hm_wh = (heatmaps_all.shape[3], heatmaps_all.shape[2])

            main_all, gc_all = self.root_net(
                self._root_heatmaps(heatmaps_all),
                branches_all.cam, branches_all.trans, branches_all.orig_wh,
                hflip=branches_all.hflip, train=net_train,
            )
            grid_centers = gc_all[2 * B :]
            main12, main3 = main_all[: 2 * B], main_all[2 * B :]

            if c.NETWORK.ROOTNET_TRAIN_SYNTH and train:
                # groups=3: an independent num_roots draw per folded branch,
                # matching the reference's per-branch CuboidProposalNetSoft
                # calls (cuboid_proposal_net_soft.py:154 called 3x)
                syn_all, tgt_all = self.root_net.train_synth(
                    branches_all.cam, branches_all.trans, branches_all.orig_wh,
                    hm_wh, hflip=branches_all.hflip, train=net_train, groups=3,
                    inject=synth_inject,
                )
                # sum of 3 branch mses == 3 * mse over the fold
                losses["loss_root_syn"] = c.NETWORK.WEIGHT_ROOT_SYN * (
                    3.0 * _mse(syn_all, tgt_all)
                )
                if c.NETWORK.ROOT_CONSISTENCY_LOSS:
                    main3_sg = jax.lax.stop_gradient(main3)
                    tiled3 = jnp.concatenate([main3_sg, main3_sg], axis=0)
                    losses["loss_root_reg"] = c.NETWORK.WEIGHT_ROOT_REG * (
                        2.0 * _mse(main12, tiled3)
                    )
            else:
                # supervised 3D-cube loss variant (ref: :331-335)
                tgt12 = jnp.concatenate(
                    [branch1.target_3d, branch2.target_3d], axis=0
                )
                losses["loss_root_reg"] = 2.0 * _mse(main12, tgt12)

        if c.NETWORK.TRAIN_ONLY_ROOTNET:
            return None, heatmaps3, grid_centers, losses

        # ---- PoseNet + cross-augmentation projection losses (ref: :340-499)
        K = c.MULTI_PERSON.MAX_PEOPLE_NUM
        J = c.NETWORK.NUM_JOINTS
        pred2_out = None
        # host-dispatch candidate cap: static slice of the score-sorted
        # proposals, single-branch PoseNet graph. The in-graph nn.switch is
        # INFERENCE-ONLY (config.py TRAIN.BUCKET_DISPATCH): a multi-branch
        # graph under grad retains every branch's backward and OOMs the
        # compiler, so the train path always runs a single branch — full K
        # here, or the host-dispatched k_cap slice.
        Kp = int(k_cap) if k_cap else K
        bucketed = False
        gc_pose = grid_centers[:, :Kp]

        if train_posenet_stage:
            single = c.NETWORK.SINGLE_AUG_TRAINING_POSENET
            hm_wh = (heatmaps_all.shape[3], heatmaps_all.shape[2])

            def pad_pred(p):
                """(B, Kp, J, 5) -> (B, K, J, 5) fixed output shape."""
                if Kp == K:
                    return p
                return jnp.pad(p, ((0, 0), (0, K - Kp), (0, 0), (0, 0)))

            if single:
                pred1, valid = self.pose_net(
                    heatmaps1, branch1.cam, branch1.trans, branch1.orig_wh,
                    gc_pose, hflip=branch1.hflip, train=net_train,
                    bucketed=bucketed,
                )
                any_valid = (jnp.sum(valid) > 0).astype(jnp.float32)
                kps = project_points_with_trans(
                    pred1.reshape(B, 1, Kp * J, 3), branch1.cam, branch1.trans
                ).reshape(B, branch1.num_views, Kp, J, 2)
                hm = render_gaussian_heatmaps(
                    kps, hm_wh, sigma=3.0, coord_scale=0.25,
                    mask=jnp.broadcast_to(valid[:, None], (B, branch1.num_views, Kp)),
                )
                hm11 = jnp.transpose(hm, (0, 1, 3, 4, 2))
                losses["loss_pose3d_ssv"] = _mse(branch1.target_2d, hm11) * any_valid
                pred2_out = jax.lax.stop_gradient(
                    pad_pred(jnp.concatenate(
                        [pred1, jnp.broadcast_to(
                            gc_pose[:, :, None, 3:], (B, Kp, J, 2)
                        )], axis=-1,
                    ))
                )
                return pred2_out, heatmaps3, grid_centers, losses

            # one PoseNet pass over both augmented branches (2B)
            gc_tiled = jnp.concatenate([gc_pose, gc_pose], axis=0)
            hm12_in = jnp.concatenate([heatmaps1, heatmaps2], axis=0)
            pred_12, valid_12 = self.pose_net(
                hm12_in, branches_12.cam, branches_12.trans, branches_12.orig_wh,
                gc_tiled, hflip=branches_12.hflip, train=net_train,
                bucketed=bucketed,
            )
            pred1, pred2 = pred_12[:B], pred_12[B:]
            valid = valid_12[:B]
            any_valid = (jnp.sum(valid) > 0).astype(jnp.float32)

            # cross-projection fold: pred2 -> branch1's frame, pred1 -> branch2's
            # (ref: :432-437). Cameras are shared; only trans/hflip differ.
            pred_cross = jnp.concatenate([pred2, pred1], axis=0)  # (2B, Kp, J, 3)
            kps_cross = project_points_with_trans(
                pred_cross.reshape(2 * B, 1, Kp * J, 3),
                branches_12.cam, branches_12.trans,
            ).reshape(2 * B, branch1.num_views, Kp, J, 2)
            hm_cross = render_gaussian_heatmaps(
                kps_cross, hm_wh, sigma=3.0, coord_scale=0.25,
                mask=jnp.broadcast_to(
                    valid_12[:, None], (2 * B, branch1.num_views, Kp)
                ),
            )
            hm_cross = jnp.transpose(hm_cross, (0, 1, 3, 4, 2))  # (2B, V, H, W, J)
            # rows [:B] = hm21 (pred2 in frame1), rows [B:] = hm12 (pred1 in frame2)

            targets_12 = branches_12.target_2d
            if c.WITH_ATTN:
                # attns share the heatmap layout (ref: :469-476)
                losses["loss_pose3d_ssv"] = (
                    2.0 * jnp.mean(((targets_12 - hm_cross) ** 2) * attns_12)
                ) * any_valid
                losses["loss_attn_ssv"] = (
                    2.0 * _mse(attns_12, jnp.ones_like(attns_12))
                ) * c.ATTN_WEIGHT * any_valid
            else:
                losses["loss_pose3d_ssv"] = (
                    2.0 * _mse(targets_12, hm_cross)
                ) * any_valid

            if c.USE_L1 and use_l1_stage:
                kps21, kps12 = kps_cross[:B], kps_cross[B:]
                losses["loss_pose3d_l1_ssv"] = (
                    self._l1_matching_loss(
                        kps12, valid, branch2.joints, branch2.joints_vis
                    )
                    + self._l1_matching_loss(
                        kps21, valid, branch1.joints, branch1.joints_vis
                    )
                ) * c.L1_WEIGHT * any_valid

            pred2_out = jax.lax.stop_gradient(
                pad_pred(jnp.concatenate(
                    [pred2, jnp.broadcast_to(
                        gc_pose[:, :, None, 3:], (B, Kp, J, 2)
                    )], axis=-1,
                ))
            )
        else:
            losses["loss_pose3d_ssv"] = jnp.float32(0.0)

        return pred2_out, heatmaps3, grid_centers, losses

    def __call__(self, branch: AugBranch):
        """Default apply path = inference (keeps init simple)."""
        return self.do_inference(branch)


class MultiPersonPoseNet(nn.Module):
    """Supervised VoxelPose baseline (ref: lib/models/multi_person_posenet.py)."""

    cfg: Config
    dtype: Any = jnp.float32

    def setup(self):
        c = self.cfg
        if c.BACKBONE_MODEL:
            self.backbone = PoseResNet(
                num_layers=c.POSE_RESNET.NUM_LAYERS,
                num_joints=c.NETWORK.NUM_JOINTS,
                deconv_filters=tuple(c.POSE_RESNET.NUM_DECONV_FILTERS),
                deconv_kernels=tuple(c.POSE_RESNET.NUM_DECONV_KERNELS),
                final_conv_kernel=c.POSE_RESNET.FINAL_CONV_KERNEL,
                deconv_with_bias=c.POSE_RESNET.DECONV_WITH_BIAS,
                dtype=self.dtype,
            )
        if not c.NETWORK.USE_GT:
            self.root_net = RootNet(
                space_size=tuple(c.MULTI_PERSON.SPACE_SIZE),
                space_center=tuple(c.MULTI_PERSON.SPACE_CENTER),
                cube_size=tuple(c.MULTI_PERSON.INITIAL_CUBE_SIZE),
                image_wh=tuple(c.NETWORK.IMAGE_SIZE),
                max_people=c.MULTI_PERSON.MAX_PEOPLE_NUM,
                threshold=c.MULTI_PERSON.THRESHOLD,
                sampling=c.NETWORK.SAMPLING,
                dtype=self.dtype,
            )
        if not c.NETWORK.TRAIN_ONLY_2D:
            self.pose_net = PoseNet(
                grid_size=tuple(c.PICT_STRUCT.GRID_SIZE),
                cube_size=tuple(c.PICT_STRUCT.CUBE_SIZE),
                image_wh=tuple(c.NETWORK.IMAGE_SIZE),
                num_joints=c.NETWORK.NUM_JOINTS,
                beta=c.NETWORK.BETA,
                sampling=c.NETWORK.SAMPLING,
                buckets=tuple(c.MULTI_PERSON.CANDIDATE_BUCKETS),
                dtype=self.dtype,
            )

    def __call__(self, branch: AugBranch, train: bool = False):
        """-> (pred (B,K,J,5), heatmaps, grid_centers, losses dict)."""
        c = self.cfg
        if branch.views is not None:
            B, V, H, W, C = branch.views.shape
            hm = self.backbone(
                branch.views.reshape(B * V, H, W, C),
                train=train and c.NETWORK.TRAIN_BACKBONE,
            )
            heatmaps = hm.reshape(B, V, *hm.shape[1:])
        else:
            heatmaps = branch.input_heatmaps
            B, V = heatmaps.shape[:2]

        losses: Dict[str, jnp.ndarray] = {}
        if branch.target_2d is not None:
            # per-joint MSE with target weights (ref: loss.py:39-55, model :50-55)
            if branch.weights_2d is not None:
                w = branch.weights_2d[:, :, None, None, :, 0]  # (B,V,1,1,J)
                losses["loss_2d"] = jnp.mean(
                    ((heatmaps - branch.target_2d) * w) ** 2
                )
            else:
                losses["loss_2d"] = _mse(heatmaps, branch.target_2d)
        else:
            losses["loss_2d"] = jnp.float32(0.0)

        if c.NETWORK.TRAIN_ONLY_2D:
            return None, heatmaps, None, losses

        if c.NETWORK.USE_GT:
            K = c.MULTI_PERSON.MAX_PEOPLE_NUM
            gc = jnp.zeros((B, K, 5))
            gc = gc.at[:, : branch.roots_3d.shape[1], 0:3].set(branch.roots_3d[:, :K])
            slot = jnp.arange(K, dtype=jnp.float32)[None]
            is_person = slot < branch.num_person[:, None].astype(jnp.float32)
            gc = gc.at[:, :, 3].set(jnp.where(is_person, slot, -1.0))
            gc = gc.at[:, :, 4].set(is_person.astype(jnp.float32))
            grid_centers = gc
        else:
            rid = c.DATASET.ROOTIDX_PSEUDO
            root_hm = (
                heatmaps[..., rid : rid + 1]
                if c.NETWORK.ROOTNET_ROOTHM
                else heatmaps
            )
            root_cubes, grid_centers = self.root_net(
                root_hm, branch.cam, branch.trans, branch.orig_wh, train=train
            )
            if branch.target_3d is not None:
                losses["loss_3d"] = _mse(root_cubes, branch.target_3d)
            if train and branch.roots_3d is not None and branch.num_person is not None:
                from selfpose3d_tpu.ops.proposal import match_proposals_to_gt

                flag = match_proposals_to_gt(
                    grid_centers[..., :3], branch.roots_3d, branch.num_person
                )
                grid_centers = grid_centers.at[..., 3].set(flag)

        K = c.MULTI_PERSON.MAX_PEOPLE_NUM
        J = c.NETWORK.NUM_JOINTS
        pred = jnp.zeros((B, K, J, 5))
        pred = pred.at[..., 3:].set(grid_centers[:, :, None, 3:])

        poses, valid = self.pose_net(
            heatmaps, branch.cam, branch.trans, branch.orig_wh,
            grid_centers, train=train,
        )
        pred = pred.at[..., 0:3].set(jax.lax.stop_gradient(poses))

        # weighted L1 vs matched GT poses (ref: multi_person_posenet.py:84-100):
        # each valid candidate's flag is its matched GT index; loss is the
        # mean over valid (sample, candidate) pairs of the vis-weighted L1.
        if train and branch.joints_3d is not None:
            flag = grid_centers[..., 3]  # (B, K)
            gt_idx = jnp.clip(flag, 0).astype(jnp.int32)  # (B, K)
            gt = jnp.take_along_axis(
                branch.joints_3d, gt_idx[..., None, None], axis=1
            )  # (B, K, J, 3)
            w = jnp.take_along_axis(
                branch.joints_3d_vis[..., 0:1], gt_idx[..., None, None], axis=1
            )  # (B, K, J, 1)
            per_cand = jnp.mean(
                jnp.abs(poses * w - gt * w), axis=(-1, -2)
            )  # (B, K)
            count = jnp.sum(valid)
            losses["loss_cord"] = jnp.sum(per_cand * valid) / jnp.maximum(count, 1.0)
        return pred, heatmaps, grid_centers, losses
