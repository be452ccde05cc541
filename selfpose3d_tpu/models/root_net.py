"""RootNet: coarse whole-space person localization.

Re-design of CuboidProposalNet / CuboidProposalNetSoft
(ref: lib/models/cuboid_proposal_net.py, cuboid_proposal_net_soft.py):
unproject per-view heatmaps over the full capture space -> V2VNet -> 3D
max-pool NMS + top-K proposals. The SSV variant trains on synthetically
generated 3D roots rendered to per-view 2D Gaussians
(ref: cuboid_proposal_net_soft.py:151-241).

TPU-first: the whole synthetic pipeline (root sampling, 3D target cube,
projection, 2D rendering, unprojection) is one fixed-shape jit graph; the
reference's python loops over batch/roots become masked array axes, and its
in-model torch RNG becomes an explicit flax 'synth' RNG collection.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from selfpose3d_tpu.geometry.cameras import CameraParams, project_points_with_trans
from selfpose3d_tpu.geometry.grid import compute_grid
from selfpose3d_tpu.models.v2v_net import V2VNet
from selfpose3d_tpu.ops.gaussian import render_gaussian_cube_3d, render_gaussian_heatmaps
from selfpose3d_tpu.ops.proposal import proposals_soft, match_proposals_to_gt, nms_topk, voxel_index_to_world
from selfpose3d_tpu.ops.unproject import unproject_heatmaps


class RootNet(nn.Module):
    """Whole-space unproject + V2V + proposal extraction.

    Heatmaps come in as (B, V, H, W, Jr) where Jr is 1 when the config selects
    the root-joint channel (cfg NETWORK.ROOTNET_ROOTHM) else NUM_JOINTS.
    """

    space_size: Tuple[float, float, float]
    space_center: Tuple[float, float, float]
    cube_size: Tuple[int, int, int]
    image_wh: Tuple[int, int]
    max_people: int = 10
    threshold: float = 0.3
    syn_sigma: float = 200.0
    syn_range: Tuple = ((2500.0, -2000.0), (1500.0, -1500.0), (250.0, -300.0))
    hm_sigma: float = 3.0
    sampling: str = "gather"
    dtype: Any = jnp.float32

    def setup(self):
        self.v2v_net = V2VNet(out_ch=1, dtype=self.dtype)

    def _unproject(self, heatmaps, cam, trans, orig_wh, hflip):
        B = heatmaps.shape[0]
        grid = compute_grid(
            self.space_size, jnp.asarray(self.space_center), self.cube_size
        )
        grid = jnp.broadcast_to(grid[None], (B,) + grid.shape)
        cubes, stats = unproject_heatmaps(
            heatmaps, grid, cam, trans, self.image_wh, orig_wh,
            self.cube_size, hflip=hflip, sampling=self.sampling,
            return_stats=True,
        )
        # telemetry (apply with mutable=['intermediates'] to read): worst
        # per-(sample, view) slice-warp hosting-failure count — counts past
        # the exact-fix budget (ops/unproject.py:_exact_fix_failed) degrade
        # silently, so bench surfaces this number.
        self.sow("intermediates", "sw_fallback_failed", stats["sw_failed_max"])
        return cubes

    def __call__(
        self,
        heatmaps: jnp.ndarray,
        cam: CameraParams,
        trans: jnp.ndarray,
        orig_wh: jnp.ndarray,
        hflip: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """-> (root_cubes (B, X, Y, Z), grid_centers (B, K, 5))."""
        cubes = self._unproject(heatmaps, cam, trans, orig_wh, hflip)
        root_cubes = self.v2v_net(cubes, train=train)[..., 0]  # (B, X, Y, Z)
        grid_centers = proposals_soft(
            jax.lax.stop_gradient(root_cubes),
            self.max_people,
            self.threshold,
            self.space_size,
            self.space_center,
            self.cube_size,
        )
        return root_cubes, grid_centers

    def train_synth(
        self,
        cam: CameraParams,
        trans: jnp.ndarray,
        orig_wh: jnp.ndarray,
        heatmap_wh: Tuple[int, int],
        hflip: Optional[jnp.ndarray] = None,
        train: bool = True,
        groups: int = 1,
        inject: Optional[dict] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Synthetic-root training pass (ref: cuboid_proposal_net_soft.py:151-241).

        Samples 1..max_people-1 random roots in the syn_range-shrunk space,
        renders their 3D Gaussian target cube and per-view 2D Gaussian
        heatmaps (plus 2% noise), then unprojects + V2Vs them.

        ``groups``: number of folded augmentation branches in the batch axis.
        The reference calls CuboidProposalNetSoft once per branch, drawing a
        fresh ``num_people`` each call (cuboid_proposal_net_soft.py:154); a
        folded 3B batch therefore draws one count per B-sized group so the
        per-step count distribution matches the reference's.

        ``inject``: optional deterministic draws replacing the RNG — dict
        with 'roots' (B, P, 3), 'counts' (groups,) int, 'noise' matching the
        rendered heatmap shape (B, V, 1, H, W). Used by the torch-oracle
        loss-parity tests (and reproducible debugging); no 'synth' RNG is
        consumed when given.

        Returns (root_cubes_syn (B,X,Y,Z), target_cubes (B,X,Y,Z)).
        """
        B, V = cam.R.shape[:2]
        P = self.max_people
        if inject is None:
            rng = self.make_rng("synth")
            k_n, k_x, k_y, k_z, k_zn, k_noise = jax.random.split(rng, 6)

        # world-space sampling bounds (grid extent + configured shrink)
        ss, sc, rr = self.space_size, self.space_center, self.syn_range
        min_x, max_x = sc[0] - ss[0] / 2 + rr[0][0], sc[0] + ss[0] / 2 + rr[0][1]
        min_y, max_y = sc[1] - ss[1] / 2 + rr[1][0], sc[1] + ss[1] / 2 + rr[1][1]
        min_z, max_z = sc[2] - ss[2] / 2 + rr[2][0], sc[2] + ss[2] / 2 + rr[2][1]

        assert B % groups == 0, "folded batch must split evenly into branches"
        if inject is None:
            # 1..P-1 inclusive; one independent draw per folded branch group,
            # shared across that group's batch rows (reference semantics: one
            # np.random draw per CuboidProposalNetSoft call)
            num_roots = jax.random.randint(k_n, (groups,), 1, P)
            x = jax.random.uniform(k_x, (B, P), minval=min_x, maxval=max_x)
            y = jax.random.uniform(k_y, (B, P), minval=min_y, maxval=max_y)
            # z: one base height per sample, shared across roots, + noise
            z_base = jax.random.uniform(k_z, (B, 1), minval=min_z, maxval=max_z)
            z = z_base + jax.random.normal(k_zn, (B, P)) * 50.0
            roots = jnp.stack([x, y, z], axis=-1)  # (B, P, 3)
        else:
            num_roots = jnp.asarray(inject["counts"], jnp.int32)
            roots = jnp.asarray(inject["roots"], jnp.float32)
        self.sow("intermediates", "synth_num_roots", num_roots)
        counts = jnp.repeat(num_roots, B // groups)  # (B,)
        mask_b = (
            jnp.arange(P)[None, :] < counts[:, None]
        ).astype(jnp.float32)  # (B, P)
        roots = jax.lax.stop_gradient(roots)

        from selfpose3d_tpu.geometry.grid import grid_1d_axes

        gx, gy, gz = grid_1d_axes(ss, sc, self.cube_size)
        target_cubes = render_gaussian_cube_3d(
            roots, jnp.asarray(gx), jnp.asarray(gy), jnp.asarray(gz),
            sigma=self.syn_sigma, mask=mask_b,
        )

        # project roots into every view and render 1-channel heatmaps
        pix = project_points_with_trans(
            roots[:, None], cam, trans
        )  # (B, V, P, 2)
        hm = render_gaussian_heatmaps(
            pix[..., None, :],  # (B, V, P, 1, 2): J=1 root channel
            heatmap_wh,
            sigma=self.hm_sigma,
            coord_scale=0.25,
            mask=jnp.broadcast_to(mask_b[:, None], (B, V, P)),
        )  # (B, V, 1, H, W)
        if inject is None:
            noise = 0.02 * jax.random.normal(k_noise, hm.shape)
        else:
            noise = jnp.asarray(inject["noise"], jnp.float32).reshape(hm.shape)
        hm = jnp.clip(hm + noise, 0.0, 1.0)
        hm = jax.lax.stop_gradient(hm)
        heatmaps = jnp.transpose(hm, (0, 1, 3, 4, 2))  # (B, V, H, W, 1)

        cubes = self._unproject(heatmaps, cam, trans, orig_wh, hflip)
        root_cubes_syn = self.v2v_net(cubes, train=train)[..., 0]
        return root_cubes_syn, target_cubes


class SupervisedProposal(nn.Module):
    """GT-matched proposal flags for the supervised VoxelPose baseline
    (ref: lib/models/cuboid_proposal_net.py:14-83).

    Applied on top of RootNet's (values, locations): during training, each
    candidate's flag is the index of its nearest GT root within 500mm else -1.
    """

    space_size: Tuple[float, float, float]
    space_center: Tuple[float, float, float]
    cube_size: Tuple[int, int, int]
    max_people: int = 10
    threshold: float = 0.1

    def __call__(self, root_cubes, gt_roots=None, num_person=None, training=False):
        values, index = nms_topk(
            jax.lax.stop_gradient(root_cubes), self.max_people
        )
        loc = voxel_index_to_world(
            index, self.space_size, self.space_center, self.cube_size
        )
        if training and gt_roots is not None and num_person is not None:
            flag = match_proposals_to_gt(loc, gt_roots, num_person)
        else:
            flag = (values > self.threshold).astype(jnp.float32) - 1.0
        return jnp.concatenate(
            [loc, flag[..., None], values[..., None]], axis=-1
        )
