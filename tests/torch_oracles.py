"""Compact torch oracle models for parity testing.

These implement the *published architectures* (simple-baselines PoseResNet and
V2V-PoseNet U-Net) with torch layers, producing state dicts whose names match
the reference checkpoints, so converter + flax model can be validated
end-to-end against a live torch forward pass.
"""

import torch
import torch.nn as nn
import torch.nn.functional as F


class TorchBottleneck(nn.Module):
    def __init__(self, cin, planes, stride=1):
        super().__init__()
        cout = planes * 4
        self.conv1 = nn.Conv2d(cin, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes, momentum=0.1)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes, momentum=0.1)
        self.conv3 = nn.Conv2d(planes, cout, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(cout, momentum=0.1)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride, bias=False),
                nn.BatchNorm2d(cout, momentum=0.1),
            )

    def forward(self, x):
        r = x if self.downsample is None else self.downsample(x)
        y = F.relu(self.bn1(self.conv1(x)))
        y = F.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return F.relu(y + r)


class TorchPoseResNet(nn.Module):
    """ResNet-50 + 3 deconv + final 1x1, state-dict-compatible with the
    reference checkpoints."""

    def __init__(self, num_joints=15, blocks=(3, 4, 6, 3)):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64, momentum=0.1)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        cin = 64
        for si, (planes, n) in enumerate(zip((64, 128, 256, 512), blocks)):
            layers = []
            for b in range(n):
                stride = (1 if si == 0 else 2) if b == 0 else 1
                layers.append(TorchBottleneck(cin, planes, stride))
                cin = planes * 4
            setattr(self, f"layer{si + 1}", nn.Sequential(*layers))
        deconvs = []
        for _ in range(3):
            deconvs += [
                nn.ConvTranspose2d(cin, 256, 4, 2, 1, bias=False),
                nn.BatchNorm2d(256, momentum=0.1),
                nn.ReLU(inplace=True),
            ]
            cin = 256
        self.deconv_layers = nn.Sequential(*deconvs)
        self.final_layer = nn.Conv2d(256, num_joints, 1)

    def forward(self, x):
        x = self.maxpool(F.relu(self.bn1(self.conv1(x))))
        for i in range(1, 5):
            x = getattr(self, f"layer{i}")(x)
        return self.final_layer(self.deconv_layers(x))


def _res3d(cin, cout):
    m = nn.Module()
    m.res_branch = nn.Sequential(
        nn.Conv3d(cin, cout, 3, 1, 1),
        nn.BatchNorm3d(cout),
        nn.ReLU(True),
        nn.Conv3d(cout, cout, 3, 1, 1),
        nn.BatchNorm3d(cout),
    )
    m.skip_con = (
        nn.Sequential()
        if cin == cout
        else nn.Sequential(nn.Conv3d(cin, cout, 1), nn.BatchNorm3d(cout))
    )
    m.forward = lambda x: F.relu(m.res_branch(x) + (m.skip_con(x) if len(m.skip_con) else x))
    return m


def _up3d(cin, cout):
    m = nn.Module()
    m.block = nn.Sequential(
        nn.ConvTranspose3d(cin, cout, 2, 2, 0), nn.BatchNorm3d(cout), nn.ReLU(True)
    )
    m.forward = lambda x: m.block(x)
    return m


class TorchV2V(nn.Module):
    """V2V-PoseNet U-Net, state-dict-compatible with reference checkpoints."""

    def __init__(self, cin, cout):
        super().__init__()
        basic = nn.Module()
        basic.block = nn.Sequential(
            nn.Conv3d(cin, 16, 7, 1, 3), nn.BatchNorm3d(16), nn.ReLU(True)
        )
        basic.forward = lambda x: basic.block(x)
        self.front_layers = nn.Sequential(basic, _res3d(16, 32))
        ed = nn.Module()
        ed.skip_res1 = _res3d(32, 32)
        ed.encoder_res1 = _res3d(32, 64)
        ed.skip_res2 = _res3d(64, 64)
        ed.encoder_res2 = _res3d(64, 128)
        ed.mid_res = _res3d(128, 128)
        ed.decoder_res2 = _res3d(128, 128)
        ed.decoder_upsample2 = _up3d(128, 64)
        ed.decoder_res1 = _res3d(64, 64)
        ed.decoder_upsample1 = _up3d(64, 32)

        def ed_forward(x):
            s1 = ed.skip_res1(x)
            x = ed.encoder_res1(F.max_pool3d(x, 2))
            s2 = ed.skip_res2(x)
            x = ed.encoder_res2(F.max_pool3d(x, 2))
            x = ed.decoder_res2(ed.mid_res(x))
            x = ed.decoder_upsample2(x) + s2
            x = ed.decoder_res1(x)
            return ed.decoder_upsample1(x) + s1

        ed.forward = ed_forward
        self.encoder_decoder = ed
        self.output_layer = nn.Conv3d(32, cout, 1)

    def forward(self, x):
        return self.output_layer(self.encoder_decoder(self.front_layers(x)))


# ---------------------------------------------------------------------------
# Full-pipeline inference oracle: ProjectLayer + proposal + soft-argmax
# composed exactly like the reference's do_inference
# (ref: lib/models/multi_person_posenet_ssv.py:105-153). Used by
# tests/test_full_parity.py to validate the composed jax stack at pose level.
# ---------------------------------------------------------------------------


def torch_project_pose(x, cam):
    """N x 3 world-mm -> N x 2 pixels (ref: lib/utils/cameras.py:27-113)."""
    R, T, f, c, k, p = (cam[n] for n in ("R", "T", "f", "c", "k", "p"))
    n = x.shape[0]
    xcam = R @ (x.t() - T)
    y = xcam[:2] / (xcam[2] + 1e-5)
    r2 = torch.clamp(torch.sum(y**2, dim=0, keepdim=True), max=1e10)
    r2exp = torch.cat([r2, r2**2, r2**3], dim=0)
    radial = 1 + torch.einsum("ij,ij->j", k.repeat(1, n), r2exp)
    tan = p[0] * y[1] + p[1] * y[0]
    corr = (radial + 2 * tan).repeat(2, 1)
    y = y * corr + torch.ger(torch.cat([p[1], p[0]]).view(-1), r2.view(-1))
    return (f * y + c).t()


def torch_compute_grid(box_size, box_center, nbins):
    """x-major / z-minor voxel-center lattice (ref: project_layer.py:22-40)."""
    axes = [
        torch.linspace(-box_size[d] / 2, box_size[d] / 2, nbins[d]) + box_center[d]
        for d in range(3)
    ]
    gx, gy, gz = torch.meshgrid(*axes, indexing="ij")
    return torch.stack([gx.reshape(-1), gy.reshape(-1), gz.reshape(-1)], dim=1)


class TorchProjectLayer:
    """Reference ProjectLayer semantics (ref: lib/models/project_layer.py:15-105)."""

    def __init__(self, image_size, heatmap_size):
        self.img_size = list(image_size)  # (W, H)
        self.heatmap_size = list(heatmap_size)

    def get_voxel(self, heatmaps, cams, trans, orig_wh, grid_size, grid_center,
                  cube_size, flip_xcoords=None):
        """heatmaps: list per view of (B, J, H, W); cams: [view][batch] dicts;
        trans: (B, V, >=2, 3); orig_wh: (B, V, 2); grid_center: list of one
        center (rootnet) or (B, >=4) per-candidate centers (posenet)."""
        B, J = heatmaps[0].shape[:2]
        V = len(heatmaps)
        nbins = cube_size[0] * cube_size[1] * cube_size[2]
        w, h = self.heatmap_size
        cubes = torch.zeros(B, J, 1, nbins, V)
        bounding = torch.zeros(B, 1, 1, nbins, V)
        grids = torch.zeros(B, nbins, 3)
        for i in range(B):
            if len(grid_center[0]) == 3 or grid_center[i][3] >= 0:
                center = grid_center[0] if len(grid_center) == 1 else grid_center[i]
                grid = torch_compute_grid(grid_size, center, cube_size)
                grids[i] = grid
                for v in range(V):
                    width, height = orig_wh[i, v, 0], orig_wh[i, v, 1]
                    xy = torch_project_pose(grid, cams[v][i])
                    bounding[i, 0, 0, :, v] = (
                        (xy[:, 0] >= 0) & (xy[:, 1] >= 0)
                        & (xy[:, 0] < width) & (xy[:, 1] < height)
                    ).float()
                    xy = torch.clamp(xy, -1.0, max(width, height))
                    tr = trans[i, v, :2]  # (2, 3)
                    ones = torch.ones(xy.shape[0], 1)
                    xy = torch.cat([xy, ones], dim=1) @ tr.t()
                    if flip_xcoords is not None and flip_xcoords[i]:
                        xy[:, 0] = self.img_size[0] - xy[:, 0]
                    xy = xy * torch.tensor([float(w), float(h)]) / torch.tensor(
                        [float(s) for s in self.img_size]
                    )
                    sg = xy / torch.tensor([w - 1.0, h - 1.0]) * 2.0 - 1.0
                    sg = torch.clamp(sg.view(1, 1, nbins, 2), -1.1, 1.1)
                    cubes[i : i + 1, :, :, :, v] += F.grid_sample(
                        heatmaps[v][i : i + 1], sg, align_corners=True
                    )
        cubes = torch.sum(cubes * bounding, dim=-1) / (
            torch.sum(bounding, dim=-1) + 1e-6
        )
        cubes[cubes != cubes] = 0.0
        cubes = cubes.clamp(0.0, 1.0)
        return cubes.view(B, J, *cube_size), grids


def torch_nms_topk(root_cubes, max_num):
    """max-pool keep-equal NMS + top-k unravel (ref: lib/core/proposal.py:18-48)."""
    B = root_cubes.shape[0]
    shape = root_cubes.shape[1:]
    pooled = F.max_pool3d(root_cubes, kernel_size=3, stride=1, padding=1)
    nmsed = (root_cubes == pooled).float() * root_cubes
    values, idx = nmsed.reshape(B, -1).topk(max_num)
    ix = idx // (shape[1] * shape[2])
    iy = (idx % (shape[1] * shape[2])) // shape[2]
    iz = idx % shape[2]
    return values, torch.stack([ix, iy, iz], dim=2).float()


def torch_proposals_soft(root_cubes, max_num, threshold, space_size,
                         space_center, cube_size):
    """ProposalLayerSoft (ref: cuboid_proposal_net_soft.py:18-68)."""
    values, index = torch_nms_topk(root_cubes, max_num)
    cube = torch.tensor([float(s) for s in cube_size])
    size = torch.tensor([float(s) for s in space_size])
    center = torch.tensor([float(s) for s in space_center])
    loc = index / (cube - 1.0) * size + center - size / 2.0
    B = root_cubes.shape[0]
    gc = torch.zeros(B, max_num, 5)
    gc[:, :, 0:3] = loc
    gc[:, :, 4] = values
    gc[:, :, 3] = (values > threshold).float() - 1.0
    return gc


def torch_soft_argmax(x, grids, beta):
    """(B, J, X, Y, Z), (B, N, 3) -> (B, J, 3) (ref: pose_regression_net.py:14-28)."""
    B, J = x.shape[:2]
    w = F.softmax(beta * x.reshape(B, J, -1, 1), dim=2)
    return torch.sum(w * grids.unsqueeze(1), dim=2)


class TorchInferencePipeline:
    """Composed rootnet -> proposals -> per-candidate posenet inference,
    mirroring MultiPersonPoseNetSSV.do_inference
    (ref: multi_person_posenet_ssv.py:105-153) with ROOTNET_ROOTHM root
    heatmaps (ref: cuboid_proposal_net_soft.py:129-147)."""

    def __init__(self, cfg_ns, root_v2v, pose_v2v):
        self.c = cfg_ns
        self.root_v2v = root_v2v
        self.pose_v2v = pose_v2v
        self.project = TorchProjectLayer(
            cfg_ns.NETWORK.IMAGE_SIZE, cfg_ns.NETWORK.HEATMAP_SIZE
        )

    @torch.no_grad()
    def do_inference(self, heatmaps, cams, trans, orig_wh):
        c = self.c
        B, J = heatmaps[0].shape[:2]
        K = c.MULTI_PERSON.MAX_PEOPLE_NUM
        rid = c.DATASET.ROOTIDX

        root_hms = [hm[:, rid : rid + 1] for hm in heatmaps]
        initial_cubes, _ = self.project.get_voxel(
            root_hms, cams, trans, orig_wh,
            c.MULTI_PERSON.SPACE_SIZE, [c.MULTI_PERSON.SPACE_CENTER],
            c.MULTI_PERSON.INITIAL_CUBE_SIZE,
        )
        root_cubes = self.root_v2v(initial_cubes).squeeze(1)
        grid_centers = torch_proposals_soft(
            root_cubes, K, c.MULTI_PERSON.THRESHOLD,
            c.MULTI_PERSON.SPACE_SIZE, c.MULTI_PERSON.SPACE_CENTER,
            c.MULTI_PERSON.INITIAL_CUBE_SIZE,
        )

        pred = torch.zeros(B, K, J, 5)
        pred[:, :, :, 3:] = grid_centers[:, :, 3:].reshape(B, -1, 1, 2)
        for n in range(K):
            if (grid_centers[:, n, 3] >= 0).sum() > 0:
                cubes, grids = self.project.get_voxel(
                    heatmaps, cams, trans, orig_wh,
                    c.PICT_STRUCT.GRID_SIZE, grid_centers[:, n],
                    c.PICT_STRUCT.CUBE_SIZE,
                )
                index = grid_centers[:, n, 3] >= 0
                single = torch.zeros(B, J, 3)
                valid_scored = self.pose_v2v(cubes[index])
                single[index] = torch_soft_argmax(
                    valid_scored, grids[index], c.NETWORK.BETA
                )
                pred[:, n, :, 0:3] = single
        return pred, root_cubes, grid_centers


# ---------------------------------------------------------------------------
# SSV training-loss oracle: the reference's six self-supervised loss terms
# composed exactly as in the training forward pass
# (ref: lib/models/multi_person_posenet_ssv.py:197-501, l1 matching :155-194,
# synthetic-root pipeline: lib/models/cuboid_proposal_net_soft.py:152-241).
# Used by tests/test_ssv_loss_parity.py against the jax ssv_losses graph with
# identical converted weights and injected synth draws.
# ---------------------------------------------------------------------------


def torch_affine2d(xy, tr):
    """(N, 2) pixels through a (>=2, 3) affine (homogeneous)."""
    ones = torch.ones(xy.shape[0], 1)
    return torch.cat([xy, ones], dim=1) @ tr[:2].t()


def torch_render_sum_heatmaps(kps, width, height, stride=4.0, sigma=3.0):
    """(P, J, 2) image-px keypoints -> (J, H, W) sum-composited Gaussians,
    clipped to [0, 1] (ref: multi_person_posenet_ssv.py:413-420)."""
    P, J = kps.shape[:2]
    xx = torch.arange(width, dtype=torch.float32).view(1, 1, 1, width)
    yy = torch.arange(height, dtype=torch.float32).view(1, 1, height, 1)
    x = (kps[..., 0] / stride).view(P, J, 1, 1)
    y = (kps[..., 1] / stride).view(P, J, 1, 1)
    hm = torch.exp(-(((xx - x) / sigma) ** 2) / 2 - (((yy - y) / sigma) ** 2) / 2)
    return torch.clip(hm.sum(0), 0.0, 1.0)


def torch_render_root_cube(roots, g1x, g1y, g1z, sigma=200.0):
    """(P, 3) roots -> (X, Y, Z) max-composited truncated Gaussian target
    cube (ref: cuboid_proposal_net_soft.py:168-203 — the searchsorted window
    equals the |d| <= 3*sigma box on a sorted grid)."""
    cube = torch.zeros(len(g1x), len(g1y), len(g1z))
    for r in roots:
        dx, dy, dz = g1x - r[0], g1y - r[1], g1z - r[2]
        win = (
            (dx.abs() <= 3 * sigma).float()[:, None, None]
            * (dy.abs() <= 3 * sigma).float()[None, :, None]
            * (dz.abs() <= 3 * sigma).float()[None, None, :]
        )
        d2 = (
            (dx ** 2)[:, None, None]
            + (dy ** 2)[None, :, None]
            + (dz ** 2)[None, None, :]
        )
        cube = torch.maximum(cube, torch.exp(-d2 / (2 * sigma ** 2)) * win)
    return torch.clip(cube, 0.0, 1.0)


class TorchSSVLossPipeline:
    """Reference SSV loss composition (dual-aug, no-attn path) from torch
    pieces: per-branch RootNet main/synth passes, per-candidate PoseNet,
    cross-augmentation projection + Gaussian re-render MSE, Hungarian L1."""

    def __init__(self, cfg_ns, root_v2v, pose_v2v):
        self.c = cfg_ns
        self.root_v2v = root_v2v
        self.pose_v2v = pose_v2v
        self.project = TorchProjectLayer(
            cfg_ns.NETWORK.IMAGE_SIZE, cfg_ns.NETWORK.HEATMAP_SIZE
        )

    def _root_main(self, heatmaps, cams, trans, orig_wh):
        c = self.c
        rid = c.DATASET.ROOTIDX
        root_hms = [h[:, rid : rid + 1] for h in heatmaps]
        cubes, _ = self.project.get_voxel(
            root_hms, cams, trans, orig_wh,
            c.MULTI_PERSON.SPACE_SIZE, [c.MULTI_PERSON.SPACE_CENTER],
            c.MULTI_PERSON.INITIAL_CUBE_SIZE,
        )
        return self.root_v2v(cubes).squeeze(1)

    def _root_synth(self, cams, trans, orig_wh, roots, count, noise):
        """Injected-draw train_rootnet (ref: cuboid_proposal_net_soft.py:152-241).

        roots: (B, P, 3); count: roots 0..count-1 are live; noise: (B, V, H, W).
        """
        c = self.c
        B, V = roots.shape[0], len(cams)
        ss, scn = c.MULTI_PERSON.SPACE_SIZE, c.MULTI_PERSON.SPACE_CENTER
        cube_size = c.MULTI_PERSON.INITIAL_CUBE_SIZE
        g1 = [
            torch.linspace(-ss[d] / 2, ss[d] / 2, cube_size[d]) + scn[d]
            for d in range(3)
        ]
        target = torch.stack(
            [torch_render_root_cube(roots[b, :count], *g1) for b in range(B)]
        )
        w, h = self.project.heatmap_size
        sigma = float(c.NETWORK.SIGMA)
        hms = []  # per view: (B, 1, H, W)
        for v in range(V):
            hm_b = []
            for b in range(B):
                kps = torch_project_pose(roots[b, :count], cams[v][b])
                kps = torch_affine2d(kps, trans[b, v])
                hm = torch_render_sum_heatmaps(
                    kps[:, None, :], w, h, sigma=sigma
                )  # roots as persons, J=1
                hm = torch.clip(hm + noise[b, v][None], 0.0, 1.0)
                hm_b.append(hm)
            hms.append(torch.stack(hm_b))
        cubes, _ = self.project.get_voxel(
            hms, cams, trans, orig_wh,
            c.MULTI_PERSON.SPACE_SIZE, [c.MULTI_PERSON.SPACE_CENTER],
            c.MULTI_PERSON.INITIAL_CUBE_SIZE,
        )
        return self.root_v2v(cubes).squeeze(1), target

    def _posenet_all(self, heatmaps, cams, trans, orig_wh, grid_centers):
        """Per-candidate PoseNet loop (ref: multi_person_posenet_ssv.py:365-383)."""
        c = self.c
        B, J = heatmaps[0].shape[:2]
        K = grid_centers.shape[1]
        pred = torch.zeros(B, K, J, 3)
        for n in range(K):
            index = grid_centers[:, n, 3] >= 0
            if index.sum() > 0:
                cubes, grids = self.project.get_voxel(
                    heatmaps, cams, trans, orig_wh,
                    c.PICT_STRUCT.GRID_SIZE, grid_centers[:, n],
                    c.PICT_STRUCT.CUBE_SIZE,
                )
                single = torch.zeros(B, J, 3)
                single[index] = torch_soft_argmax(
                    self.pose_v2v(cubes[index]), grids[index], c.NETWORK.BETA
                )
                pred[:, n] = single
        return pred

    def _l1_matching(self, kps_pred, joints, joints_vis, valid_counts):
        """Hungarian L1 with drop-worst (ref: multi_person_posenet_ssv.py:155-194).

        kps_pred: (B, V, K, J, 2); joints/vis: (B, V, P, J, 2);
        valid_counts: (B,) number of valid candidates (score-sorted prefix).
        """
        from scipy.optimize import linear_sum_assignment

        c = self.c
        W, H = float(c.NETWORK.IMAGE_SIZE[0]), float(c.NETWORK.IMAGE_SIZE[1])
        B, V = kps_pred.shape[:2]
        losses = torch.zeros(V * B)
        for nv in range(V):
            for bs in range(B):
                num_gt = int((joints[bs, nv].sum(-1).sum(-1) != 0).sum())
                num_pred = int(valid_counts[bs])
                if num_pred == 0 or num_gt == 0:
                    continue
                tgt = joints[bs, nv, :num_gt] / torch.tensor([W, H])
                vis = joints_vis[bs, nv, :num_gt]
                prd = kps_pred[bs, nv, :num_pred] / torch.tensor([W, H])
                d = torch.zeros(num_gt, num_pred)
                for t in range(num_gt):
                    for p in range(num_pred):
                        d[t, p] = ((prd[p] - tgt[t]) * vis[t]).abs().mean()
                # assignment indices are discrete (non-differentiable);
                # detach so the oracle also runs under grad for the train-
                # step baseline (scripts/baseline_torch_train_cpu.py)
                rr, cc = linear_sum_assignment(d.detach().numpy())
                losses[nv * B + bs] = d[rr, cc].sum()
        if c.L1_ATTN:
            mask = torch.ones(V * B)
            mask[torch.argmax(losses)] = 0.0
            return (losses * mask).sum() / (V * B - 1)
        return losses.mean()

    def losses(self, hm1, hm2, hm3, t2d1, t2d2, t2d3, cams,
               trans1, trans2, trans3, orig_wh, joints1, vis1, joints2, vis2,
               synth, attns=None):
        """All six terms for the rootnet+posenet+L1 stage.

        hm*/t2d*: per-branch [view](B, J, H, W) lists / (B, V, J, H, W);
        synth: dict with per-branch 'roots' (3, B, P, 3), 'counts' (3,),
        'noise' (3, B, V, H, W); attns: optional (attns1, attns2) each
        (B, V, J, H, W) — enables the WITH_ATTN composition
        (ref: multi_person_posenet_ssv.py:469-483).
        """
        c = self.c
        F_ = F
        out = {}
        mse = F_.mse_loss
        out["loss_2d"] = (
            mse(torch.stack(hm1, 1), t2d1)
            + mse(torch.stack(hm2, 1), t2d2)
            + mse(torch.stack(hm3, 1), t2d3)
        ) / 3.0

        m1 = self._root_main(hm1, cams, trans1, orig_wh)
        m2 = self._root_main(hm2, cams, trans2, orig_wh)
        m3 = self._root_main(hm3, cams, trans3, orig_wh)
        grid_centers = torch_proposals_soft(
            m3, c.MULTI_PERSON.MAX_PEOPLE_NUM, c.MULTI_PERSON.THRESHOLD,
            c.MULTI_PERSON.SPACE_SIZE, c.MULTI_PERSON.SPACE_CENTER,
            c.MULTI_PERSON.INITIAL_CUBE_SIZE,
        )
        syn_losses = []
        for bi, (hmb, trb) in enumerate(((hm1, trans1), (hm2, trans2), (hm3, trans3))):
            syn, tgt = self._root_synth(
                cams, trb, orig_wh,
                synth["roots"][bi], int(synth["counts"][bi]),
                synth["noise"][bi],
            )
            syn_losses.append(mse(syn, tgt))
        out["loss_root_syn"] = c.NETWORK.WEIGHT_ROOT_SYN * sum(syn_losses)
        m3d = m3.detach()
        out["loss_root_reg"] = c.NETWORK.WEIGHT_ROOT_REG * (
            mse(m1, m3d) + mse(m2, m3d)
        )

        pred1 = self._posenet_all(hm1, cams, trans1, orig_wh, grid_centers)
        pred2 = self._posenet_all(hm2, cams, trans2, orig_wh, grid_centers)
        valid_counts = (grid_centers[..., 3] >= 0).sum(-1)  # (B,)

        B, V = t2d1.shape[0], len(cams)
        J = hm1[0].shape[1]
        w_img, h_img = self.project.heatmap_size

        def cross_render_and_kps(pred_src, trans_dst):
            """pred_src (B,K,J,3) -> (hm (B,V,J,H,W), kps (B,V,K,J,2))."""
            K = pred_src.shape[1]
            hms = torch.zeros(B, V, J, h_img, w_img)
            kps_all = torch.zeros(B, V, K, J, 2)
            for v in range(V):
                for b in range(B):
                    nv_valid = int(valid_counts[b])
                    kps = torch_project_pose(
                        pred_src[b].reshape(K * J, 3), cams[v][b]
                    )
                    kps = torch_affine2d(kps, trans_dst[b, v]).reshape(K, J, 2)
                    kps_all[b, v] = kps
                    hms[b, v] = torch_render_sum_heatmaps(
                        kps[:nv_valid], w_img, h_img
                    )
            return hms, kps_all

        hm_21, kps21 = cross_render_and_kps(pred2, trans1)  # pred2 -> frame1
        hm_12, kps12 = cross_render_and_kps(pred1, trans2)  # pred1 -> frame2
        if attns is not None:
            a1, a2 = attns
            # (ref: :469-476) attention-weighted elementwise MSE
            out["loss_pose3d_ssv"] = (
                (F_.mse_loss(t2d1, hm_21, reduction="none") * a1).mean()
                + (F_.mse_loss(t2d2, hm_12, reduction="none") * a2).mean()
            )
            # (ref: :479-483) attention pulled to 1
            out["loss_attn_ssv"] = (
                mse(a1, torch.ones_like(a1)) + mse(a2, torch.ones_like(a2))
            ) * c.ATTN_WEIGHT
        else:
            out["loss_pose3d_ssv"] = mse(t2d1, hm_21) + mse(t2d2, hm_12)
        out["loss_pose3d_l1_ssv"] = (
            self._l1_matching(kps12, joints2, vis2, valid_counts)
            + self._l1_matching(kps21, joints1, vis1, valid_counts)
        ) * c.L1_WEIGHT
        return out, grid_centers
