"""selfpose3d_tpu — TPU-native multi-view multi-person 3D human pose estimation.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of SelfPose3d
(CVPR 2024, CAMMA-public/SelfPose3d): self-supervised multi-view multi-person
3D pose estimation in the VoxelPose family.

Layer map (bottom-up):
  geometry/   pure-jnp camera + affine math          (ref: lib/utils/cameras*.py, transforms.py)
  ops/        TPU kernel layer: unproject, sampling,
              gaussian render, proposal NMS,
              soft-argmax, Hungarian matching        (ref: lib/models/project_layer.py, lib/core/proposal.py)
  models/     Flax modules: PoseResNet, V2VNet,
              RootNet, PoseNet, SSV top model        (ref: lib/models/*)
  data/       host input pipeline + datasets         (ref: lib/dataset/*)
  train/      jitted train steps, optax, orbax       (ref: lib/core/function.py, tools/train_3d.py)
  parallel/   device mesh + sharding helpers         (ref: nn.DataParallel -> SPMD over ICI)
  eval/       AP/MPJPE/PCP metric protocol           (ref: lib/dataset/panoptic.py:293, shelf.py:172)
  cli/        train/evaluate/validate entry points   (ref: tools/*)
  convert/    torch .pth.tar -> flax params          (parity with released checkpoints)
"""

__version__ = "0.1.0"
