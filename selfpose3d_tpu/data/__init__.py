from selfpose3d_tpu.data.structures import AugBranch

__all__ = ["AugBranch"]
