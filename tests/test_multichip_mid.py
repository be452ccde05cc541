"""Mid-shape multi-chip dryrun (r4 VERDICT task 6a): one bf16 SSV train
step (single-branch PoseNet — the bucket switch never compiles under
grad) plus one do_inference step where the candidate-bucket switch IS
taken, both on an 8-virtual-device mesh.

Gated behind SP3D_SLOW=1: the child process jit-compiles a ResNet-18
5-camera 3-branch train graph on host CPUs (~tens of minutes on a 1-core
container). The driver's MULTICHIP check runs the tiny f32 dryrun; this
covers the bf16 + bucket-switch configuration it cannot.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.mark.skipif(
    os.environ.get("SP3D_SLOW", "") != "1",
    reason="mid-shape 8-device dryrun compiles ~tens of minutes; set SP3D_SLOW=1",
)
def test_dryrun_multichip_mid():
    import __graft_entry__ as g

    # runs in a child process with the right XLA flags; raises on failure
    g.dryrun_multichip_mid(8)
