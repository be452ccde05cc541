"""Run the SSV convergence proof and write the loss-curve artifact.

Usage:
    python scripts/train_convergence.py [epochs] [out.json]

Env knobs:
    SP3D_CONV_PLATFORM=tpu    run the steps on the chip (default cpu)
    SP3D_CONV_EVAL_EVERY=N    validate every N epochs -> eval_curve
    SP3D_CONV_FRAMES=N        synthetic frames per epoch (default 64)
    SP3D_CONV_CFG=path        config override

Trains configs/synthetic/tiny_ssv.yaml from random init through the real
train loop, then prints the head->tail drop of every loss term and
the before/after root-localization metrics (see
selfpose3d_tpu/train/convergence.py). A .partial artifact is flushed
after every epoch so a dead TPU tunnel cannot lose a long run.
"""

import logging
import os
import sys

logging.basicConfig(level=logging.INFO)

from selfpose3d_tpu.train.convergence import head_tail_means, run_convergence


def main():
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    out = sys.argv[2] if len(sys.argv) > 2 else "convergence_curves.json"
    res = run_convergence(
        cfg_path=os.environ.get(
            "SP3D_CONV_CFG", "configs/synthetic/tiny_ssv.yaml"
        ),
        epochs=epochs,
        out_path=out,
        num_frames=int(os.environ.get("SP3D_CONV_FRAMES", "64")),
        platform=os.environ.get("SP3D_CONV_PLATFORM", "cpu"),
        eval_every=int(os.environ.get("SP3D_CONV_EVAL_EVERY", "0")),
    )
    print(f"\n== convergence over {res['steps']} steps "
          f"({res['seconds']:.0f}s) ==")
    for key, series in sorted(res["series"].items()):
        h, t = head_tail_means(series)
        print(f"{key:28s} first10 {h:12.6f} -> last10 {t:12.6f} "
              f"({'down' if t < h else 'UP'} {t / max(h, 1e-12):.3f}x)")
    for tag in ("eval_init", "eval_final"):
        m = res[tag]
        print(f"{tag}: recall500_root={m.get('recall500_root', float('nan')):.4f} "
              f"mpjpe_root={m.get('mpjpe_root', float('nan')):.1f} "
              f"recall500={m.get('recall500', float('nan')):.4f} "
              f"mpjpe={m.get('mpjpe', float('nan')):.1f}")
    for m in res.get("eval_curve", []):
        print(f"  epoch {m['epoch']:3d}: "
              f"recall500_root={m.get('recall500_root', float('nan')):.4f} "
              f"mpjpe_root={m.get('mpjpe_root', float('nan')):.1f}")


if __name__ == "__main__":
    main()
