"""Per-stage ResNet-50 backbone profile at bench shapes (r5 VERDICT task 5:
backbone ~8 ms/frame at ~43 TF/s ~= 22% of v5e bf16 peak; push to >=55 TF/s
or record a measured dead end).

Times each piece as its own jitted program at (B=8, 960x512) bf16 eval:
stem (conv1+bn+pool), layer1..layer4, the 3 deconvs, final conv — with
per-piece GFLOPs so the TF/s attribution is exact. Then probes variants of
the worst piece:

  * stem_s2d: space-to-depth(2) reformulation of the 7x7/s2 ci=3 stem conv
    (ci 3 -> 12, taps split by parity into a 4x4 conv) — the classic fix
    for contraction starvation on ci=3 (cf. cloud-TPU conv0 space-to-depth).
  * deconv k4s2 -> subpixel matmul (measured dead end at V2V shapes, but
    the head's 256->256 shapes are different).
"""
import json
import os
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/sp3d_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import jax.numpy as jnp
import numpy as np

B = int(os.environ.get("BATCH", "8"))
H, W = 512, 960
DT = jnp.bfloat16


def timeit(fn, *args, warmup=2, iters=40):
    """Time a jitted fn that returns a SCALAR. On the axon backend,
    block_until_ready on large outputs returns without waiting (measured:
    a 1.1 TF matmul 'finishes' in 30 us) — the only honest pattern is a
    scalar reduce inside the jit forced to host once after the loop
    (~120 TF/s on the same matmul, matching chip peak). The single sync
    costs ~30 ms of tunnel round-trip, so iters=40 keeps the per-iter
    overhead under ~1 ms (10-iter runs inflated each piece by ~3 ms)."""
    for _ in range(warmup):
        out = fn(*args)
    _ = float(np.asarray(out))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float(np.asarray(out))
    return (time.perf_counter() - t0) / iters * 1000


def scalarized(f):
    """Wrap an array-returning fn into a jitted scalar-checksum fn."""
    return jax.jit(
        lambda *a: sum(
            jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(f(*a))
        )
    )


def report(name, ms, gflop):
    print(json.dumps({name: {"ms": round(ms, 2),
                             "TFs": round(gflop / ms, 1) if gflop else None}}),
          flush=True)


def main():
    from flax.core import freeze

    from selfpose3d_tpu.models.pose_resnet import PoseResNet

    model = PoseResNet(num_layers=50, num_joints=15, dtype=DT)
    x = jax.random.uniform(jax.random.PRNGKey(0), (B, H, W, 3), DT)
    variables = model.init({"params": jax.random.PRNGKey(1)}, x[:1])
    params, stats = variables["params"], variables["batch_stats"]

    # ---- whole backbone
    def full(p, s, v):
        return model.apply({"params": p, "batch_stats": s}, v, train=False)

    ms_full = timeit(scalarized(full), params, stats, x)

    # FLOP accounting per piece (conv MACs*2)
    def conv_gf(h, w, k, ci, co, n=B):
        return 2 * n * h * w * k * k * ci * co / 1e9

    # ResNet-50 pieces at 960x512 input
    h4, w4 = H // 4, W // 4          # 128x240 (layer1, deconv out)
    h8, w8 = H // 8, W // 8          # 64x120
    h16, w16 = H // 16, W // 16      # 32x60
    h32, w32 = H // 32, W // 32      # 16x30

    def bottleneck_gf(h, w, planes, blocks, first_stride, cin):
        gf = 0.0
        inp = cin
        for b in range(blocks):
            s = first_stride if b == 0 else 1
            ho, wo = h // s, w // s
            gf += conv_gf(h, w, 1, inp, planes)            # conv1: pre-stride res
            gf += conv_gf(ho, wo, 3, planes, planes)       # conv2 carries stride
            gf += conv_gf(ho, wo, 1, planes, planes * 4)
            if b == 0:
                gf += conv_gf(ho, wo, 1, inp, planes * 4)  # downsample
            inp = planes * 4
            h, w = ho, wo
        return gf

    gf_stem = conv_gf(H // 2, W // 2, 7, 3, 64)
    gf_l1 = bottleneck_gf(h4, w4, 64, 3, 1, 64)
    gf_l2 = bottleneck_gf(h4, w4, 128, 4, 2, 256)
    gf_l3 = bottleneck_gf(h8, w8, 256, 6, 2, 512)
    gf_l4 = bottleneck_gf(h16, w16, 512, 3, 2, 1024)
    # ConvTranspose k4 s2: each OUTPUT pixel receives k^2/s^2 = 4 taps,
    # so true MACs are conv_gf(at output res, k=4)/4
    gf_d1 = conv_gf(h16, w16, 4, 2048, 256) / 4
    gf_d2 = conv_gf(h8, w8, 4, 256, 256) / 4
    gf_d3 = conv_gf(h4, w4, 4, 256, 256) / 4
    gf_fin = conv_gf(h4, w4, 1, 256, 15)
    gf_total = (gf_stem + gf_l1 + gf_l2 + gf_l3 + gf_l4
                + gf_d1 + gf_d2 + gf_d3 + gf_fin)
    report("full_backbone", ms_full, gf_total)

    # ---- pieces: rebuild each stage as a standalone module application by
    # slicing the param tree (names follow pose_resnet.py)
    from selfpose3d_tpu.models.norm import FastBatchNorm, conv_fence
    import flax.linen as nn

    def stem(p, s, v):
        y = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False,
                    dtype=DT, name="conv1").apply(
            {"params": p["conv1"]}, v.astype(DT))
        y = FastBatchNorm(use_running_average=True, dtype=DT).apply(
            {"params": p["bn1"], "batch_stats": s["bn1"]}, y)
        y = nn.relu(y)
        y = jnp.pad(y, ((0, 0), (1, 1), (1, 1), (0, 0)),
                    constant_values=-jnp.inf)
        return nn.max_pool(y, (3, 3), strides=(2, 2), padding="VALID")

    ms = timeit(scalarized(stem), params, stats, x)
    report("stem", ms, gf_stem)
    stem_out = jax.jit(stem)(params, stats, x)

    # stage runner: apply the blocks named layer{i}_{b} from the full tree
    from selfpose3d_tpu.models.pose_resnet import Bottleneck

    def run_stage(stage_idx, planes, blocks, stride, cin, inp_arr):
        def f(p, s, v):
            inp = cin
            for b in range(blocks):
                name = f"layer{stage_idx}_{b}"
                downsample = b == 0 and (stride != 1 or inp != planes * 4)
                v = Bottleneck(planes, stride=stride if b == 0 else 1,
                               downsample=downsample, dtype=DT).apply(
                    {"params": p[name],
                     "batch_stats": s[name]}, v, False)
                inp = planes * 4
            return v

        ms = timeit(scalarized(f), params, stats, inp_arr)
        return ms, jax.jit(f)(params, stats, inp_arr)

    ms1, out1 = run_stage(1, 64, 3, 1, 64, stem_out)
    report("layer1", ms1, gf_l1)
    ms2, out2 = run_stage(2, 128, 4, 2, 256, out1)
    report("layer2", ms2, gf_l2)
    ms3, out3 = run_stage(3, 256, 6, 2, 512, out2)
    report("layer3", ms3, gf_l3)
    ms4, out4 = run_stage(4, 512, 3, 2, 1024, out3)
    report("layer4", ms4, gf_l4)

    def deconvs(p, s, v):
        for i in range(3):
            v = nn.ConvTranspose(256, (4, 4), strides=(2, 2), padding="SAME",
                                 use_bias=False, dtype=DT,
                                 name=f"deconv{i}").apply(
                {"params": p[f"deconv{i}"]}, conv_fence(v))
            v = FastBatchNorm(use_running_average=True, dtype=DT).apply(
                {"params": p[f"deconv_bn{i}"],
                 "batch_stats": s[f"deconv_bn{i}"]}, v)
            v = nn.relu(v)
        return v

    ms_d = timeit(scalarized(deconvs), params, stats, out4)
    report("deconv_head", ms_d, gf_d1 + gf_d2 + gf_d3)
    feat = jax.jit(deconvs)(params, stats, out4)

    def final(p, v):
        return nn.Conv(15, (1, 1), dtype=jnp.float32,
                       name="final_layer").apply(
            {"params": p["final_layer"]}, v.astype(jnp.float32))

    ms_f = timeit(scalarized(final), params, feat)
    report("final_conv", ms_f, gf_fin)

    # ---- variant probes on the stem: space-to-depth ci 3 -> 12
    w7 = np.asarray(params["conv1"]["kernel"], np.float32)  # (7,7,3,64)

    def stem_s2d(v):
        # pad 3 left (the conv's own padding) and 5 right (1 tap slack +
        # evenness for the 2x2 space-to-depth reshape); the VALID 4-tap
        # conv then yields H/2+1 rows, sliced back to H/2
        vp = jnp.pad(v.astype(DT), ((0, 0), (3, 5), (3, 5), (0, 0)))
        # space-to-depth 2x2: (B, H/2+?, W/2, 12) with channel order
        # (dy, dx, c)
        Bv, Hp, Wp, C = vp.shape
        s2 = vp.reshape(Bv, Hp // 2, 2, Wp // 2, 2, C)
        s2 = jnp.transpose(s2, (0, 1, 3, 2, 4, 5)).reshape(
            Bv, Hp // 2, Wp // 2, 4 * C)
        # weights: tap (ky, kx) with parity (ky%2, kx%2) maps to s2d
        # channel block; kernel becomes 4x4 over the halved grid
        w2 = np.zeros((4, 4, 12, 64), np.float32)
        for ky in range(7):
            for kx in range(7):
                w2[ky // 2, kx // 2, (ky % 2) * 6 + (kx % 2) * 3:(ky % 2) * 6 + (kx % 2) * 3 + 3, :] += w7[ky, kx]
        y = jax.lax.conv_general_dilated(
            s2, jnp.asarray(w2, DT), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=DT,
        )
        return y[:, : H // 2, : W // 2]

    def stem_native(v):
        return jax.lax.conv_general_dilated(
            v.astype(DT), jnp.asarray(w7, DT), (2, 2), [(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=DT,
        )

    ref = np.asarray(jax.jit(stem_native)(x), np.float32)
    got = np.asarray(jax.jit(stem_s2d)(x), np.float32)
    err = float(np.abs(got - ref).max())
    print(json.dumps({"check_stem_s2d_err": err}), flush=True)

    ms_n = timeit(jax.jit(lambda v: jnp.sum(stem_native(v).astype(jnp.float32))), x)
    ms_s = timeit(jax.jit(lambda v: jnp.sum(stem_s2d(v).astype(jnp.float32))), x)
    report("stem_conv_native", ms_n, gf_stem)
    report("stem_conv_s2d", ms_s, gf_stem)


if __name__ == "__main__":
    main()
