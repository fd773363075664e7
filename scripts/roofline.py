"""Roofline accounting for the MiT-B3 EVP serving graph (VERDICT r2 item 1:
"beat the extraction floor — or rigorously prove it").

Produces a reproducible, per-stage MXU/VPU/HBM occupancy table:

  1. calibrates the env's fixed per-dispatch overhead (the axon relay costs
     ~27 ms per jit call regardless of work — scripts/probe_call_overhead.py)
     and CANCELS it with two-point chained timing:
         t_per_iter = (total(hi_iters) - total(lo_iters)) / (hi - lo);
  2. measures this chip's ceilings: MXU bf16 TFLOPs (4096³ chained matmul →
     ~190, near v5e peak), HBM stream GB/s (1 GB XLA add), VPU f32 ops/s
     (VMEM-resident pallas fma chain), and the pallas block-DMA rate at each
     stage's actual block shape;
  3. counts, per stage, the analytic MXU FLOPs / VPU ops / HBM bytes of one
     serving forward ON THE ROUTED PATH (per-block kernels for stages 1-3,
     whole-stage fused kernel for stage 4; in-kernel LN1; weights DMA'd once
     per pallas_call for constant-index blocks, streamed per grid step for
     the fused stage);
  4. measures the real per-stage and whole-forward times (overhead-
     cancelled) and emits floor = max(component/ceiling), gap, and the
     implied whole-graph fps ceiling.

A floor ABOVE a measured time means a probe or count is broken — the script
warns loudly instead of publishing it (that failure mode shipped once).

Run on the real chip: `python scripts/roofline.py --md`.
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from surgical_tpu.core.config import BackboneConfig, HeadConfig
from surgical_tpu.kernels.mit_block import block_weights_from_params, fused_mit_block
from surgical_tpu.models.mit_evp import MiTEVP
from surgical_tpu.models.mit_fused import _FUSE_STAGES, fused_forward

B = int(os.environ.get("ROOF_B", "128"))
ROUNDS = 4
LO, HI = 8, 40  # two-point iteration counts


from scripts._timing import chain_time as _chain_time, total_chained


def _total(fn, x0, iters, rounds=ROUNDS):
    return total_chained(fn, x0, iters, rounds)


def chain_time(fn, x0, lo=LO, hi=HI):
    """Overhead-cancelled s/iter — scripts/_timing.py (raises on a noise-
    negative slope rather than publishing nonsense ceilings)."""
    return _chain_time(fn, x0, lo, hi, ROUNDS)


# ---------------------------------------------------------------- ceilings


def measure_overhead():
    x = jax.device_put(np.ones((8, 128), np.float32))

    def tiny(x):
        return x * 1.000001

    t_lo, t_hi = _total(tiny, x, LO), _total(tiny, x, HI)
    slope = (t_hi - t_lo) / (HI - LO)
    return (t_lo - slope * LO) * 1e3  # ms


def measure_mxu_tflops():
    n = 4096
    rng = np.random.default_rng(0)
    x = jax.device_put((rng.standard_normal((n, n)) * 0.01).astype(np.float32)).astype(jnp.bfloat16)
    w = jax.device_put((rng.standard_normal((n, n)) * 0.01).astype(np.float32)).astype(jnp.bfloat16)

    def mm(x):
        return jnp.dot(x, w, preferred_element_type=jnp.bfloat16)

    return 2 * n * n * n / chain_time(mm, x) / 1e12


def _vpu_probe(body, ops_per_elt_step, nchains):
    """VMEM-resident elementwise chains over a pallas grid; returns T-ops/s.
    `body(xs) -> xs` maps `nchains` independent working arrays through K
    steps (independent chains expose issue-width; a serial chain charges
    pipeline latency to the rate)."""
    K, reps, C, G = 64, 64, 128, 512
    M = 8 * reps

    def kernel(x_ref, y_ref):
        sub = M // nchains
        xs = [x_ref[0, i * sub:(i + 1) * sub, :] for i in range(nchains)]
        xs = body(xs)
        y_ref[0] = jnp.concatenate(xs, axis=0) if nchains > 1 else xs[0]

    f = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[pl.BlockSpec((1, M, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, M, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, M, C), jnp.float32),
    )
    x = jax.device_put(np.random.default_rng(2).standard_normal((G, M, C)).astype(np.float32))
    t = chain_time(f, x)
    return ops_per_elt_step * K * x.size / t / 1e12


def measure_vpu_band():
    """[lo, hi] T-ops/s band for the VPU ceiling (VERDICT r3 item 2 — one
    lower-bound probe flattered every floor). lo = the round-3 serial fma
    chain (3 ops/elt-step, latency-bound); hi = best of independent-chain
    mixes (ILP hides fma latency; 2 ops/fma). Architecture cross-check:
    v5e VPU = 4 x (8 sublane x 128 lane) f32 ALUs at ~0.94 GHz ~ 3.85 T
    issue-slots/s — the hi probe should land under it."""
    K = 64
    # python floats: jnp scalars would be captured consts in the kernel
    a = 1.000001
    b = 1e-7

    def serial_fma(xs):
        (x,) = xs
        acc = jnp.zeros_like(x)
        for _ in range(K):
            x = x * a + b
            acc = acc + x
        return [acc]

    def par_fma(xs):
        for _ in range(K):
            xs = [x * a + b for x in xs]
        return xs

    lo = _vpu_probe(serial_fma, 3, 1)
    hi = max(_vpu_probe(par_fma, 2, 4), _vpu_probe(par_fma, 2, 8))
    return min(lo, hi), max(lo, hi)


def measure_hbm_gbps():
    n = 16384  # 1 GB f32
    x = jax.device_put(np.random.default_rng(1).standard_normal((n, n)).astype(np.float32))

    def f(x):
        return x + 1.0

    return 2 * x.nbytes / chain_time(f, x) / 1e9


def measure_block_dma_gbps(N, C, bt):
    """Pallas pass-through at a stage's block shape — the rate the block
    kernels actually see for activation traffic. The grid is replicated so
    the array is >= ~192 MB: at the natural G = B/bt the whole transfer is
    a few ms and the two-point slope is noise-dominated (a first cut of this
    probe read 4.7 TB/s at stage 2 — above HBM peak)."""
    G = B // bt
    blk_bytes = bt * N * C * 2
    R = max(1, int(np.ceil(192e6 / (G * blk_bytes))))
    G *= R

    def kernel(x_ref, y_ref):
        y_ref[...] = x_ref[...] + jnp.ones((), x_ref.dtype)

    f = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[pl.BlockSpec((1, bt * N, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, bt * N, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, bt * N, C), jnp.bfloat16),
    )
    x = jax.device_put(np.ones((G, bt * N, C), np.float32)).astype(jnp.bfloat16)
    return 2 * x.nbytes / chain_time(f, x) / 1e9


# ---------------------------------------------------------- analytic counts


def stage_counts(cfg, si):
    """Per-FORWARD (all B images, all depth blocks) MXU FLOPs, VPU ops and
    HBM bytes of stage si on the ROUTED serving path (mit_fused.fused_forward):
    stages 1-3 per-block fused kernels + XLA-side LN1/SR/kv/prompt; stage 4
    whole-stage fused kernel (weights streamed per grid step)."""
    C = cfg.embed_dims[si]
    H = W_ = 56 >> si
    N = H * W_
    sr = cfg.sr_ratios[si]
    Nkv = (H // sr) * (W_ // sr)
    hid = C * cfg.mlp_ratios[si]
    heads = cfg.num_heads[si]
    depth = cfg.depths[si]
    C4 = C // cfg.prompt_scale_factor
    bt = {0: 1, 1: 2, 2: 4, 3: 8}[si]
    tuned = f"{si + 1}" in cfg.tuning_stage
    fused_stage = (si + 1) in _FUSE_STAGES

    # ---- MXU FLOPs per image per block
    mxu = (
        2 * N * C * C                    # q proj
        + 2 * N * C * C                  # out proj
        + 2 * Nkv * C * 2 * C            # kv proj
        + (2 * Nkv * (sr * sr * C) * C if sr > 1 else 0)  # SR conv (im2col)
        + 4 * N * Nkv * C                # scores + context (summed over heads)
        + 2 * N * C * hid * 2            # fc1 + fc2
        + (2 * N * C4 * C4 + 2 * N * C4 * C if tuned else 0)  # prompt MLPs
    )

    # ---- VPU f32-op estimates per image per block (from the kernel code:
    # dwconv = 9 taps x (shift-select+mul+add) ~ 3/tap; tanh-GELU ~ 15;
    # LN ~ 8/elt (mean/var/normalize); softmax ~ 8/score; residuals ~ 6/elt)
    vpu = (
        9 * 3 * N * hid                  # dwconv masked shifts
        + 15 * N * hid                   # GELU on hidden
        + 8 * N * C * (2 if fused_stage else 3)  # LN1(+XLA copy if per-block path) + LN2
        + 8 * heads * N * Nkv            # softmax
        + 6 * N * C                      # residuals + prompt add
        + (15 * N * C4 if tuned else 0)  # prompt GELU
    )

    # ---- HBM bytes per image per block (bf16 = 2 B/elt)
    act = N * C * 2
    feat_act = N * C4 * 2
    from surgical_tpu.models.mit_fused import _FOLD_STAGES
    folded = (si + 1) in _FOLD_STAGES
    if fused_stage:
        # whole-stage kernel: x in + out once PER STAGE (charged per block as
        # 2act/depth), base once; weights streamed per grid step per block
        hbm_per_img_blk = 2 * act / depth + (N * C4 * 2 / depth if tuned else 0)
    elif folded:
        # round-4 folded routing (mit_fused._FOLD_STAGES): the kernel reads
        # x + the next block's C4 prompt feat (finishing the shared_mlp
        # in-kernel) and writes y + LN(y) for the next kv path; XLA keeps
        # only the SR conv + kv projection per block, and the lightweight
        # MLPs run ONCE per stage (batched) writing depth C4 features
        hbm_per_img_blk = (
            2 * act                          # kernel: x in, y out
            + act                            # kernel: LN(y) out (next kv path)
            + (2 * feat_act if tuned else 0)  # C4 feat write (XLA) + read (kernel)
            + (act if sr > 1 else 0)         # SR conv reads the emitted LN
            + 2 * Nkv * C * 2                # k, v into kernel
        )
    else:
        # default routing (kernel fold measured a loss at every stage):
        # XLA prompt add + LN1 per block; the batched stage-entry
        # precompute (_BATCH_PROMPT_STAGES) moves the feat write earlier
        # but the per-block bytes are the same
        hbm_per_img_blk = (
            2 * act                      # kernel: x in, out
            + 2 * act                    # XLA LN1: read x, write xln (kv path)
            + (act if sr > 1 else 0)     # SR conv reads xln
            + 2 * Nkv * C * 2            # k, v into kernel
            + (2 * act + 2 * feat_act if tuned else 0)  # prompt RMW x + feat
        )

    # weight bytes: constant-index blocks are DMA'd once per pallas_call
    # (per-block path); the fused stage streams each block's weights on every
    # grid step (G = B/bt)
    wbytes_blk = (
        (C * C) * 2 + C * 2 * C + 2 * C * hid + 9 * hid
        + (sr * sr * C * C if sr > 1 else 0)
        + ((C4 * C4 + C4 * C) if tuned else 0)
    ) * 2
    w_reads = (B // bt) * depth if fused_stage else depth

    return {
        "mxu_flops": mxu * B * depth,
        "vpu_ops": vpu * B * depth,
        "hbm_bytes": hbm_per_img_blk * B * depth + wbytes_blk * w_reads,
        "N": N, "C": C, "depth": depth, "bt": bt, "Nkv": Nkv, "hidden": hid,
        "heads": heads, "fused_stage": fused_stage,
    }


# ----------------------------------------------------------------- measure


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--md", action="store_true", help="write docs/roofline.md")
    args = ap.parse_args()

    cfg = BackboneConfig.preset("b3")
    head = HeadConfig()
    model = MiTEVP(cfg, head, compute_dtype=jnp.bfloat16)
    z = jnp.zeros((1, 224, 224, 3), jnp.float32)
    variables = model.init(jax.random.key(0), z, z, jnp.zeros((1, 224, 224, 2)))
    params = jax.tree.map(lambda a: jnp.asarray(a, jnp.bfloat16), variables["params"])

    report = {"B": B, "device": str(jax.devices()[0])}

    print("== dispatch overhead ==", flush=True)
    report["call_overhead_ms"] = round(measure_overhead(), 1)
    print("fixed per-call:", report["call_overhead_ms"], "ms (cancelled below)", flush=True)

    print("== machine ceilings (overhead-cancelled) ==", flush=True)
    report["mxu_tflops"] = round(measure_mxu_tflops(), 1)
    print("MXU bf16:", report["mxu_tflops"], "TFLOPs", flush=True)
    vpu_lo, vpu_hi = measure_vpu_band()
    report["vpu_tops_band"] = [round(vpu_lo, 2), round(vpu_hi, 2)]
    print("VPU f32 band:", report["vpu_tops_band"], "T-ops/s", flush=True)
    report["hbm_gbps"] = round(measure_hbm_gbps(), 1)
    print("HBM stream:", report["hbm_gbps"], "GB/s", flush=True)
    # ceilings above hardware peak mean a broken probe (v5e: 197 TFLOPs
    # bf16, 819 GB/s HBM, ~3.85 T VPU issue-slots/s) — refuse to build
    # floors on them
    if report["mxu_tflops"] > 230 or report["hbm_gbps"] > 900 \
            or vpu_hi > 8:
        raise RuntimeError(f"ceiling probe above hardware peak: {report}")

    rng = np.random.default_rng(0)
    stages = []
    total_floor_lo = total_floor_hi = 0.0
    total_mxu_flops = 0.0
    total_meas = 0.0
    warnings = []
    for si in range(4):
        stage = si + 1
        cts = stage_counts(cfg, si)
        N, C, bt, depth = cts["N"], cts["C"], cts["bt"], cts["depth"]
        H = W_ = 56 >> si
        heads = cfg.num_heads[si]
        Nkv = cts["Nkv"]

        dma = measure_block_dma_gbps(N, C, bt)

        # measured per-stage block-loop time (fixed k/v; the XLA extras are
        # inside the whole-forward remainder)
        x = jax.device_put((rng.standard_normal((B, N, C)) * 0.1).astype(jnp.bfloat16))
        kv = jax.device_put((rng.standard_normal((B, Nkv, C)) * 0.1).astype(jnp.bfloat16))
        bw = jax.tree.map(lambda a: jnp.asarray(a, jnp.bfloat16),
                          block_weights_from_params(params[f"block{stage}_0"]))

        # mirror the ROUTED kernels (mit_fused._FOLD_STAGES — empty by
        # default since the fold measured a loss; when set, the next
        # prompt's C4 feat + shared_mlp fold into the residual write and
        # LN(y) is emitted) and the hb variant where fused_forward routes
        # to it
        from surgical_tpu.kernels.mit_block import fused_mit_block_hb
        from surgical_tpu.models.mit_fused import _FOLD_STAGES
        C4 = C // cfg.prompt_scale_factor
        ln_next = {"scale": jnp.ones((C,), jnp.float32),
                   "bias": jnp.zeros((C,), jnp.float32)}
        shared = {"kernel": jnp.zeros((C4, C), jnp.bfloat16),
                  "bias": jnp.zeros((C,), jnp.float32)}
        pn = jax.device_put(jnp.zeros((B, N, C4), jnp.bfloat16))
        use_hb = heads == 2 and bt * C * heads * Nkv * 4 <= (3 << 19)

        fold = stage in _FOLD_STAGES

        def block_fn(x, kv=kv, bw=bw, heads=heads, H=H, W_=W_, bt=bt,
                     depth=depth, use_hb=use_hb, fold=fold):
            fn = fused_mit_block_hb if use_hb else fused_mit_block
            for _ in range(depth):
                if fold:
                    x, _xln = fn(x, None, kv, kv, bw, heads=heads, H=H,
                                 W=W_, bt=bt, pnext_feat=pn,
                                 prompt_shared=shared, ln_next=ln_next)
                else:
                    x = fn(x, None, kv, kv, bw, heads=heads, H=H, W=W_, bt=bt)
                x = x * jnp.asarray(0.6, x.dtype)  # keep magnitudes bounded
            return x

        t_meas = chain_time(block_fn, x)

        mxu_ms = cts["mxu_flops"] / (report["mxu_tflops"] * 1e12) * 1e3
        # VPU floor band: [at the hi (ILP) rate, at the lo (serial) rate] —
        # the hi edge is the true lower bound, the lo edge the conservative
        vpu_ms_opt = cts["vpu_ops"] / (vpu_hi * 1e12) * 1e3
        vpu_ms_con = cts["vpu_ops"] / (vpu_lo * 1e12) * 1e3
        hbm_ms = cts["hbm_bytes"] / (report["hbm_gbps"] * 1e9) * 1e3
        hbm_blk_ms = cts["hbm_bytes"] / (dma * 1e9) * 1e3
        floor_lo = max(mxu_ms, vpu_ms_opt, hbm_ms)
        floor_hi = max(mxu_ms, vpu_ms_con, hbm_ms)
        bound = {mxu_ms: "MXU", vpu_ms_con: "VPU", hbm_ms: "HBM"}[floor_hi]
        meas_ms = t_meas * 1e3
        if floor_lo > meas_ms * 1.05:
            warnings.append(
                f"s{stage}: floor {floor_lo:.2f} ms EXCEEDS measured {meas_ms:.2f} ms"
                " — a probe or count is broken; do not publish")
        row = {
            "stage": stage, "N": N, "C": C, "depth": depth, "bt": bt,
            "heads": heads, "fused_stage": cts["fused_stage"],
            "block_dma_gbps": round(dma, 1),
            "mxu_ms": round(mxu_ms, 2),
            "vpu_ms_band": [round(vpu_ms_opt, 2), round(vpu_ms_con, 2)],
            "hbm_ms": round(hbm_ms, 2),
            "hbm_at_block_rate_ms": round(hbm_blk_ms, 2),
            "floor_ms_band": [round(floor_lo, 2), round(floor_hi, 2)],
            "bound": bound,
            "measured_ms": round(meas_ms, 2),
            "gap_band": [round(meas_ms / floor_hi, 2),
                         round(meas_ms / floor_lo, 2)],
        }
        stages.append(row)
        total_floor_lo += floor_lo
        total_floor_hi += floor_hi
        total_mxu_flops += cts["mxu_flops"]
        total_meas += meas_ms
        print(f"s{stage}", row, flush=True)

    # whole forward (the serving graph) for the non-stage remainder
    img = jax.device_put(rng.integers(0, 255, (B, 224, 224, 3), np.uint8))
    seg = jax.device_put(rng.integers(0, 255, (B, 224, 224, 1), np.uint8))
    flw = jax.device_put(rng.standard_normal((B, 224, 224, 2)).astype(np.float16))

    # params and inputs must be ARGUMENTS: closing over them would embed
    # ~200 MB of constants in the serialized program (remote compiler 413s)
    @functools.partial(jax.jit, static_argnames=("iters",))
    def full_chain(variables, img_u8, seg_u8, flow_f16, iters):
        def step(carry, i):
            im = (img_u8 ^ (i & 1).astype(jnp.uint8)).astype(jnp.bfloat16) / 255.0
            sg = jnp.broadcast_to(seg_u8.astype(jnp.bfloat16) / 255.0, im.shape)
            f = fused_forward(variables["params"], variables["batch_stats"],
                              im, sg, flow_f16.astype(jnp.bfloat16), cfg, head,
                              return_features=True, bt=32)
            return carry + jnp.sum(f.astype(jnp.float32)), None

        tot, _ = jax.lax.scan(step, 0.0, jnp.arange(iters))
        return tot

    def total_full(iters):
        _ = np.asarray(full_chain(variables, img, seg, flw, iters=iters))
        best = float("inf")
        for _ in range(ROUNDS):
            t0 = time.perf_counter()
            _ = np.asarray(full_chain(variables, img, seg, flw, iters=iters))
            best = min(best, time.perf_counter() - t0)
        return best

    lo, hi = 4, 16
    full_ms = (total_full(hi) - total_full(lo)) / (hi - lo) * 1e3

    nonstage_ms = full_ms - total_meas
    report["stages"] = stages
    report["stage_floor_ms_band"] = [round(total_floor_lo, 2),
                                     round(total_floor_hi, 2)]
    report["stage_measured_ms"] = round(total_meas, 2)
    report["full_forward_ms"] = round(full_ms, 2)
    report["nonstage_ms"] = round(nonstage_ms, 2)
    report["measured_fps"] = round(B / (full_ms / 1e3), 1)
    # ceiling BAND: stages at their floor band + non-stage as measured
    # (the non-stage remainder is held at today's implementation — the
    # band prices kernel headroom, not a rewrite of embeds/flow/head)
    ns = max(nonstage_ms, 0.0)
    report["ceiling_fps_band"] = [
        round(B / ((total_floor_hi + ns) / 1e3), 1),
        round(B / ((total_floor_lo + ns) / 1e3), 1),
    ]
    report["ceiling_vs_baseline_band"] = [
        round(f / 990.0, 2) for f in report["ceiling_fps_band"]]
    # MFU: matmul FLOPs per frame on the routed path (stage matmuls; the
    # non-stage patch-embed convs/head add <1 GF) against the v5e 197-TFLOP
    # bf16 peak at the measured rate
    gf_frame = total_mxu_flops / B / 1e9
    report["matmul_gflops_per_frame"] = round(gf_frame, 2)
    report["mfu_pct"] = round(
        gf_frame * 1e9 * report["measured_fps"] / 197e12 * 100, 1)
    report["warnings"] = warnings

    print(json.dumps(report))
    for w in warnings:
        print("WARNING:", w, file=sys.stderr)

    if args.md:
        if warnings:
            print("refusing to write docs/roofline.md with broken floors",
                  file=sys.stderr)
            sys.exit(1)
        write_md(report, cfg)


def write_md(r, cfg):
    rows = "\n".join(
        "| s{stage}{f} ({depth}×[{B},{N},{C}] h={h} bt={bt}) | {mxu} | {vl}-{vh} | {hbm} | "
        "{fl}-{fh} ({bound}) | {meas} | {gl}-{gh}× |".format(
            stage=s["stage"], f="*" if s["fused_stage"] else "",
            depth=s["depth"], B=r["B"], N=s["N"], C=s["C"], h=s["heads"],
            bt=s["bt"], mxu=s["mxu_ms"],
            vl=s["vpu_ms_band"][0], vh=s["vpu_ms_band"][1], hbm=s["hbm_ms"],
            fl=s["floor_ms_band"][0], fh=s["floor_ms_band"][1],
            bound=s["bound"], meas=s["measured_ms"],
            gl=s["gap_band"][0], gh=s["gap_band"][1])
        for s in r["stages"]
    )
    dma_rows = "\n".join(
        f"| s{s['stage']} block [{s['bt']}·{s['N']}, {s['C']}] bf16 | "
        f"{s['block_dma_gbps']} | {s['hbm_at_block_rate_ms']} |"
        for s in r["stages"])
    gaps = sorted(r["stages"],
                  key=lambda s: s["floor_ms_band"][0] - s["measured_ms"])
    gap_lines = "\n".join(
        "- s%d: %.2f-%.2f ms above its %.2f-%.2f ms floor band (%s-bound)"
        % (s["stage"], s["measured_ms"] - s["floor_ms_band"][1],
           s["measured_ms"] - s["floor_ms_band"][0],
           s["floor_ms_band"][0], s["floor_ms_band"][1], s["bound"])
        for s in gaps)
    md = f"""# Serving-graph roofline (MiT-B3 EVP extraction, B={r['B']})

Generated by `python scripts/roofline.py --md` on `{r['device']}`.

Methodology — the env's relay adds a FIXED **{r['call_overhead_ms']} ms**
per jit dispatch (calibrated by `scripts/probe_call_overhead.py`: constant
across 4-128 chained iterations, per-scan-step cost ~1 µs). Every number
below cancels it by two-point chained timing — the slope between {LO}- and
{HI}-iteration `lax.scan` chains of the same fn, best-of-{ROUNDS} rounds
against shared-chip noise. Analytic op/byte counts follow the ROUTED
serving path (`mit_fused.fused_forward`: per-block kernels s1-s3, whole-
stage fused kernel s4, in-kernel LN1; formulas in
`scripts/roofline.py::stage_counts`). Ceilings are measured on THIS chip,
same session. The script refuses to publish if any floor exceeds its
measured time (floor > measured means the accounting is broken).

## Machine ceilings (measured, overhead-cancelled)

| resource | measured | probe |
|---|---|---|
| MXU bf16 | **{r['mxu_tflops']} TFLOPs** | chained 4096³ matmul (v5e peak ≈ 197) |
| VPU f32 | **{r['vpu_tops_band'][0]}-{r['vpu_tops_band'][1]} T-ops/s band** | lo = serial fma chain (latency-bound, 3 ops/elt-step); hi = best independent-chain ILP mix (arch cross-check: 4×(8×128) ALUs @ ~0.94 GHz ≈ 3.85 T issue-slots/s) |
| HBM stream | **{r['hbm_gbps']} GB/s** | XLA add over 1 GB (v5e peak ≈ 819) |

Pallas block-DMA rate at each stage's block shape — what the kernels
actually see for activation traffic; lane-narrow blocks stream well below
the big-array rate, so each stage's HBM time is bracketed by
[stream-rate, block-rate]:

| block shape | GB/s | stage HBM ms at this rate |
|---|---|---|
{dma_rows}

## Per-stage floors vs measured (ms per forward, B={r['B']})

floor band = max(MXU, VPU-band, HBM-at-stream-rate) — the LOW edge (VPU at
its ILP-probe rate) is the true lower bound; the HIGH edge prices VPU work
at the serial-chain rate. measured = the real per-stage block loop on the
ROUTED kernels (round-4 routing: in-kernel LN1, fold OFF — it measured a
loss at every stage, kernel_notes), overhead-cancelled.
`*` = whole-stage fused kernel routing.

| stage | MXU ms | VPU ms band | HBM ms | floor band (bound) | measured | gap band |
|---|---|---|---|---|---|---|
{rows}

- stage floor-band sum: **{r['stage_floor_ms_band'][0]}-{r['stage_floor_ms_band'][1]} ms**; measured: **{r['stage_measured_ms']} ms**
- whole forward measured: **{r['full_forward_ms']} ms** → **{r['measured_fps']} fps/chip**
- non-stage remainder: **{r['nonstage_ms']} ms** — patch embeds, the
  prompt path (batched precompute at s1, per-block MLPs at s2/s3 — the
  measured optimum), flow fusion, head, plus the per-block XLA-side
  add/LN1/SR/kv chain the stage loops exclude.
- MFU: **{r['matmul_gflops_per_frame']} matmul GFLOPs/frame → {r['mfu_pct']}%
  of the 197-TFLOP bf16 peak** at the measured rate. Low in absolute terms
  and architecture-intrinsic: the binding resource at every stage is the
  VPU (dwconv+GELU Mix-FFN at C=64-320), not the MXU.

## Implied ceiling (band)

Stages at their floor band + non-stage as measured:
**{r['ceiling_fps_band'][0]}-{r['ceiling_fps_band'][1]} fps/chip =
{r['ceiling_vs_baseline_band'][0]}-{r['ceiling_vs_baseline_band'][1]}× the
990-fps GPU baseline.** The low edge prices VPU work at the serial-probe
rate (conservative); the high edge at the ILP-probe rate — a true
scheduling-unreachable bound that also holds the {r['nonstage_ms']} ms
non-stage remainder at today's implementation.

Neither edge is reachable by scheduling alone — the band prices every
matmul at full-MXU rate and every byte at the big-array stream rate. The
measured structural penalties that sit between the measured times and
these floors:

1. **Lane occupancy at C=64/128** (s1, s2): the VPU and MXU operate on
   128-wide lanes; C=64 stages run them at ~half effective rate. The
   2-image lane-packing kernel that repairs this is correct but sits at the
   16 MB VMEM edge (docs/kernel_notes.md, packed2 postmortem) — measured
   +3-5% when it fits, flaky OOM across compiles.
2. **Block-DMA vs stream rate**: lane-narrow activation blocks stream at
   the rates in the table above (measured pass-through, same shapes) — the
   per-stage HBM bracket at block rate is 2-8× the stream-rate floor.
3. **Per-image/per-head attention dots** (s3: h=5) at N·Nkv tiles too
   small to fill the MXU; the head-batched variant wins only at h=2
   (measured, kernel_notes).
4. **Whole-stage fusion** trades streamed weights for resident activations;
   measured: wins at s4 (+0.9 ms e2e), loses at s3 (streamed 2.9 MB/block ×
   G=32 > activation savings at depth 18) — `(4,)` routing is the optimum.

## Where the remaining headroom is

Ranked by measured − floor:
{gap_lines}

With every structural penalty above already attacked and measured
(packed2, head-batching, stage fusion, tile sweeps, the round-4 prompt/LN
fold — kernel_notes), the demonstrated single-chip rate is
**{r['measured_fps']} fps ≈ {round(r['measured_fps']/990, 2)}× the GPU
baseline**. Reaching even the band's low edge
({r['ceiling_fps_band'][0]} fps) needs every stage simultaneously at its
VPU floor with zero DMA penalty; the high edge additionally requires the
serial-latency share of the VPU work to vanish. Beyond the band means a
different model (C≥128 everywhere, erf-free activations, int8) — which
breaks reference parity (measured: docs/kernel_notes.md int8 section).
The ≥5× north star (~5,000 fps) sits above the band's HIGH edge, so it is
a **multi-chip** target: extraction is embarrassingly data-parallel and
`cli extract-features` shards the batch axis over `jax.sharding.Mesh`
(see README's multi-chip throughput model).
"""
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "docs", "roofline.md")
    with open(path, "w") as f:
        f.write(md)
    print("wrote", path)


if __name__ == "__main__":
    main()
