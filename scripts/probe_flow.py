"""RAFT flow-precompute on-chip roofline (VERDICT r4 item 3).

The reference precomputes optical flow with the CUDA RAFT at 20 GRU
iterations per 1-fps frame pair (/root/reference/RAFT.py:85); the north
star names "RAFT correlation-volume + GRU optical-flow ... ports as a
Pallas cost-volume kernel" (BASELINE.json). This probe decides that with
numbers: two-point overhead-cancelled (scripts/_timing.py) phase times for

  full       the whole RAFT forward (encoders -> corr pyramid -> 20x
             (lookup + GRU update) -> convex upsample)
  encoders   fnet(img1) + fnet(img2) + cnet(img1)
  corr       all-pairs correlation (one MXU matmul) + 4-level avg pyramid
  lookup     ONE lookup_pyramid step (the 4-level bilinear gather --
             computed-index gathers are the known ~0.45 GB/s TPU hazard)
  update     ONE UpdateBlock step (motion encoder + SepConvGRU + heads)

full ~ encoders + corr + 20*(lookup + update) + upsample closes the
accounting. Resolution: 256x256 (the pipeline-equivalent working size --
the dataset consumes flow at 250x250, data_process.py:406-436; RAFT pads
to /8). Results -> docs/kernel_notes.md flow section + bench.py flow row.

Run on the real chip: `python scripts/probe_flow.py`.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np

from _timing import chain_time

H = W = int(os.environ.get("BENCH_FLOW_RES", "256"))
ITERS = 20
LO, HI = int(os.environ.get("BENCH_LO", "2")), int(os.environ.get("BENCH_HI", "6"))


def main():
    from surgical_tpu.models.raft import (
        RAFT, Encoder, UpdateBlock, all_pairs_correlation, corr_pyramid,
        lookup_pyramid,
    )

    model = RAFT(iters=ITERS)
    rng = np.random.default_rng(0)
    im1 = jnp.asarray(rng.uniform(-1, 1, (H, W, 3)), jnp.float32)
    im2 = jnp.asarray(rng.uniform(-1, 1, (H, W, 3)), jnp.float32)
    params = model.init(jax.random.key(0), im1, im2)["params"]

    report = {"H": H, "W": W, "iters": ITERS,
              "device": str(jax.devices()[0])}

    # ---- full forward (carry = img1 perturbed by the flow it produced) ----
    def full_step(c):
        flow = model.apply({"params": params}, c, im2)
        return c + 1e-6 * jnp.mean(flow).astype(c.dtype)

    t = chain_time(full_step, im1, LO, HI)
    report["full"] = {"ms_per_pair": round(t * 1e3, 2),
                      "pairs_per_s": round(1.0 / t, 2)}
    print("full", report["full"], flush=True)

    # ---- encoders ----
    fnet = Encoder(256, norm="instance")
    cnet = Encoder(256, norm="batch")

    def enc_step(c):
        f1 = fnet.apply({"params": params["fnet"]}, c[None])[0]
        f2 = fnet.apply({"params": params["fnet"]}, im2[None])[0]
        ctx = cnet.apply({"params": params["cnet"]}, c[None])[0]
        return c + 1e-6 * (jnp.mean(f1) + jnp.mean(f2) + jnp.mean(ctx))

    report["encoders_ms"] = round(chain_time(enc_step, im1, LO, HI) * 1e3, 2)
    print("encoders", report["encoders_ms"], flush=True)

    # ---- correlation volume + pyramid (inputs: precomputed features) ----
    f1 = fnet.apply({"params": params["fnet"]}, im1[None])[0]
    f2 = fnet.apply({"params": params["fnet"]}, im2[None])[0]

    def corr_step(c):
        pyr = corr_pyramid(all_pairs_correlation(c, f2))
        return c + 1e-6 * sum(jnp.mean(p) for p in pyr)

    report["corr_pyramid_ms"] = round(chain_time(corr_step, f1, LO, HI) * 1e3, 2)
    print("corr", report["corr_pyramid_ms"], flush=True)

    # ---- one lookup step (chained through the flow carry) ----
    pyr = corr_pyramid(all_pairs_correlation(f1, f2))
    h8, w8 = f1.shape[0], f1.shape[1]
    flow0 = jnp.zeros((h8, w8, 2), jnp.float32)

    def lookup_step(flow):
        feats = lookup_pyramid(pyr, flow)
        return flow + 1e-3 * jnp.mean(feats)

    report["lookup_ms_per_iter"] = round(
        chain_time(lookup_step, flow0, LO * 8, HI * 8) * 1e3, 3)
    print("lookup", report["lookup_ms_per_iter"], flush=True)

    # ---- one GRU update step ----
    update = UpdateBlock(128)
    corr_feat = lookup_pyramid(pyr, flow0)
    net0 = jnp.zeros((h8, w8, 128), jnp.float32)
    inp0 = jnp.zeros((h8, w8, 128), jnp.float32)

    def update_step(carry):
        net, flow = carry
        net2, delta, _mask = update.apply(
            {"params": params["update_block"]},
            net[None], inp0[None], corr_feat[None], flow[None])
        return net2[0], flow + delta[0]

    report["update_ms_per_iter"] = round(
        chain_time(update_step, (net0, flow0), LO * 8, HI * 8) * 1e3, 3)
    print("update", report["update_ms_per_iter"], flush=True)

    loop = ITERS * (report["lookup_ms_per_iter"] + report["update_ms_per_iter"])
    acct = report["encoders_ms"] + report["corr_pyramid_ms"] + loop
    report["accounting"] = {
        "iter_loop_ms": round(loop, 2),
        "encoders+corr+loop_ms": round(acct, 2),
        "full_ms": report["full"]["ms_per_pair"],
        "residual_ms_upsample_etc": round(report["full"]["ms_per_pair"] - acct, 2),
    }
    # gather-hazard scale: bytes gathered per lookup vs the ~0.45 GB/s
    # computed-index rate (kernel_notes) tells whether a Pallas cost-volume
    # kernel is worth building
    K = 81  # (2*4+1)^2 window
    n = h8 * w8
    report["lookup_gather_bytes_per_iter"] = int(4 * 4 * n * K * 4)  # 4 lvls, 4 corners, f32
    print(json.dumps(report))


if __name__ == "__main__":
    main()
