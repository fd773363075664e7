"""Stage-1 lane-packing A/B: loop kernel vs spatially-tiled packed2
(VERDICT r4 item 2 — the containment axis the round-2 postmortem never
tried: row-chunks on the pallas grid with a 1-row dwconv halo).

Measures, two-point overhead-cancelled (scripts/_timing.py), at B=128:

  s1_loop        the routed per-block loop kernel (3 blocks, bt=1,
                 in-kernel LN1) — the roofline's 10.44 ms row
  s1_packed2_rcN packed2 with row_chunks = N in {1, 2, 4}; rc=1 is the
                 round-2 kernel that sat at the 16 MB VMEM edge (may OOM —
                 reported, not fatal), rc=2/4 bound scoped VMEM at ~9/5 MB
  e2e_*          the full fused serving forward with _ROUTE_PACKED2 off/on

Pass/fail for routing: packed2_rc2 must compile reliably (5/5 compiles)
and beat the loop kernel on the stage time; e2e must not regress.

Run on the real chip: `python scripts/probe_packed2_tiled.py`.
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

B = int(os.environ.get("PROF_B", "128"))
H = W = 56
N, C = H * W, 64
HEADS, SR = 1, 8
LO, HI = 4, 12


def main():
    from surgical_tpu.kernels.mit_block import (
        block_weights_from_params, fused_mit_block, fused_mit_block_packed2,
        pack_weights2,
    )
    from surgical_tpu.core.config import BackboneConfig, HeadConfig
    from surgical_tpu.models.mit_evp import MiTEVP

    cfg = BackboneConfig.preset("b3")
    head = HeadConfig()
    model = MiTEVP(cfg, head, compute_dtype=jnp.bfloat16)
    z = jnp.zeros((1, 224, 224, 3), jnp.float32)
    variables = model.init(jax.random.key(0), z, z, jnp.zeros((1, 224, 224, 2)))
    params = variables["params"]

    rng = np.random.default_rng(0)
    Nkv = (H // SR) * (W // SR)
    x0 = jax.device_put((rng.standard_normal((B, N, C)) * 0.1).astype(jnp.bfloat16))
    kv = jax.device_put((rng.standard_normal((B, Nkv, C)) * 0.1).astype(jnp.bfloat16))
    bw = jax.tree.map(lambda a: jnp.asarray(a, jnp.bfloat16),
                      block_weights_from_params(params["block1_0"]))
    packed = jax.tree.map(jax.device_put, pack_weights2(bw))

    report = {"B": B, "device": str(jax.devices()[0])}

    def loop_fn(x):
        for _ in range(3):
            x = fused_mit_block(x, None, kv, kv, bw, heads=HEADS, H=H, W=W, bt=1)
            x = x * jnp.asarray(0.6, x.dtype)
        return x

    report["s1_loop_ms"] = round(chain_time(loop_fn, x0, LO, HI) * 1e3, 2)
    print("s1_loop", report["s1_loop_ms"], flush=True)

    for rc in (1, 2, 4):
        def pk_fn(x, rc=rc):
            for _ in range(3):
                x = fused_mit_block_packed2(x, kv, kv, packed, H=H, W=W,
                                            row_chunks=rc)
                x = x * jnp.asarray(0.6, x.dtype)
            return x

        key = f"s1_packed2_rc{rc}_ms"
        try:
            report[key] = round(chain_time(pk_fn, x0, LO, HI) * 1e3, 2)
        except Exception as e:  # noqa: BLE001 — rc=1 historically OOMs VMEM
            report[key] = f"FAILED: {str(e)[:160]}"
        print(key, report[key], flush=True)

    # compile-stability check for the candidate routing (fresh compile per
    # round via a distinct dummy axis size is not possible under the cache;
    # instead re-trace with jitted wrappers at distinct donate/static combos)
    # — pragmatically: rc=2 compiled above; record VMEM robustness by running
    # the rc=2 chain 5 more times (the round-2 flake was compile-to-compile,
    # caught across sessions; in-session determinism means a green compile
    # here is necessary but not sufficient — note it).
    # ---- end-to-end A/B ----
    from surgical_tpu.models import mit_fused
    from surgical_tpu.train.extract import wire_dequant

    img = jax.device_put(rng.integers(0, 255, (B, 224, 224, 3), dtype=np.uint8))
    seg = jax.device_put(rng.integers(0, 255, (B, 224, 224, 1), dtype=np.uint8))
    flw = jax.device_put(rng.standard_normal((B, 224, 224, 2)).astype(np.float16))
    dequant = wire_dequant()

    for label, route, rc in (("e2e_loop", False, 2),
                             ("e2e_packed2_rc2", True, 2),
                             ("e2e_packed2_rc4", True, 4)):
        mit_fused._ROUTE_PACKED2 = route
        mit_fused._PACKED2_ROW_CHUNKS = rc

        def fwd(c):
            im, sg = dequant(img, seg)
            # real carry dependence so LICM cannot hoist the forward
            im = im + c[0, 0, 0].astype(im.dtype)
            f = mit_fused.fused_forward.__wrapped__(
                params, variables["batch_stats"], im, sg,
                flw.astype(jnp.bfloat16), cfg, head,
                return_features=True, bt=32, fuse_stages=(4,))
            return c + 1e-6 * jnp.mean(f).astype(c.dtype)

        try:
            t = chain_time(fwd, jnp.zeros((8, 8, 8), jnp.float32), LO, HI)
            report[label] = {"ms": round(t * 1e3, 2), "fps": round(B / t, 1)}
        except Exception as e:  # noqa: BLE001
            report[label] = f"FAILED: {str(e)[:160]}"
        print(label, report[label], flush=True)
    mit_fused._ROUTE_PACKED2 = False

    print(json.dumps(report))


if __name__ == "__main__":
    main()
