"""On-chip serving selfcheck: the deployment artifacts and the online
session must work on the real TPU, not just under the CPU test suite.

1. export the tiny backbone (flax graph AND the Pallas-fused graph) via
   jax.export on this chip, serialize -> deserialize -> call, and check
   parity between the two artifacts;
2. drive OnlineSession — the FULL streaming pipeline: B=1 fused-Pallas
   backbone micro-batch -> streaming MS-TCN -> streaming refiner — for a
   few frames and check the logits are finite and final.

Run on TPU: python scripts/tpu_serving_selfcheck.py
"""
from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from surgical_tpu.core.config import (
    BackboneConfig,
    HeadConfig,
    MSTCNConfig,
    RefinerConfig,
)
from surgical_tpu.models.mit_evp import MiTEVP
from surgical_tpu.models.mstcn import MultiStageTCN
from surgical_tpu.models.transsv import RefinementTransformer
from surgical_tpu.serving.export import (
    export_feature_extractor,
    load_artifact,
    save_artifact,
)
from surgical_tpu.serving.online import OnlineMSTCN, OnlineRefiner, OnlineSession


def main():
    print("device:", jax.devices()[0], flush=True)
    cfg = BackboneConfig.preset("tiny")
    head = HeadConfig(embedding_dim=32, hidden=16)
    model = MiTEVP(cfg, head, compute_dtype=jnp.bfloat16)
    S, B = 64, 2
    z = jnp.zeros((1, S, S, 3), jnp.float32)
    variables = model.init(jax.random.key(0), z, z, jnp.zeros((1, S, S, 2)))

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (B, S, S, 3), dtype=np.uint8)
    seg = rng.integers(0, 255, (B, S, S, 1), dtype=np.uint8)
    flw = rng.standard_normal((B, S, S, 2)).astype(np.float16)

    with tempfile.TemporaryDirectory() as td:
        outs = {}
        for name, fused in (("flax", False), ("fused", True)):
            exported = export_feature_extractor(
                model, variables, B, size=S, use_fused=fused)
            d = os.path.join(td, name)
            save_artifact(d, exported, meta={"graph": name})
            fn = load_artifact(d)
            outs[name] = np.asarray(fn(img, seg, flw), np.float32)
            print(f"{name} artifact: platforms={fn.manifest['platforms']} "
                  f"bytes={fn.manifest['bytes']} out={outs[name].shape}",
                  flush=True)
            assert np.isfinite(outs[name]).all()
        rel = np.max(np.abs(outs["flax"] - outs["fused"])) / (
            np.max(np.abs(outs["flax"])) + 1e-6)
        print(f"flax-vs-fused artifact rel diff: {rel:.2e}", flush=True)
        assert rel < 5e-2, rel

    tcfg = MSTCNConfig(stages=2, layers=3, f_maps=8, f_dim=32)
    tmodel = MultiStageTCN(tcfg)
    tparams = tmodel.init(jax.random.key(1), jnp.zeros((1, 4, 32)))
    rcfg = RefinerConfig(f_maps=8, f_dim=32, len_q=4)
    rmodel = RefinementTransformer(rcfg)
    rparams = rmodel.init(jax.random.key(2),
                          jnp.zeros((4, rcfg.out_features)),
                          jnp.zeros((4, rcfg.f_dim)))
    # use_fused=True: exercise the Pallas per-block kernels at B=1 — the
    # graph a PRODUCTION OnlineSession serves (non-tiny + 1-device TPU mesh
    # routes fused by default; B=1 is a batch the kernels never see in the
    # B=128 extraction benchmarks, so its grid/VMEM shape must be proven).
    # The refiner makes this the FULL reference pipeline, streaming.
    session = OnlineSession(model, variables, OnlineMSTCN(tmodel, tparams),
                            refiner=OnlineRefiner(rmodel, rparams),
                            use_fused=True)
    logits = [session.step(img[0], seg[0], flw[0]) for _ in range(3)]
    assert all(np.isfinite(l).all() for l in logits)
    print("online session on-chip (fused Pallas backbone B=1 -> MS-TCN -> "
          f"refiner): 3 frames, logits[{logits[-1].shape}] finite, "
          f"frame_idx={session.frame_idx}", flush=True)
    print("TPU serving selfcheck OK", flush=True)


if __name__ == "__main__":
    main()
