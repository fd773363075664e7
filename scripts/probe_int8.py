"""int8-weight extraction: throughput delta + end-pipeline agreement
(VERDICT r3 item 5: turn "quantization breaks parity" into a measurement).

On the real chip:
  1. chained production extraction (make_raw_feature_chain_fn, depth 16,
     f16 wire) with fp weights vs --weight-quant int8: overhead-cancelled
     throughput both ways;
  2. the end pipeline on the SAME frames: features -> MS-TCN final stage ->
     refinement transformer -> per-frame phase argmax. Reported: feature
     relative error, logits MAE, argmax phase agreement %.

Weights are random-init (no Cholec80 in this environment): feature/logit
error magnitudes are representative of the quantization mechanism, and the
agreement % is an upper-bound-ish indicator (trained logits have larger
margins near boundaries, random logits smaller ones — both directions are
noted in docs/kernel_notes.md with the numbers).

Run on the real chip: `python scripts/probe_int8.py`.
"""

from __future__ import annotations

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

B, S = 128, 16
ROUNDS = 4


def main():
    from surgical_tpu.core.config import (
        BackboneConfig, HeadConfig, MSTCNConfig, RefinerConfig,
    )
    from surgical_tpu.models.mit_evp import MiTEVP
    from surgical_tpu.models.mstcn import MultiStageTCN
    from surgical_tpu.models.transsv import RefinementTransformer
    from surgical_tpu.train.extract import make_raw_feature_chain_fn

    cfg = BackboneConfig.preset("b3")
    head = HeadConfig()
    model = MiTEVP(cfg, head, compute_dtype=jnp.bfloat16)
    z = jnp.zeros((1, 224, 224, 3), jnp.float32)
    variables = model.init(jax.random.key(0), z, z, jnp.zeros((1, 224, 224, 2)))

    rng = np.random.default_rng(0)
    sup = (
        jax.device_put(rng.integers(0, 255, (S, B, 224, 224, 3), dtype=np.uint8)),
        jax.device_put(rng.integers(0, 255, (S, B, 224, 224, 1), dtype=np.uint8)),
        jax.device_put(rng.standard_normal((S, B, 224, 224, 2)).astype(np.float16)),
    )

    report = {"B": B, "S": S, "device": str(jax.devices()[0])}
    feats = {}
    for name, wq in (("fp", None), ("int8", "int8")):
        chain_fn = make_raw_feature_chain_fn(model, variables, depth=S,
                                             weight_quant=wq)
        out = chain_fn(*sup)
        feats[name] = np.asarray(out, np.float32).reshape(S * B, -1)
        rates = []
        for _ in range(ROUNDS):
            t0 = time.perf_counter()
            f = chain_fn(*sup)
            _ = np.asarray(f[-1, -1, :8])  # fence compute, skip bulk D2H
            rates.append(S * B / (time.perf_counter() - t0))
        report[f"{name}_fps_raw"] = round(max(rates), 1)
        print(name, report[f"{name}_fps_raw"], "fps (raw incl. relay)",
              flush=True)

    a, b = feats["fp"], feats["int8"]
    denom = np.maximum(np.abs(a), 1e-3)
    report["feature_median_rel_err"] = float(np.median(np.abs(a - b) / denom))
    report["feature_corr"] = float(np.corrcoef(a.ravel(), b.ravel())[0, 1])

    # end pipeline: MS-TCN final stage -> refiner -> argmax phase
    tcfg = MSTCNConfig(stages=2, layers=8, f_maps=32, f_dim=a.shape[-1])
    tmodel = MultiStageTCN(tcfg)
    tparams = tmodel.init(jax.random.key(1), jnp.zeros((1, 4, tcfg.f_dim)))
    rcfg = RefinerConfig(f_maps=32, f_dim=tcfg.f_dim)
    rmodel = RefinementTransformer(rcfg)
    rparams = rmodel.init(jax.random.key(2),
                          jnp.zeros((rcfg.len_q, rcfg.out_features)),
                          jnp.zeros((rcfg.len_q, rcfg.f_dim)))

    @jax.jit
    def pipeline(lfb):
        g = tmodel.apply(tparams, lfb[None])[-1][0]
        return rmodel.apply(rparams, g, lfb)

    logits = {k: np.asarray(pipeline(jnp.asarray(v)), np.float32)
              for k, v in feats.items()}
    la, lb = logits["fp"], logits["int8"]
    phases_a = la[:, :7].argmax(-1)
    phases_b = lb[:, :7].argmax(-1)
    report["logits_mae"] = float(np.mean(np.abs(la - lb)))
    report["anticipation_mae_delta"] = float(
        np.mean(np.abs(la[:, 7:] - lb[:, 7:])))
    report["phase_argmax_agreement_pct"] = float(
        (phases_a == phases_b).mean() * 100)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
