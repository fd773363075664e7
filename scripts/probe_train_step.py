"""Backbone train-step phase decomposition at the reference's B=88
(VERDICT r3 item 7: "where does the other ~55 ms/step go?").

Two-point overhead-cancelled chains (roofline methodology) of four nested
slices of BackboneTrainer._train_step_impl:

  aug        dequant + synchronized train augmentation
  fwd        + the full flax train forward + losses (no grad)
  fwd+bwd    + value_and_grad over the TRAINABLE subtree (frozen trunk:
             weight grads only for prompts/head/flow, but the dx chain
             still back-propagates through every trunk block)
  full       + optimizer update (masked SGD/AdamW) + param combine

Deltas give per-phase cost; the analytic check is fwd+bwd ~ 2.1x fwd for a
frozen-trunk graph (dx-only backward ~ 1x fwd FLOPs + trainable weight
grads). Results land in docs/kernel_notes.md (train-step roofline section).

Run on the real chip: `python scripts/probe_train_step.py`.
"""

from __future__ import annotations

import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np


B = int(os.environ.get("BENCH_B", "88"))
# BENCH_PRESET=tiny + BENCH_IMG=64 make a CPU smoke run tractable; the
# measurement protocol is identical either way
PRESET = os.environ.get("BENCH_PRESET", "b3")
IMG = int(os.environ.get("BENCH_IMG", "250"))
LO, HI = 3, 9
ROUNDS = 4


def main():
    from surgical_tpu.core.config import (
        BackboneConfig, HeadConfig, OptimConfig, TrainConfig,
    )
    from surgical_tpu.models.mit_evp import MiTEVP
    from surgical_tpu.train.backbone import (
        BackboneTrainer, combine_params, partition_params,
    )
    from surgical_tpu.train.losses import smooth_l1, weighted_cross_entropy

    if PRESET == "tiny":
        cfg = BackboneConfig(
            variant="tiny", embed_dims=(16, 32, 40, 64),
            num_heads=(1, 2, 4, 8), depths=(1, 1, 2, 1),
            sr_ratios=(8, 4, 2, 1), qkv_bias=True, drop_path_rate=0.1,
            img_size=IMG,
        )
    else:
        cfg = BackboneConfig.preset(PRESET)
    model = MiTEVP(cfg, HeadConfig(), compute_dtype=jnp.bfloat16)
    trainer = BackboneTrainer(
        model,
        TrainConfig(optim=OptimConfig(name="sgd", lr=1e-3, weight_decay=0.0,
                                      grad_clip_norm=None)),
    )
    params, batch_stats, opt_state = trainer.init(jax.random.key(0))

    rng = np.random.default_rng(0)
    img = jax.device_put(rng.integers(0, 255, (B, IMG, IMG, 3), dtype=np.uint8))
    seg = jax.device_put(rng.integers(0, 255, (B, IMG, IMG, 1), dtype=np.uint8))
    flw = jax.device_put(rng.standard_normal((B, IMG, IMG, 2)).astype(np.float16))
    labels = jax.device_put(rng.integers(0, 7, (B,)).astype(np.int32))
    ant = jax.device_put(rng.uniform(0, 1, (B, 7)).astype(np.float32))
    key = jax.random.key(1)

    train0, frozen, treedef = partition_params(params)

    def prepared(img_u8, i):
        im, sg, fl = trainer._dequant(img_u8 ^ (i & 1).astype(jnp.uint8),
                                      seg, flw)
        step_rng = jax.random.fold_in(key, i)
        return trainer._augment(im, sg, fl, jax.random.fold_in(step_rng, 0)), \
            step_rng

    def forward(train, aug, step_rng):
        im, sg, fl = aug
        p = combine_params(train, frozen, treedef)
        (y, y_ant), updates = model.apply(
            {"params": p, "batch_stats": batch_stats},
            im, sg, fl, train=True,
            rngs={"dropout": jax.random.fold_in(step_rng, 1)},
            mutable=["batch_stats"],
        )
        y = y.astype(jnp.float32)
        ce = weighted_cross_entropy(y, labels, reduction="sum")
        reg = smooth_l1(y_ant.astype(jnp.float32), ant, reduction="sum")
        return ce + reg

    # ---- phase fns, each chained via lax.scan over perturbed inputs ----
    @functools.partial(jax.jit, static_argnums=(0,),
                       static_argnames=("iters",))
    def chain(phase, train, opt_state, img_u8, iters):
        def body(carry, i):
            train, opt_state, acc = carry
            aug, step_rng = prepared(img_u8, i)
            if phase == "aug":
                im, sg, fl = aug
                acc = acc + jnp.sum(im.astype(jnp.float32)) \
                    + jnp.sum(sg.astype(jnp.float32)) \
                    + (0.0 if fl is None else jnp.sum(fl.astype(jnp.float32)))
            elif phase == "fwd":
                acc = acc + forward(train, aug, step_rng)
            elif phase == "fwdbwd":
                loss, grads = jax.value_and_grad(forward)(train, aug, step_rng)
                acc = acc + loss + sum(
                    jnp.sum(jnp.abs(g)).astype(jnp.float32)
                    for g in jax.tree.leaves(grads))
            else:  # full
                import optax

                loss, grads = jax.value_and_grad(forward)(train, aug, step_rng)
                updates, opt_state = trainer._tx.update(grads, opt_state, train)
                train = optax.apply_updates(train, updates)
                acc = acc + loss
            return (train, opt_state, acc), None

        (_, _, acc), _ = jax.lax.scan(
            body, (train, opt_state, jnp.float32(0)), jnp.arange(iters))
        return acc

    import time

    report = {"B": B, "preset": PRESET, "img": IMG,
              "device": str(jax.devices()[0])}
    for phase in ("aug", "fwd", "fwdbwd", "full"):
        fn = functools.partial(chain, phase, train0, opt_state)

        def total(iters):
            _ = np.asarray(fn(img, iters=iters))
            best = float("inf")
            for _ in range(ROUNDS):
                t0 = time.perf_counter()
                _ = np.asarray(fn(img, iters=iters))
                best = min(best, time.perf_counter() - t0)
            return best

        t = (total(HI) - total(LO)) / (HI - LO)
        report[phase] = {"ms_per_step": round(t * 1e3, 2),
                         "fps": round(B / t, 1)}
        print(phase, report[phase], flush=True)

    a = report["aug"]["ms_per_step"]
    f = report["fwd"]["ms_per_step"]
    fb = report["fwdbwd"]["ms_per_step"]
    full = report["full"]["ms_per_step"]
    report["phases_ms"] = {
        "aug": round(a, 2),
        "forward": round(f - a, 2),
        "backward": round(fb - f, 2),
        "optimizer_and_combine": round(full - fb, 2),
    }
    report["bwd_over_fwd"] = round((fb - a) / max(f - a, 1e-9), 2)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
