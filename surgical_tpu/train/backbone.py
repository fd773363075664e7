"""Backbone (spatial-stage) training — the train_evp.py / finetune_evp.py
equivalent, as one pjit'd step.

Reference recipe (train_evp.py): loss = sum-reduction CE + sum-reduction
SmoothL1 (:390-391,509); all parameters FROZEN except the head, prompt
generator, flow encoder and the two cross-attention fusions (:379-382);
fp16 autocast + GradScaler. TPU-native: bf16 compute (no loss scaler
needed), fp32 params/optimizer state, frozen params masked out of the
optimizer with optax.multi_transform, batch sharded over the ``data`` mesh
with gradients all-reduced by XLA over ICI.

The finetune stage (finetune_evp.py) is the same step on the 40-video split
with early stopping on a target train loss (:594-616) — provided here as the
``EarlyStop`` helper.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from surgical_tpu.parallel import mesh as meshlib
from surgical_tpu.train.losses import smooth_l1, weighted_cross_entropy
from surgical_tpu.train.optim import build_optimizer

# Parameter-path substrings that stay trainable (train_evp.py:379-382).
TRAINABLE_KEYS = ("head", "prompt_generator", "flow_encoder", "cross_attn_s3", "cross_attn_s4")


def trainable_mask(params: Any) -> Any:
    """True for leaves under a trainable top-level module."""

    def mark(path, _):
        names = [str(getattr(p, "key", p)) for p in path]
        return any(any(k in n for k in TRAINABLE_KEYS) for n in names)

    return jax.tree_util.tree_map_with_path(mark, params)


def build_frozen_optimizer(tx: optax.GradientTransformation, params: Any):
    """Wrap an optimizer so frozen parameters receive zero updates."""
    mask = trainable_mask(params)
    labels = jax.tree.map(lambda t: "train" if t else "freeze", mask)
    return optax.multi_transform(
        {"train": tx, "freeze": optax.set_to_zero()}, labels
    )


def partition_params(params: Any):
    """Split params into (trainable, frozen) leaf lists + treedef.

    Frozen positions hold None (an empty pytree node), so differentiating
    w.r.t. the trainable list computes NO gradients for the frozen trunk —
    the reference's requires_grad=False semantics (train_evp.py:379-382)
    done the JAX way. This skips the trunk's weight-gradient matmuls in the
    backward pass and shrinks optimizer state to the trainable subtree.
    """
    leaves, treedef = jax.tree.flatten(params)
    m_leaves = jax.tree.leaves(trainable_mask(params))
    train = [p if m else None for p, m in zip(leaves, m_leaves)]
    frozen = [None if m else p for p, m in zip(leaves, m_leaves)]
    return train, frozen, treedef


def combine_params(train: list, frozen: list, treedef) -> Any:
    return jax.tree_util.tree_unflatten(
        treedef, [t if t is not None else f for t, f in zip(train, frozen)]
    )


@dataclass
class EarlyStop:
    """Stop when train loss drops below a target (finetune_evp.py:594-616)."""

    target_train_loss: float = 0.0144
    stopped: bool = False

    def update(self, train_loss: float) -> bool:
        if train_loss < self.target_train_loss:
            self.stopped = True
        return self.stopped


def make_backbone_train_step(
    model,
    tx: optax.GradientTransformation,
) -> Callable:
    """Returns jitted step(params, batch_stats, opt_state, batch, rng) ->
    (params, batch_stats, opt_state, metrics).

    batch = (images [B,H,W,3], segmaps [B,H,W,3], flow [B,H,W,2] | None,
             labels_phase [B], labels_ant [B,7]).
    """

    def step(params, batch_stats, opt_state, images, segmaps, flow, labels, ant, rng):
        def loss_fn(p):
            (y, y_ant), updates = model.apply(
                {"params": p, "batch_stats": batch_stats},
                images,
                segmaps,
                flow,
                train=True,
                rngs={"dropout": rng},
                mutable=["batch_stats"],
            )
            y = y.astype(jnp.float32)
            y_ant = y_ant.astype(jnp.float32)
            ce = weighted_cross_entropy(y, labels, reduction="sum")
            reg = smooth_l1(y_ant, ant, reduction="sum")
            preds = jnp.argmax(y, axis=-1)
            correct = jnp.sum(preds == labels)
            return ce + reg, (ce, reg, correct, updates["batch_stats"])

        (loss, (ce, reg, correct, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics = {"loss": loss, "ce": ce, "reg": reg, "correct": correct}
        return params, new_bs, opt_state, metrics

    return jax.jit(step, donate_argnums=(0, 1, 2))


class BackboneTrainer:
    """Epoch-level orchestration of the spatial stage (train_evp.py:300-908,
    finetune_evp.py): wire-format host batches, clip-synchronized on-device
    augmentation, frozen-trunk bf16 train step, mid-epoch validation every
    ``val_every`` steps (train_evp.py:526-564), per-epoch checkpointing."""

    def __init__(self, model, cfg, aug_cfg=None, mesh=None, val_every: int = 15,
                 use_fused: bool = False):
        from surgical_tpu.core.config import CHOLEC80_MEAN, CHOLEC80_STD
        from surgical_tpu.data.transforms import AugConfig

        self.model = model
        self.cfg = cfg
        self.aug_cfg = aug_cfg or AugConfig()
        self.mesh = mesh if mesh is not None else meshlib.make_mesh()
        self.val_every = val_every
        # EXPERIMENTAL: route the frozen trunk through the fused Pallas train
        # kernels (forward AND backward — kernels/mit_block.fused_mit_block_
        # train). Grad parity holds to 1e-4, but at b3/B=88 the flash-style
        # recompute backward measured SLOWER than XLA autodiff (fwd+bwd
        # 119.8 vs 90.1 ms, docs/kernel_notes.md train-path findings) —
        # keep False unless profiling a larger variant shows a win.
        # Valid ONLY under the reference's frozen-trunk recipe: the fused
        # blocks return zero weight cotangents, and partition_params
        # guarantees those are never consumed (asserted at step build).
        self.use_fused = use_fused
        self._mean = jnp.asarray(CHOLEC80_MEAN, jnp.float32) * 255.0
        self._inv_std = 1.0 / (jnp.asarray(CHOLEC80_STD, jnp.float32) * 255.0)
        self._tx = None
        self._train_step = None
        self._eval_step = jax.jit(self._eval_step_impl)

    # -- wire-format -> device float (fused into the step graphs) -----------
    def _dequant(self, img_u8, seg_u8, flow_f16):
        # dequant + augment run in the MODEL's compute dtype (bf16 on TPU):
        # geometry aug is pure data movement (exact at any dtype) and the
        # patch-embed conv quantizes to bf16 anyway, so running the aug
        # stack at bf16 halves its HBM traffic for free (measured on chip:
        # docs/kernel_notes.md round-5 train section)
        dt = getattr(self.model, "compute_dtype", jnp.float32)
        img = img_u8.astype(dt) / jnp.asarray(255.0, dt)
        seg = jnp.broadcast_to(seg_u8.astype(dt) / jnp.asarray(255.0, dt),
                               img.shape)
        flow = None if flow_f16 is None else flow_f16.astype(dt)
        return img, seg, flow

    def _augment(self, img, seg, flow, rng):
        """Per-clip synchronized train augmentation. Inputs [B, H, W, C]
        (seq_len=1 clips, the stage-1 config train_evp.py:443). Uses the
        batch-level stack whose rotation is a table gather (a vmapped
        dynamic-index rotate costs ~130 ms/step on TPU)."""
        from surgical_tpu.data.transforms import train_preprocess_batch

        return train_preprocess_batch(img, seg, flow, rng, self.aug_cfg)

    def init(self, rng: jax.Array, img_size: int = 250):
        z = jnp.zeros((1, img_size, img_size, 3))
        variables = self.model.init(rng, z, z, jnp.zeros((1, img_size, img_size, 2)))
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        self._tx = build_optimizer(self.cfg.optim)
        train, _, _ = partition_params(params)
        if self.use_fused:
            # machine-check the fused-kernel invariant: the custom-VJP block
            # kernels return structurally-ZERO weight cotangents, so a config
            # that ever put trunk block/norm subtrees in the trainable
            # partition would silently train nothing there
            mask = trainable_mask(params)
            for path, m in jax.tree_util.tree_leaves_with_path(mask):
                names = "/".join(str(getattr(p, "key", p)) for p in path)
                assert not (m and ("block" in names or names.startswith("norm"))), (
                    f"--fused requires a frozen trunk, but {names} is trainable"
                )
        opt_state = self._tx.init(train)
        self._train_step = jax.jit(self._train_step_impl, donate_argnums=(0, 1, 2))
        return meshlib.replicate(self.mesh, (params, batch_stats, opt_state))

    def _train_step_impl(self, params, batch_stats, opt_state,
                         img_u8, seg_u8, flow_f16, labels, ant, rng):
        img, seg, flow = self._dequant(img_u8, seg_u8, flow_f16)
        img, seg, flow = self._augment(img, seg, flow, jax.random.fold_in(rng, 0))

        # differentiate ONLY the trainable subtree: no weight gradients (or
        # optimizer moments) are ever materialized for the frozen trunk
        train, frozen, treedef = partition_params(params)

        def loss_fn(train):
            p = combine_params(train, frozen, treedef)
            if self.use_fused:
                from surgical_tpu.models.mit_train import fused_train_forward

                y, y_ant, new_bs = fused_train_forward(
                    p, batch_stats, img, seg, flow,
                    jax.random.fold_in(rng, 1),
                    self.model.cfg, self.model.head_cfg,
                    compute_dtype=self.model.compute_dtype,
                )
                updates = {"batch_stats": new_bs}
            else:
                (y, y_ant), updates = self.model.apply(
                    {"params": p, "batch_stats": batch_stats},
                    img, seg, flow, train=True,
                    rngs={"dropout": jax.random.fold_in(rng, 1)},
                    mutable=["batch_stats"],
                )
            y = y.astype(jnp.float32)
            ce = weighted_cross_entropy(y, labels, reduction="sum")
            reg = smooth_l1(y_ant.astype(jnp.float32), ant, reduction="sum")
            correct = jnp.sum(jnp.argmax(y, -1) == labels)
            return ce + reg, (ce, reg, correct, updates["batch_stats"])

        (loss, (ce, reg, correct, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(train)
        updates, opt_state = self._tx.update(grads, opt_state, train)
        train = optax.apply_updates(train, updates)
        params = combine_params(train, frozen, treedef)
        return params, new_bs, opt_state, loss, ce, reg, correct

    def _eval_step_impl(self, params, batch_stats, img_u8, seg_u8, flow_f16):
        from surgical_tpu.data.transforms import eval_preprocess_clip

        img, seg, flow = self._dequant(img_u8, seg_u8, flow_f16)
        img, seg, flow = eval_preprocess_clip(img, seg, flow, self.aug_cfg)
        y, y_ant = self.model.apply(
            {"params": params, "batch_stats": batch_stats}, img, seg, flow, train=False
        )
        return y.astype(jnp.float32), y_ant.astype(jnp.float32)

    # -- loops ----------------------------------------------------------------
    def train_epoch(self, state, batches, rng, epoch: int,
                    val_batches=None, logger=None, step_offset: int = 0):
        import time as _time

        params, batch_stats, opt_state = state
        total = correct = seen = 0.0
        t0 = _time.time()
        for bi, (img, seg, flow, labels, ant) in enumerate(batches):
            step_rng = jax.random.fold_in(jax.random.fold_in(rng, epoch), bi)
            params, batch_stats, opt_state, loss, ce, reg, corr = self._train_step(
                params, batch_stats, opt_state, img, seg, flow,
                labels.astype(jnp.int32), ant, step_rng,
            )
            total += float(loss)
            correct += int(corr)
            seen += len(labels)
            if val_batches is not None and (bi + 1) % self.val_every == 0:
                vm = self.evaluate((params, batch_stats), val_batches)
                if logger is not None:
                    logger.log(step_offset + bi, vm, prefix="midval/")
        metrics = {
            "train_loss": total,
            "train_acc": correct / max(seen, 1),
            "train_elapsed_time": _time.time() - t0,
            "frames_per_s": seen / max(_time.time() - t0, 1e-9),
        }
        return (params, batch_stats, opt_state), metrics

    def evaluate(self, state, batches, horizon: float | None = None,
                 num_each=None):
        """Frame accuracy + MAE triad + macro precision/recall/jaccard, and
        (when per-video frame counts are given) mean per-video accuracy —
        the full metric set of the reference's epoch eval
        (train_evp.py:605-907)."""
        from surgical_tpu.eval.metrics import (
            MAETriad, frame_accuracy, precision_recall_jaccard,
        )

        params, batch_stats = state[0], state[1]
        triad = MAETriad(horizon=horizon or self.cfg.horizon)
        preds, labs = [], []
        for img, seg, flow, labels, ant in batches:
            y, y_ant = self._eval_step(params, batch_stats, img, seg, flow)
            preds.append(np.argmax(np.asarray(y), -1))
            labs.append(np.asarray(labels))
            triad.update(np.asarray(y_ant), np.asarray(ant))
        flat_p = np.concatenate(preds) if preds else np.zeros(0, int)
        flat_l = np.concatenate(labs) if labs else np.zeros(0, int)
        metrics = {"acc": frame_accuracy(flat_l, flat_p), **triad.result()}
        if flat_l.size:
            prj = precision_recall_jaccard(flat_l, flat_p)
            metrics.update({k: v for k, v in prj.items() if np.isscalar(v)})
        if num_each is not None and flat_l.size:
            per_video = []
            off = 0
            for n in np.asarray(num_each, dtype=int):
                if off + n > flat_l.size:
                    break
                per_video.append(frame_accuracy(flat_l[off:off + n],
                                                flat_p[off:off + n]))
                off += n
            if per_video:
                metrics["acc_video"] = float(np.mean(per_video))
        return metrics


def make_backbone_eval_step(model) -> Callable:
    def step(params, batch_stats, images, segmaps, flow):
        y, y_ant = model.apply(
            {"params": params, "batch_stats": batch_stats},
            images,
            segmaps,
            flow,
            train=False,
        )
        return y.astype(jnp.float32), y_ant.astype(jnp.float32)

    return jax.jit(step)
