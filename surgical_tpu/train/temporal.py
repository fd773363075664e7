"""Temporal-stage training (the tecno.py-equivalent) — pjit'd, bucketed.

Reference recipe (tecno.py): one whole video per optimizer step (batch=1,
full T), per-stage weighted-CE + SmoothL1, AdamW + grad-clip 1.0,
ReduceLROnPlateau(max) on val accuracy, checkpoint every epoch.

TPU-native differences:
- Video lengths (T ≈ 1.7k-6k) are right-padded to a static bucket so each
  bucket compiles once (causal models make the padding exact; losses are
  mask-corrected). The reference instead traces a fresh graph per video.
- Same-bucket videos are batched and the batch dim is sharded over the
  1-D ``data`` mesh; XLA all-reduces the grads over ICI. With B videos per
  step the gradient is the mean over those videos' per-video losses (the
  reference's step = B=1 special case).
- Metrics (accuracy, MAE triad) aggregate host-side exactly as the
  reference does.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from functools import partial
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from surgical_tpu.core.config import TrainConfig
from surgical_tpu.data.feature_store import bucket_length, pad_video
from surgical_tpu.eval.metrics import MAETriad, frame_accuracy, precision_recall_jaccard
from surgical_tpu.parallel import mesh as meshlib
from surgical_tpu.train.losses import temporal_stage_loss
from surgical_tpu.train.optim import PlateauController, build_optimizer, get_lr, set_lr


@dataclass
class VideoDataset:
    """Per-split whole-video supervision: contiguous frame rows per video."""

    features: Any  # FeatureStore-like: .video(i) -> [T, D]
    labels_phase: np.ndarray  # [N] int
    labels_ant: np.ndarray  # [N, num_phases] float
    lengths: np.ndarray  # [num_videos]
    starts: np.ndarray  # [num_videos]

    @property
    def num_videos(self) -> int:
        return len(self.lengths)

    def video_arrays(self, i: int):
        s, L = int(self.starts[i]), int(self.lengths[i])
        return (
            np.asarray(self.features.video(i), dtype=np.float32),
            self.labels_phase[s : s + L].astype(np.int32),
            self.labels_ant[s : s + L].astype(np.float32),
        )


class TemporalTrainer:
    def __init__(
        self,
        model,  # flax module: (x [B,T,D]) -> [S,B,T,out]
        cfg: TrainConfig,
        mesh=None,
        num_phases: int = 7,
    ):
        self.model = model
        self.cfg = cfg
        self.num_phases = num_phases
        self.tx = build_optimizer(cfg.optim)
        self.mesh = mesh if mesh is not None else meshlib.make_mesh()
        self.class_weights = jnp.asarray(cfg.class_weights, dtype=jnp.float32)
        self.plateau = PlateauController(
            mode=cfg.optim.plateau_mode,
            factor=cfg.optim.plateau_factor,
            patience=cfg.optim.plateau_patience,
            min_lr=cfg.optim.plateau_min_lr,
        )
        self._train_step = jax.jit(self._train_step_impl, donate_argnums=(0, 1))
        self._eval_step = jax.jit(self._eval_step_impl)

    # -- init ----------------------------------------------------------------
    def init(self, rng: jax.Array, f_dim: int):
        x = jnp.zeros((1, 8, f_dim), dtype=jnp.float32)
        variables = self.model.init(rng, x)
        params = variables["params"]
        opt_state = self.tx.init(params)
        params, opt_state = meshlib.replicate(self.mesh, (params, opt_state))
        return params, opt_state

    # -- steps -----------------------------------------------------------------
    def _train_step_impl(self, params, opt_state, feats, labels, ant, mask, rng):
        def loss_fn(p):
            out = self.model.apply(
                {"params": p},
                feats,
                deterministic=False,
                rngs={"dropout": rng},
            )
            total, clc, antl = temporal_stage_loss(
                out, labels, ant, self.class_weights, mask, self.num_phases
            )
            preds = jnp.argmax(out[-1][..., : self.num_phases], axis=-1)
            correct = jnp.sum((preds == labels) & mask)
            return total, (clc, antl, correct)

        (loss, (clc, antl, correct)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        updates, opt_state = self.tx.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        return params, opt_state, loss, clc, antl, correct

    def _eval_step_impl(self, params, feats):
        out = self.model.apply({"params": params}, feats, deterministic=True)
        return out[-1]  # final stage [B, T, out_features]

    # -- batching ----------------------------------------------------------------
    def _make_batches(self, ds: VideoDataset, order: Sequence[int], batch_size: int):
        """Group videos of the same bucket into batches of <= batch_size."""
        by_bucket: dict[int, list[int]] = {}
        for i in order:
            b = bucket_length(int(ds.lengths[i]), self.cfg.bucket_sizes)
            by_bucket.setdefault(b, []).append(i)
        batches = []
        for b, vids in by_bucket.items():
            for k in range(0, len(vids), batch_size):
                batches.append((b, vids[k : k + batch_size]))
        return batches

    def _collate(self, ds: VideoDataset, bucket: int, vids: Sequence[int]):
        feats, labels, ants, masks = [], [], [], []
        for i in vids:
            f, l, a = ds.video_arrays(i)
            f, m = pad_video(f, bucket)
            l, _ = pad_video(l, bucket)
            a, _ = pad_video(a, bucket)
            feats.append(f)
            labels.append(l)
            ants.append(a)
            masks.append(m)
        return (
            np.stack(feats),
            np.stack(labels),
            np.stack(ants),
            np.stack(masks),
        )

    # -- epochs -------------------------------------------------------------------
    def train_epoch(
        self, params, opt_state, ds: VideoDataset, rng: jax.Array, epoch: int,
        batch_size: int = 1, shuffle: bool = False,
    ):
        order = list(range(ds.num_videos))
        if shuffle:
            from surgical_tpu.core.rng import host_rng

            host_rng(rng, epoch).shuffle(order)
        total_loss = total_clc = total_ant = 0.0
        total_correct = 0
        t0 = time.time()
        for bi, (bucket, vids) in enumerate(self._make_batches(ds, order, batch_size)):
            feats, labels, ants, masks = self._collate(ds, bucket, vids)
            step_rng = jax.random.fold_in(jax.random.fold_in(rng, epoch), bi)
            params, opt_state, loss, clc, antl, correct = self._train_step(
                params, opt_state, feats, labels, ants, masks, step_rng
            )
            total_loss += float(loss)
            total_clc += float(clc)
            total_ant += float(antl)
            total_correct += int(correct)
        n_frames = int(ds.lengths.sum())
        return params, opt_state, {
            "train_loss": total_loss,
            "train_loss_phase": total_clc,
            "train_loss_ant": total_ant,
            "train_acc": total_correct / n_frames,
            "train_time_s": time.time() - t0,
        }

    def evaluate(self, params, ds: VideoDataset, horizon: float | None = None):
        """Per-video final-stage predictions + the reference's metric set."""
        horizon = horizon if horizon is not None else self.cfg.horizon
        triad = MAETriad(horizon=horizon)
        all_preds, all_labels, per_video_acc = [], [], []
        preds_per_video = []
        for i in range(ds.num_videos):
            f, l, a = ds.video_arrays(i)
            T = len(l)
            bucket = bucket_length(T, self.cfg.bucket_sizes)
            fp, _ = pad_video(f, bucket)
            out = np.asarray(self._eval_step(params, fp[None]))[0, :T]
            pred = np.argmax(out[:, : self.num_phases], axis=-1)
            triad.update(out[:, self.num_phases :], a)
            per_video_acc.append(frame_accuracy(l, pred))
            all_preds.append(pred)
            all_labels.append(l)
            preds_per_video.append(pred)
        flat_pred = np.concatenate(all_preds)
        flat_true = np.concatenate(all_labels)
        metrics = {
            "acc_frame": frame_accuracy(flat_true, flat_pred),
            "acc_video": float(np.mean(per_video_acc)),
            **triad.result(),
            **{
                k: v
                for k, v in precision_recall_jaccard(
                    flat_true, flat_pred, self.num_phases
                ).items()
                if np.isscalar(v)
            },
        }
        return metrics, preds_per_video

    def plateau_step(self, opt_state, metric: float):
        lr = get_lr(opt_state)
        new_lr = self.plateau.step(metric, lr)
        if new_lr != lr:
            opt_state = set_lr(opt_state, new_lr)
        return opt_state, new_lr
