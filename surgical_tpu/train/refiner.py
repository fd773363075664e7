"""Refinement-transformer training + end-to-end prediction.

- ``RefinerTrainer``: the tecno_trans.py-equivalent loop. The temporal model
  (MS-TCN or Mamba) is FROZEN; its final-stage logits feed the refinement
  transformer, trained with 0.5*weighted-CE + SmoothL1, Adam 5e-4
  (tecno_trans.py:190-205,281-288).
- ``predict_pipeline``: the trans_SV_output.py-equivalent inference: per
  video LFB -> temporal final stage -> refinement transformer -> argmax
  phases + anticipation, plus prediction-txt writing. The temporal+refiner
  composition is ONE jitted function per bucket (the reference's per-frame
  Python window loop is a gather inside it — SURVEY §3.4 hot spot).
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from surgical_tpu.core.config import TrainConfig
from surgical_tpu.data.feature_store import bucket_length, pad_video
from surgical_tpu.eval.metrics import MAETriad, frame_accuracy, precision_recall_jaccard
from surgical_tpu.train.losses import refiner_loss
from surgical_tpu.train.optim import build_optimizer
from surgical_tpu.train.temporal import VideoDataset


class RefinerTrainer:
    def __init__(
        self,
        temporal_model,  # frozen: (x [1,T,D]) -> [S,1,T,out]
        refiner_model,  # (g [T,out], lfb [T,D]) -> [T,out]
        cfg: TrainConfig,
        num_phases: int = 7,
    ):
        self.temporal = temporal_model
        self.refiner = refiner_model
        self.cfg = cfg
        self.num_phases = num_phases
        self.tx = build_optimizer(cfg.optim)
        self.class_weights = jnp.asarray(cfg.class_weights, dtype=jnp.float32)
        self._train_step = jax.jit(self._train_step_impl, donate_argnums=(1, 2))
        self._predict = jax.jit(self._predict_impl)

    def init(self, rng: jax.Array, temporal_params, f_dim: int, out_features: int = 14):
        g0 = jnp.zeros((8, out_features))
        lfb0 = jnp.zeros((8, f_dim))
        params = self.refiner.init(rng, g0, lfb0)["params"]
        return params, self.tx.init(params)

    # one video per step (batch=1, reference semantics)
    def _train_step_impl(self, temporal_params, params, opt_state, lfb, labels, ant, mask):
        g = self.temporal.apply({"params": temporal_params}, lfb[None])[-1][0]
        g = jax.lax.stop_gradient(g)

        def loss_fn(p):
            out = self.refiner.apply({"params": p}, g, lfb)
            total, clc, antl = refiner_loss(
                out, labels, ant, self.class_weights, mask, self.num_phases
            )
            preds = jnp.argmax(out[:, : self.num_phases], axis=-1)
            correct = jnp.sum((preds == labels) & mask)
            return total, (clc, antl, correct)

        (loss, (clc, antl, correct)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = self.tx.update(grads, opt_state, params)
        params = jax.tree.map(lambda a, b: a + b, params, updates)
        return params, opt_state, loss, clc, antl, correct

    def _predict_impl(self, temporal_params, params, lfb):
        g = self.temporal.apply({"params": temporal_params}, lfb[None])[-1][0]
        return self.refiner.apply({"params": params}, g, lfb)

    def train_epoch(self, temporal_params, params, opt_state, ds: VideoDataset, epoch: int):
        t0 = time.time()
        total = correct = 0.0
        for i in range(ds.num_videos):
            f, l, a = ds.video_arrays(i)
            bucket = bucket_length(len(l), self.cfg.bucket_sizes)
            fp, m = pad_video(f, bucket)
            lp, _ = pad_video(l, bucket)
            ap, _ = pad_video(a, bucket)
            params, opt_state, loss, _, _, corr = self._train_step(
                temporal_params, params, opt_state, fp, lp, ap, m
            )
            total += float(loss)
            correct += int(corr)
        n = int(ds.lengths.sum())
        return params, opt_state, {
            "train_loss": total,
            "train_acc": correct / n,
            "train_time_s": time.time() - t0,
        }

    def evaluate(self, temporal_params, params, ds: VideoDataset, horizon=None,
                 predict_fn: Callable | None = None):
        """``predict_fn(lfb [Tp, D]) -> [Tp, out]`` overrides the default
        jitted temporal+refiner composition — e.g. the STREAMING pipeline
        (serving/online.py), whose outputs are parity-exact (cli predict
        --online)."""
        horizon = horizon if horizon is not None else self.cfg.horizon
        triad = MAETriad(horizon=horizon)
        per_video_acc, all_p, all_l, preds_per_video, ant_per_video = [], [], [], [], []
        if predict_fn is None:
            predict_fn = lambda fp: self._predict(temporal_params, params, fp)
        for i in range(ds.num_videos):
            f, l, a = ds.video_arrays(i)
            T = len(l)
            bucket = bucket_length(T, self.cfg.bucket_sizes)
            fp, _ = pad_video(f, bucket)
            out = np.asarray(predict_fn(fp))[:T]
            pred = np.argmax(out[:, : self.num_phases], axis=-1)
            ant_pred = out[:, self.num_phases :]
            triad.update(ant_pred, a)
            per_video_acc.append(frame_accuracy(l, pred))
            all_p.append(pred)
            all_l.append(l)
            preds_per_video.append(pred)
            ant_per_video.append(ant_pred)
        flat_p, flat_l = np.concatenate(all_p), np.concatenate(all_l)
        metrics = {
            "acc_frame": frame_accuracy(flat_l, flat_p),
            "acc_video": float(np.mean(per_video_acc)),
            **triad.result(),
            **{k: v for k, v in precision_recall_jaccard(flat_l, flat_p, self.num_phases).items()
               if np.isscalar(v)},
        }
        return metrics, preds_per_video, ant_per_video


def predict_and_write(
    trainer: RefinerTrainer,
    temporal_params,
    refiner_params,
    ds: VideoDataset,
    out_dir: str,
    video_ids,
    fps: int = 25,
    predict_fn: Callable | None = None,
):
    """trans_SV_output.py equivalent: predictions + txt artifacts + metrics."""
    from surgical_tpu.eval.predictions import video_txt_name, write_phase_txt
    import os

    metrics, preds, ants = trainer.evaluate(temporal_params, refiner_params, ds,
                                            predict_fn=predict_fn)
    os.makedirs(out_dir, exist_ok=True)
    for vid, pred in zip(video_ids, preds):
        write_phase_txt(os.path.join(out_dir, video_txt_name(vid)), pred, fps=fps)
    return metrics, preds, ants
