"""Visualization: phase ribbons, anticipation sawtooths, attention overlays.

Covers the reference's L5 observability surface:
- GT/prediction ribbon plots per video (eval_and_vis.py:178-195)
- anticipation sawtooth plots (generate_phase_anticipation.py:37-52)
- attention-map overlays (vs_attn.py) — fed by the functional `sow`-based
  capture in models/mit_evp.py instead of the bytecode tracer
  (visualizer.py:3-42).

All functions are headless (Agg backend) and write PNGs.
"""

from __future__ import annotations

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.patches as mpatches  # noqa: E402
import matplotlib.pyplot as plt  # noqa: E402

from surgical_tpu.core.config import PHASE_NAMES  # noqa: E402

PHASE_COLORS = (
    "#D3D3D3", "#FFA500", "#00FFFF", "#0000FF", "#FF00FF", "#008000", "#FFFF00",
)


def plot_ribbon(gt: np.ndarray, pred: np.ndarray, title: str, save_path: str) -> None:
    """Two-row GT/prediction phase ribbon."""
    cmap = matplotlib.colors.ListedColormap(PHASE_COLORS)
    fig, (ax1, ax2) = plt.subplots(2, 1, figsize=(15, 3), sharex=True)
    plt.subplots_adjust(hspace=0.1)
    for ax, row, label in ((ax1, gt, "Ground Truth"), (ax2, pred, "Prediction")):
        ax.imshow(np.asarray(row)[None, :], aspect="auto", cmap=cmap, vmin=0, vmax=6)
        ax.set_ylabel(label, fontsize=12, fontweight="bold", rotation=0, labelpad=60, va="center")
        ax.set_yticks([])
    ax2.set_xlabel("Time (frames)")
    fig.suptitle(title, fontsize=14, y=0.98)
    patches = [
        mpatches.Patch(color=PHASE_COLORS[i], label=f"P{i}: {PHASE_NAMES[i]}")
        for i in range(len(PHASE_NAMES))
    ]
    fig.legend(handles=patches, loc="lower center", bbox_to_anchor=(0.5, -0.15),
               ncol=4, fontsize=9)
    plt.savefig(save_path, bbox_inches="tight", dpi=150)
    plt.close(fig)


def plot_anticipation(save_path: str, gt: np.ndarray, pred: np.ndarray | None = None) -> None:
    """Per-phase sawtooth curves (normalized time-to-phase)."""
    gt = np.asarray(gt)
    P = gt.shape[-1]
    fig = plt.figure(figsize=(30, 2 * P))
    for i in range(P):
        ax = plt.subplot(P, 1, i + 1)
        ax.plot(np.arange(len(gt)), gt[:, i], color="red", linewidth=1, label="gt")
        if pred is not None:
            ax.plot(np.arange(len(pred)), pred[:, i], color="blue", linewidth=1, label="pred")
        ax.set_ylabel(str(i))
        ax.set_yticks([0, 0.5, 1])
        ax.set_yticklabels(["0", "0.5", ">1"])
    plt.xlabel("frame")
    plt.savefig(save_path, dpi=120, bbox_inches="tight")
    plt.close(fig)


def attention_overlay(
    image: np.ndarray,  # [H, W, 3] in [0, 1]
    attn: np.ndarray,  # [heads, N_q, N_kv] from the sown intermediates
    query_grid_hw: tuple[int, int],
    save_path: str,
    head: int | None = None,
) -> None:
    """Overlay mean-query attention mass (per kv location, upsampled via
    kron, like vs_attn.py's visualization) on the frame."""
    H, W = image.shape[:2]
    a = np.asarray(attn)
    if a.ndim == 4:  # [B, heads, Nq, Nkv]
        a = a[0]
    a = a.mean(axis=0) if head is None else a[head]
    kv_mass = a.mean(axis=0)  # [N_kv]
    n = int(np.sqrt(kv_mass.size))
    grid = kv_mass.reshape(n, n)
    up = np.kron(grid, np.ones((H // n, W // n)))
    up = (up - up.min()) / max(up.max() - up.min(), 1e-12)

    fig, ax = plt.subplots(figsize=(6, 6))
    ax.imshow(image)
    ax.imshow(up, alpha=0.5, cmap="jet")
    ax.axis("off")
    plt.savefig(save_path, bbox_inches="tight", dpi=150)
    plt.close(fig)


def capture_attention(model, variables, images, segmaps, flow=None):
    """Run the backbone with attention capture enabled; returns
    {block_name: attn array} (the functional replacement for
    get_local.activate() + cache, vs_attn.py:111-113)."""
    outputs, inter = model.apply(
        variables, images, segmaps, flow, mutable=["intermediates"]
    )
    flat = {}

    def walk(tree, prefix=""):
        for k, v in tree.items():
            if isinstance(v, dict):
                walk(v, f"{prefix}{k}/")
            else:
                flat[prefix + k] = np.asarray(v[0] if isinstance(v, tuple) else v)

    walk(inter["intermediates"])
    return outputs, flat
