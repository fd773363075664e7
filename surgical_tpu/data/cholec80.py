"""Cholec80 dataset indexing — annotations to arrayized manifests.

Rebuilds the reference's offline prep (get_path_labels.py): parse
``phase_annotations/video<NN>-phase.txt`` (25-fps rows ``frame\\tPhaseName``),
``tool_annotations/video<NN>-tool.txt`` (rows every 25 frames, 7 binary
columns), and anticipation GT; subsample to 1 fps (every 25th frame);
build per-frame records ``[img_path, phase, 7xtool, 7xanticipation]`` and the
two split schemes:

- stage1: train videos 0-31, val 40-47, test 40-79 (32/8/40)
- stage2: train videos 0-39, val 40-47, test 40-79 (40/8⊂40/40)
  (the val ⊂ test quirk is intentional, get_path_labels.py:207-219)

Labels are one [N, 15] float array per split (col 0 phase, 1:8 tools,
8:15 anticipation — the layout tecno.py:207-208 indexes into). The
reference's 9-element pickle is import/exportable for artifact parity.
"""

from __future__ import annotations

import os
import pickle
from dataclasses import dataclass
from typing import Sequence

import numpy as np

from surgical_tpu.core.config import PHASE_NAMES
from surgical_tpu.data.anticipation import anticipation_gt, phases_to_one_hot

PHASE_TO_ID = {name: i for i, name in enumerate(PHASE_NAMES)}
DOWNSAMPLE = 25

# M2CAI16 workflow-challenge variant: 8 phases, no tool annotations
# (get_path_labels.py M2CAI16 branch; M2caiSegmapDataset uses label cols 1:9)
M2CAI_PHASE_NAMES = (
    "TrocarPlacement",
    "Preparation",
    "CalotTriangleDissection",
    "ClippingCutting",
    "GallbladderDissection",
    "GallbladderPackaging",
    "CleaningCoagulation",
    "GallbladderRetraction",
)
M2CAI_PHASE_TO_ID = {name: i for i, name in enumerate(M2CAI_PHASE_NAMES)}


@dataclass
class VideoIndex:
    video_id: int  # 1-based
    img_paths: list[str]  # one per 1-fps frame
    labels: np.ndarray  # [T, 15]: phase, 7 tools, 7 anticipation

    @property
    def num_frames(self) -> int:
        return len(self.img_paths)


@dataclass
class Split:
    paths: list[str]
    labels: np.ndarray  # [N, 15]
    num_each: list[int]

    @property
    def starts(self) -> np.ndarray:
        return np.concatenate([[0], np.cumsum(self.num_each)[:-1]]).astype(np.int64)


def parse_phase_file(path: str, phase_to_id: dict | None = None) -> np.ndarray:
    """25-fps per-frame phase ids (header row skipped). Pass
    ``M2CAI_PHASE_TO_ID`` for the M2CAI16 variant."""
    phase_to_id = phase_to_id or PHASE_TO_ID
    phases = []
    with open(path) as f:
        next(f)
        for line in f:
            parts = line.split()
            if not parts:
                continue
            phases.append(phase_to_id[parts[1]])
    return np.asarray(phases, dtype=np.int64)


def parse_tool_file(path: str) -> np.ndarray:
    """[K, 7] binary tool presences (rows already at 25-frame stride)."""
    rows = []
    with open(path) as f:
        next(f)
        for line in f:
            parts = line.split()
            if not parts:
                continue
            rows.append([int(x) for x in parts[1:8]])
    return np.asarray(rows, dtype=np.int64)


def index_video(
    video_id: int,
    img_dir: str,
    phase_file: str,
    tool_file: str | None,
    horizon: float = 5.0,
) -> VideoIndex:
    """Build the 1-fps record array for one video. Anticipation GT is computed
    on the FULL 25-fps timeline then subsampled, matching the reference's
    pipeline (generate_phase_anticipation.py writes full-rate files that
    get_path_labels.py:151-165 subsamples)."""
    phases_25fps = parse_phase_file(phase_file)
    ant_25fps = anticipation_gt(phases_to_one_hot(phases_25fps), horizon=horizon)

    sub = np.arange(0, len(phases_25fps), DOWNSAMPLE)
    phases = phases_25fps[sub]
    ant = ant_25fps[sub]

    if tool_file is not None:
        tools = parse_tool_file(tool_file)
        # tool rows are already one per 25-frame step; pad/trim to match
        K = len(sub)
        if len(tools) < K:
            tools = np.concatenate([tools, np.repeat(tools[-1:], K - len(tools), 0)])
        tools = tools[:K]
    else:
        tools = np.zeros((len(sub), 7), dtype=np.int64)

    labels = np.concatenate(
        [phases[:, None].astype(np.float64), tools.astype(np.float64), ant], axis=1
    )
    img_paths = [os.path.join(img_dir, f"{f}.jpg") for f in sub]
    return VideoIndex(video_id, img_paths, labels)


def index_dataset(root: str, num_videos: int = 80, horizon: float = 5.0) -> list[VideoIndex]:
    """root layout (reference README): cutMargin/<1..80>/<frame>.jpg,
    phase_annotations/video<NN>-phase.txt, tool_annotations/video<NN>-tool.txt."""
    videos = []
    for v in range(1, num_videos + 1):
        img_dir = os.path.join(root, "cutMargin", str(v))
        phase_file = os.path.join(root, "phase_annotations", f"video{v:02d}-phase.txt")
        tool_file = os.path.join(root, "tool_annotations", f"video{v:02d}-tool.txt")
        videos.append(
            index_video(
                v,
                img_dir,
                phase_file,
                tool_file if os.path.exists(tool_file) else None,
                horizon,
            )
        )
    return videos


def _collect(videos: Sequence[VideoIndex]) -> Split:
    paths, labels, num_each = [], [], []
    for v in videos:
        paths.extend(v.img_paths)
        labels.append(v.labels)
        num_each.append(v.num_frames)
    return Split(paths, np.concatenate(labels) if labels else np.zeros((0, 15)), num_each)


def make_splits(videos: Sequence[VideoIndex], scheme: str = "stage2"):
    """Returns (train, val, test) Splits per the reference schemes."""
    n_train = {"stage1": 32, "stage2": 40}[scheme]
    train = _collect(videos[:n_train])
    val = _collect(videos[40:48])
    test = _collect(videos[40:80])
    return train, val, test


# -- reference 9-element pickle interop --------------------------------------

def to_reference_pickle(train: Split, val: Split, test: Split, path: str) -> None:
    payload = [
        train.paths, val.paths,
        [list(r) for r in train.labels], [list(r) for r in val.labels],
        train.num_each, val.num_each,
        test.paths, [list(r) for r in test.labels], test.num_each,
    ]
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(payload, f)


def from_reference_pickle(path: str):
    with open(path, "rb") as f:
        p = pickle.load(f)
    train = Split(p[0], np.asarray(p[2], dtype=np.float64), list(p[4]))
    val = Split(p[1], np.asarray(p[3], dtype=np.float64), list(p[5]))
    test = Split(p[6], np.asarray(p[7], dtype=np.float64), list(p[8]))
    return train, val, test
