"""surgical_tpu — TPU-native surgical-video-analysis framework.

A from-scratch JAX/XLA/Pallas/pjit rebuild of the capabilities of
`THao712/Deep-Learning-for-Surgical-Video-Analysis` (ESIP-style surgical
phase recognition + anticipation on Cholec80): prompted SegFormer (MiT)
backbone with bimask prompts and optical-flow cross-attention, a long-term
feature bank, causal temporal models (multi-stage dilated TCN + causal
Mamba), a Trans-SVNet-style refinement transformer, and the MICCAI-relaxed
evaluator — reorganized into one typed, tested, data-parallel framework.

Layer map (see SURVEY.md for the reference analysis this is built to):

- ``core``     typed config tree, RNG discipline, checkpoint store
- ``parallel`` device mesh + sharding helpers (DP over ICI; CPU-mesh testable)
- ``data``     Cholec80 indexing, anticipation GT, clip-synced transforms,
               whole-video feature store (replaces LFB pickles)
- ``models``   MiT-EVP backbone, SegFormer pooled head, MS-TCN, causal Mamba,
               Trans-SVNet refinement transformer, RAFT
- ``kernels``  Pallas TPU kernels for the hot ops (selective scan, fused
               MiT block)
- ``native``   C++ data loader (libjpeg decode + antialiased resize, ctypes)
- ``train``    pjit'd train/eval steps for the three training stages + LFB
               extraction
- ``eval``     MAE triad, classification metrics, relaxed-MICCAI evaluator,
               prediction txt writer, visualization
- ``flow``     resumable optical-flow precompute driver
- ``utils``    metrics logging (JSONL + TensorBoard), stopwatch
- ``cli``      one entrypoint replacing the reference's six scripts
"""

__version__ = "0.1.0"
