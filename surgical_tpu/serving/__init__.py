"""Online (streaming) inference — per-frame surgical phase recognition.

The reference pipeline is strictly offline: extract a whole video's LFB,
then run the temporal models over the full sequence
(trans_SV_output.py:194-321). Surgical workflow analysis is an ONLINE
application, so this package adds an exact streaming re-expression of the
causal temporal models: constant-size per-frame state (dilated-conv ring
buffers for the MS-TCN, conv window + SSM state for Mamba), one jitted step
per frame, bit-compatible with the offline forward on the same parameters.
"""

from surgical_tpu.serving.online import (  # noqa: F401
    OnlineMamba,
    OnlineMSTCN,
    OnlineRefiner,
    OnlineSession,
    run_pipeline,
)
