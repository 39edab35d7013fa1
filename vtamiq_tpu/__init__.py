"""vtamiq_tpu — a TPU-native JAX/XLA/Pallas framework for full-reference image
quality assessment, with the capabilities of ch-andrei/VTAMIQ.

Layer map (mirrors SURVEY.md §1 of the reference, redesigned TPU-first):

- ``vtamiq_tpu.utils``    — logging, accumulators, timers, scalar writers.
- ``vtamiq_tpu.ops``      — pure math: correlations, losses, CAPS sampling,
                            patch extraction, fused attention kernels.
- ``vtamiq_tpu.models``   — ViT backbone + VTAMIQ head as functional JAX
                            (param pytrees), npz/pytree checkpointing.
- ``vtamiq_tpu.data``     — dataset parsers (TID/LIVE/CSIQ/KADID/KADIS/
                            PIPAL/PieAPP), split machinery, host pipeline.
- ``vtamiq_tpu.parallel`` — device mesh construction + sharding rules.
- ``vtamiq_tpu.train``    — config system, jitted train/eval steps,
                            orchestrator, run scripts.
"""

__version__ = "0.1.0"

# top-level convenience surface
from .inference import VTAMIQScorer, score_pair  # noqa: E402,F401
from .models.configs import VTAMIQConfig, ViTConfig, get_vit_config  # noqa: E402,F401
