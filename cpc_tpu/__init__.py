"""cpc_tpu — a TPU-native Contrastive Predictive Coding framework for audio.

Built from scratch in JAX/XLA/Pallas with the capabilities of the PyTorch
reference `vincentherrmann/contrastive-predictive-coding-audio` (see SURVEY.md;
the reference mount was empty at build time, so SURVEY.md §A is the parity
spec; citations therefore point at SURVEY.md / BASELINE.json rather than
reference file:line).

Public API (mirrors the reference's `model(x) -> z, c` + K prediction heads,
SURVEY.md §1 [B:5]):

    from cpc_tpu import CPCModel, CPCConfig, presets
    model  = CPCModel(presets.baseline().model)
    out    = model.apply(params, waveform)   # out.z, out.c, out.preds
"""

from cpc_tpu.config import (  # noqa: F401
    CPCConfig,
    DataConfig,
    EncoderConfig,
    ArConfig,
    LossConfig,
    TrainConfig,
    presets,
)
from cpc_tpu.models.cpc import CPCModel, CPCOutput  # noqa: F401

__version__ = "0.1.0"
