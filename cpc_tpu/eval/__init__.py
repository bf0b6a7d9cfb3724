from cpc_tpu.eval.probes import LinearProbeResult, run_speaker_probe, run_phone_probe  # noqa: F401
from cpc_tpu.eval.features import extract_features  # noqa: F401
from cpc_tpu.eval.streaming import StreamingExtractor, receptive_field  # noqa: F401
