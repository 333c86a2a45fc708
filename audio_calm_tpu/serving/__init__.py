from audio_calm_tpu.serving.batcher import RequestBatcher
from audio_calm_tpu.serving.frontend import make_asr_frontend
from audio_calm_tpu.serving.stats import ServingStats

__all__ = ["RequestBatcher", "ServingStats", "make_asr_frontend"]
