from audio_calm_tpu.serving.batcher import RequestBatcher
from audio_calm_tpu.serving.stats import ServingStats

__all__ = ["RequestBatcher", "ServingStats"]
