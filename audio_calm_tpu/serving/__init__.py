from audio_calm_tpu.serving.batcher import RequestBatcher

__all__ = ["RequestBatcher"]
