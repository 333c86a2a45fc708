from audio_calm_tpu.utils.masking import (
    lengths_to_mask,
    masked_mean,
)
