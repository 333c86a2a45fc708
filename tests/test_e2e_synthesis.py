"""THE end-to-end test: train VAE + CALM from scratch on tone 'words',
synthesize, and verify pitch. Exercises every layer of the framework
(frontend, VAE training, latent extraction, CALM TTS training with MAS
duration targets, length/duration prediction, CFG flow ODE, VAE decode),
plus stage-3 few-step distillation verified on AUDIO: the 4-eval
guidance-baked student must still hit the words' pitch.

~6 min on the CPU mesh; tolerance 2/3 words to absorb seed variance
(observed: 3/3 both legs)."""

import sys


def test_trained_stack_synthesizes_correct_pitch():
    sys.path.insert(0, "scripts")
    from e2e_demo import run_demo

    matches, total, distilled = run_demo(
        steps_vae=400, steps_calm=600, distill_steps=300, distill_k=4
    )
    assert total == 3
    assert matches >= 2, f"only {matches}/3 words matched pitch"
    assert distilled >= 2, (
        f"distilled-4 student matched only {distilled}/3 words")
