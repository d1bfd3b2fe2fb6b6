"""Distillation / training harness (multi-resolution STFT loss + optax)."""

from .distill import (  # noqa: F401
    distillation_loss,
    make_optimizer,
    multi_resolution_stft_loss,
    train_step,
)
from .loop import make_teacher_batcher, train  # noqa: F401
