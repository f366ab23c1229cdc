"""Training runtime: config, schedules, jitted train/eval steps, checkpoints."""

from opticalflowscivis_tpu.training.config import ModelConfig, OptimConfig, TrainConfig
from opticalflowscivis_tpu.training.schedule import warmup_cosine
from opticalflowscivis_tpu.training.trainer import Trainer, build_model, make_train_step, split_batch

__all__ = [
    "ModelConfig", "OptimConfig", "TrainConfig", "warmup_cosine",
    "Trainer", "build_model", "make_train_step", "split_batch",
]
