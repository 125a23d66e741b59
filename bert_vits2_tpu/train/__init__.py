"""L5 training runtime: losses, fused GAN step, checkpointing, trainer loop."""

from bert_vits2_tpu.train.losses import (
    discriminator_loss,
    feature_loss,
    generator_loss,
    kl_loss,
)
from bert_vits2_tpu.train.step import (
    DataConfig,
    Models,
    TrainConfig,
    TrainState,
    init_train_state,
    make_optimizer,
    make_train_step,
)
from bert_vits2_tpu.train.checkpoint import (
    bootstrap_from_reference,
    latest_step,
    restore_train_state,
    save_train_state,
)

__all__ = [
    "bootstrap_from_reference",
    "latest_step",
    "restore_train_state",
    "save_train_state",
    "discriminator_loss",
    "feature_loss",
    "generator_loss",
    "kl_loss",
    "DataConfig",
    "Models",
    "TrainConfig",
    "TrainState",
    "init_train_state",
    "make_optimizer",
    "make_train_step",
]
