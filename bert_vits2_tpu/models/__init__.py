"""L2 model layer: synthesizer, submodels, discriminators."""

from bert_vits2_tpu.models.config import ModelConfig
from bert_vits2_tpu.models.discriminators import (
    DurationDiscriminator,
    MultiPeriodDiscriminator,
    WavLMDiscriminator,
)
from bert_vits2_tpu.models.duration import (
    DurationPredictor,
    StochasticDurationPredictor,
)
from bert_vits2_tpu.models.flow import ResidualCouplingBlock, TransformerCouplingBlock
from bert_vits2_tpu.models.generator import Generator, ResBlock1, ResBlock2
from bert_vits2_tpu.models.posterior import PosteriorEncoder
from bert_vits2_tpu.models.reference_encoder import ReferenceEncoder
from bert_vits2_tpu.models.synthesizer import Synthesizer
from bert_vits2_tpu.models.text_encoder import TextEncoder

__all__ = [
    "ModelConfig",
    "DurationDiscriminator",
    "MultiPeriodDiscriminator",
    "WavLMDiscriminator",
    "DurationPredictor",
    "StochasticDurationPredictor",
    "ResidualCouplingBlock",
    "TransformerCouplingBlock",
    "Generator",
    "ResBlock1",
    "ResBlock2",
    "PosteriorEncoder",
    "ReferenceEncoder",
    "Synthesizer",
    "TextEncoder",
]
