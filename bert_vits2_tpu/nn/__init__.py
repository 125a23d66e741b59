"""L1 NN building blocks (flax.linen, channel-last)."""

from bert_vits2_tpu.nn.attention import FFN, Encoder, MultiHeadAttention
from bert_vits2_tpu.nn.conv import Conv1d, ConvTranspose1d, Dense
from bert_vits2_tpu.nn.ddsconv import DDSConv
from bert_vits2_tpu.nn.flows import (
    ConvFlow,
    ElementwiseAffine,
    Log,
    ResidualCouplingLayer,
    TransformerCouplingLayer,
    flip,
)
from bert_vits2_tpu.nn.norm import LayerNorm
from bert_vits2_tpu.nn.wavenet import WN

__all__ = [
    "FFN",
    "Encoder",
    "MultiHeadAttention",
    "Conv1d",
    "ConvTranspose1d",
    "Dense",
    "DDSConv",
    "ConvFlow",
    "ElementwiseAffine",
    "Log",
    "ResidualCouplingLayer",
    "TransformerCouplingLayer",
    "flip",
    "LayerNorm",
    "WN",
]
