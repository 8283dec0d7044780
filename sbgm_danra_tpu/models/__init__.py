"""Flax score-network models (NHWC, TPU-native layouts)."""

from sbgm_danra_tpu.models.embeddings import GaussianFourierEmbedding
from sbgm_danra_tpu.models.attention import SpatialSelfAttention
from sbgm_danra_tpu.models.unet import Decoder, DecoderBlock, Encoder, ScoreUNet, build_score_model

__all__ = [
    "GaussianFourierEmbedding",
    "SpatialSelfAttention",
    "Encoder",
    "Decoder",
    "DecoderBlock",
    "ScoreUNet",
    "build_score_model",
]
