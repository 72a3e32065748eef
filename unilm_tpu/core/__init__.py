from unilm_tpu.core.config import TransformerConfig
from unilm_tpu.core.transformer import Decoder, DecoderLayer, Encoder, EncoderLayer

__all__ = ["TransformerConfig", "Encoder", "EncoderLayer", "Decoder", "DecoderLayer"]
