from safevla_tpu.models.llama_decoder import DecoderConfig, LlamaDecoder, init_kv_cache
from safevla_tpu.models.fusion import FusionTransformer
from safevla_tpu.models.vit import DinoViT, DinoViTConfig
from safevla_tpu.models.t5 import T5Encoder, T5Config
from safevla_tpu.models.actor_critic import (
    SafeVLAPolicy,
    PolicyOutputs,
    PolicyState,
)

__all__ = [
    "DecoderConfig",
    "LlamaDecoder",
    "init_kv_cache",
    "FusionTransformer",
    "DinoViT",
    "DinoViTConfig",
    "T5Encoder",
    "T5Config",
    "SafeVLAPolicy",
    "PolicyOutputs",
    "PolicyState",
]
