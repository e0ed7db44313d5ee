from safevla_tpu.ops.gae import gae_advantages, dual_gae
from safevla_tpu.ops.hl_gauss import HLGauss
from safevla_tpu.ops.masks import packed_block_causal_mask, incremental_episode_mask

__all__ = [
    "gae_advantages",
    "dual_gae",
    "HLGauss",
    "packed_block_causal_mask",
    "incremental_episode_mask",
]
