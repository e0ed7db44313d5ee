"""Test configuration: force an 8-device CPU mesh before JAX initializes.

The real chip (axon TPU tunnel) pays ~1s per fresh op compile, so the suite
runs on host CPU with 8 virtual devices — the TPU analog of the reference's
"CPU fallback, 1 worker" test mode (reference base.py:143-145), and the
standard JAX way to exercise multi-chip sharding without a pod.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def tiny_model_cfg():
    """Small-but-structurally-complete model config for fast tests."""
    from safevla_tpu.config import ModelConfig
    from safevla_tpu.models import vit as vitmod

    vitmod.VIT_CONFIGS["test_tiny"] = vitmod.DinoViTConfig(
        embed_dim=32, depth=1, num_heads=2, img_height=28, img_width=42, patch_size=14
    )
    return ModelConfig(
        hidden_size=64,
        num_tx_layers=2,
        num_tx_heads=4,
        goal_dims=64,
        text_embed_size=64,
        combiner_layers=1,
        combiner_heads=4,
        combiner_ffn_dim=128,
        dino_compressor_hidden_out_dims=(64, 64),
        vision_backbone="test_tiny",
        vision_feature_dim=32,
        vision_grid=(7, 12),
        image_size=(28, 42),
        max_steps=16,
        text_max_tokens=8,
        num_towers=3,
        compute_dtype="float32",
    )


@pytest.fixture(scope="session")
def tiny_policy(tiny_model_cfg):
    from safevla_tpu.models.actor_critic import SafeVLAPolicy

    return SafeVLAPolicy(tiny_model_cfg)


@pytest.fixture(scope="session")
def tiny_params(tiny_policy):
    return tiny_policy.init_params(jax.random.PRNGKey(0))
