"""Test configuration: force an 8-device CPU mesh before JAX initializes.

The real chip (axon TPU tunnel) pays ~1s per fresh op compile, so the suite
runs on host CPU with 8 virtual devices — the TPU analog of the reference's
"CPU fallback, 1 worker" test mode (reference base.py:143-145), and the
standard JAX way to exercise multi-chip sharding without a pod.
"""

import os
import tempfile

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

# Hermetic compile cache: CLI tests (tests/test_evaluation.py drives
# cli.evaluate.main) call enable_persistent_cache(), which flips the
# PROCESS-GLOBAL jax_compilation_cache_dir — without this, every test
# collected after them silently loads executables from the shared bench
# cache (~/.cache/safevla_jax, populated by TPU-tunnel runs under different
# XLA flag contexts). Observed: XLA:CPU "machine feature mismatch" AOT
# loads whose different vectorization re-rounded float paths and flipped
# the marginal learning-dynamics assertions run-to-run. A per-process tmp
# dir keeps any cache enable isolated and cold, so suite runs are
# deterministic and independent of bench history.
os.environ["SAFEVLA_JAX_CACHE"] = tempfile.mkdtemp(prefix="safevla_jax_test_")

import jax

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

# Modules that import torch and execute the reference source / full frozen
# encoders — the slow tail of the suite (~20 of the ~25 total minutes on the
# 1-core box). `pytest -m "not oracle"` (or `make test-fast`) skips them;
# they still run in the full suite.
_ORACLE_MODULES = (
    "test_reference_source_oracle",
    "test_reference_tower_oracle",
    "test_tower_oracle",
    "test_siglip",
    "test_resnet",
    "test_parity_goldens",
)


# Heavy end-to-end integration tests (measured >20 s each on the 1-core box,
# ~8 of the remaining ~15 suite minutes). `make test-fast` skips them too; the
# full suite and CI keep them.
_SLOW_TESTS = {
    "test_online_trainer_end_to_end_on_mesh",
    "test_rollout_collect_and_update",
    "test_learner_update_on_2d_mesh",
    "test_pipelined_groups_collect",
    "test_offline_trainer_sharded",
    "test_act_dispatch_leaf_budget",
    "test_online_trainer_short_run",
    "test_rollout_deterministic_given_seed",
    "test_online_trainer_async_pipeline",
    "test_merged_action_fetch_equivalence",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.module.__name__ in _ORACLE_MODULES:
            item.add_marker(pytest.mark.oracle)
        if item.originalname in _SLOW_TESTS or item.name in _SLOW_TESTS:
            item.add_marker(pytest.mark.slow)


# SAFEVLA_SKIP_ORACLES=1 (make test-fast) removes the oracle modules before
# collection — merely IMPORTING them pays the torch + reference-source import
# cost (minutes on this box), which `-m "not oracle"` alone does not avoid.
if os.environ.get("SAFEVLA_SKIP_ORACLES") == "1":
    collect_ignore = [f"{m}.py" for m in _ORACLE_MODULES]


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
