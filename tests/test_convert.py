"""Reference-checkpoint conversion: synthetic torch-shaped state dicts ->
flax pytrees, shape-verified against freshly-initialized params."""

import jax
import numpy as np
import pytest

from safevla_tpu.models.convert import (
    import_tower_state_dict,
    normalize_reference_checkpoint,
    split_tower_state_dicts,
)


def synthetic_tower_sd(d=64, n_layers=2, n_fusion=1, ffn=256, n_actions=20, rng=None):
    """Build a state dict with the reference model's key naming/shapes."""
    rng = rng or np.random.default_rng(0)
    r = lambda *s: rng.normal(size=s).astype(np.float32)
    sd = {}
    ve = "visual_encoder"
    dv = 32  # dino feature dim
    sd[f"{ve}.visual_compressor.0.weight"] = r(d, dv, 1, 1)
    sd[f"{ve}.visual_compressor.0.bias"] = r(d)
    sd[f"{ve}.visual_compressor.2.weight"] = r(d, d, 1, 1)
    sd[f"{ve}.visual_compressor.2.bias"] = r(d)
    for name in ("visual_adapter", "text_adapter"):
        sd[f"{ve}.{name}.0.weight"] = r(d, d)
        sd[f"{ve}.{name}.0.bias"] = r(d)
        sd[f"{ve}.{name}.1.weight"] = r(d)
        sd[f"{ve}.{name}.1.bias"] = r(d)
    sd[f"{ve}.fusion_token"] = r(d)
    sd[f"{ve}.visual_sensor_token_raw_navigation_camera"] = r(d)
    sd[f"{ve}.visual_sensor_token_raw_manipulation_camera"] = r(d)
    for i in range(n_fusion):
        fp = f"{ve}.fusion_xformer.layers.{i}"
        sd[f"{fp}.self_attn.in_proj_weight"] = r(3 * d, d)
        sd[f"{fp}.self_attn.in_proj_bias"] = r(3 * d)
        sd[f"{fp}.self_attn.out_proj.weight"] = r(d, d)
        sd[f"{fp}.self_attn.out_proj.bias"] = r(d)
        sd[f"{fp}.linear1.weight"] = r(128, d)
        sd[f"{fp}.linear1.bias"] = r(128)
        sd[f"{fp}.linear2.weight"] = r(d, 128)
        sd[f"{fp}.linear2.bias"] = r(d)
        sd[f"{fp}.norm1.weight"] = r(d)
        sd[f"{fp}.norm1.bias"] = r(d)
        sd[f"{fp}.norm2.weight"] = r(d)
        sd[f"{fp}.norm2.bias"] = r(d)
    sd["last_actions_embed.weight"] = r(n_actions + 2, d)
    sd["object_in_hand_embed.weight"] = r(3, d)
    for i in range(n_layers):
        dp = f"decoder.layers.{i}"
        for w in ("wq", "wk", "wv", "wo"):
            sd[f"{dp}.attention.{w}.weight"] = r(d, d)
        sd[f"{dp}.feed_forward.w1.weight"] = r(ffn, d)
        sd[f"{dp}.feed_forward.w2.weight"] = r(d, ffn)
        sd[f"{dp}.feed_forward.w3.weight"] = r(ffn, d)
        sd[f"{dp}.attention_norm.weight"] = r(d)
        sd[f"{dp}.ffn_norm.weight"] = r(d)
    sd["decoder.norm.weight"] = r(d)
    sd["decoder.output.weight"] = r(d, d)
    sd["actor.linear.weight"] = r(n_actions, d)
    sd["actor.linear.bias"] = r(n_actions)
    sd["critic.fc.weight"] = r(1, d)
    sd["critic.fc.bias"] = r(1)
    return sd


def test_tower_import_shapes_match_init(tiny_model_cfg, tiny_policy, tiny_params):
    # ffn hidden of the tiny decoder config
    from safevla_tpu.models.llama_decoder import DecoderConfig

    ffn = DecoderConfig(dim=64, n_layers=2, n_heads=4).ffn_hidden
    sd = synthetic_tower_sd(d=64, n_layers=2, n_fusion=1, ffn=ffn)
    converted = import_tower_state_dict(
        sd, num_tx_layers=2, combiner_layers=1, critic_type="linear"
    )
    template = jax.tree.map(lambda x: x[0], tiny_params["towers"])  # tower 0

    conv_leaves = jax.tree_util.tree_flatten_with_path(converted)[0]
    tmpl_leaves = {
        jax.tree_util.keystr(k): v.shape
        for k, v in jax.tree_util.tree_flatten_with_path(template)[0]
    }
    assert len(conv_leaves) == len(tmpl_leaves), (
        f"leaf count mismatch: {len(conv_leaves)} vs {len(tmpl_leaves)}"
    )
    for k, v in conv_leaves:
        ks = jax.tree_util.keystr(k)
        assert ks in tmpl_leaves, f"unexpected key {ks}"
        assert v.shape == tmpl_leaves[ks], f"{ks}: {v.shape} != {tmpl_leaves[ks]}"


def test_normalize_formats():
    sd = {"actor.weight": np.zeros((20, 64)), "decoder.norm.weight": np.ones(64)}
    # lightning format with model. prefix + actor.weight remap
    out = normalize_reference_checkpoint(
        {"state_dict": {f"model.{k}": v for k, v in sd.items()}}
    )
    assert "actor.linear.weight" in out and "decoder.norm.weight" in out
    # allenact format
    out2 = normalize_reference_checkpoint({"model_state_dict": sd})
    assert "actor.linear.weight" in out2
    # raw
    out3 = normalize_reference_checkpoint(sd)
    assert "actor.linear.weight" in out3


def test_split_towers():
    flat = {
        "decoder.norm.weight": 1,
        "critic_tsfm.decoder.norm.weight": 2,
        "c_critic_tsfm.decoder.norm.weight": 3,
    }
    towers = split_tower_state_dicts(flat)
    assert towers["actor"]["decoder.norm.weight"] == 1
    assert towers["critic"]["decoder.norm.weight"] == 2
    assert towers["c_critic"]["decoder.norm.weight"] == 3
