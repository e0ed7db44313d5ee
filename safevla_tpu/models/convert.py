"""Torch checkpoint importers: reference SafeVLA weights -> safevla_tpu pytrees.

The reference publishes/loads three formats (SURVEY §3.5):
  * Lightning IL ckpt: {"state_dict": {"model.<k>": v}} (train_pl.py:289-302)
  * AllenAct RL ckpt:  {"model_state_dict": {<k>: v}} (allenact_trainer resume)
  * raw state dict:    {<k>: v}
with tower prefixes "" (actor), "critic_tsfm." (reward critic),
"c_critic_tsfm." (cost critic) for the separate-critic model
(reference separate_actor_critic.py:8-37).

`import_reference_state_dict` maps one tower's torch keys onto the flax tower
param tree produced by `PolicyTower`; `load_reference_checkpoint` assembles
all three towers (stacked on the leading axis) and, when the checkpoint lacks
critic towers (plain DinoLLAMATxNavActorCritic IL ckpts), initializes the
missing towers from the actor tower — matching the reference's behavior of
loading the IL policy into every tower at RL start.

Frozen-encoder converters (`import_dinov2`, `import_t5`) map the torch-hub
DINOv2 and HF T5 naming onto safevla_tpu.models.vit / t5, including one-time
positional-embedding interpolation to the fixed 16x27 grid.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


def _t(x) -> np.ndarray:
    """torch tensor -> numpy (transposes applied by callers)."""
    try:
        return x.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(x)


def _linear(sd: Dict[str, Any], prefix: str, bias: bool = True) -> Dict[str, np.ndarray]:
    out = {"kernel": _t(sd[f"{prefix}.weight"]).T}
    if bias and f"{prefix}.bias" in sd:
        out["bias"] = _t(sd[f"{prefix}.bias"])
    return out


def _layernorm(sd: Dict[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    return {"scale": _t(sd[f"{prefix}.weight"]), "bias": _t(sd[f"{prefix}.bias"])}


def _rmsnorm(sd: Dict[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    return {"weight": _t(sd[f"{prefix}.weight"])}


# ---------------------------------------------------------------------------
# tower import (fusion encoder + decoder + heads)
# ---------------------------------------------------------------------------


def import_tower_state_dict(
    sd: Dict[str, Any],
    num_tx_layers: int = 3,
    combiner_layers: int = 3,
    critic_type: str = "linear",
    use_manipulation_camera: bool = True,
) -> Dict[str, Any]:
    """One reference tower's state dict -> flax PolicyTower param tree.

    Key map (reference allenact_dino_transformer.py):
      visual_encoder.visual_compressor.{0,2}   -> compressor{0,1} (1x1 convs)
      visual_encoder.visual_adapter.{0,1}      -> visual_adapter_fc / _ln
      visual_encoder.text_adapter.{0,1}        -> text_adapter_fc / _ln
      visual_encoder.fusion_token              -> fusion_token
      visual_encoder.visual_sensor_token_*     -> nav/manip_camera_token
      visual_encoder.fusion_xformer.layers.N.* -> fusion.layers (first N-1,
          depth-stacked scan leaves) / fusion.layer_last
      last_actions_embed.weight                -> prev_action_embed
      object_in_hand_embed.weight              -> object_in_hand_embed
      decoder.layers.N.{attention.w*,feed_forward.w*,*_norm} -> decoder.layers
          (depth-stacked scan leaves)
      decoder.{norm,output}                    -> decoder.{norm,output}
      actor.linear                             -> actor_head
      critic.fc                                -> critic_head
    """
    p: Dict[str, Any] = {}
    ve = "visual_encoder"

    # conv1x1 compressors: torch Conv2d weight (out, in, 1, 1) -> dense (in, out)
    w0 = _t(sd[f"{ve}.visual_compressor.0.weight"])[:, :, 0, 0].T
    w1 = _t(sd[f"{ve}.visual_compressor.2.weight"])[:, :, 0, 0].T
    p["compressor0"] = {"kernel": w0, "bias": _t(sd[f"{ve}.visual_compressor.0.bias"])}
    p["compressor1"] = {"kernel": w1, "bias": _t(sd[f"{ve}.visual_compressor.2.bias"])}

    p["visual_adapter_fc"] = _linear(sd, f"{ve}.visual_adapter.0")
    p["visual_adapter_ln"] = _layernorm(sd, f"{ve}.visual_adapter.1")
    p["text_adapter_fc"] = _linear(sd, f"{ve}.text_adapter.0")
    p["text_adapter_ln"] = _layernorm(sd, f"{ve}.text_adapter.1")
    p["fusion_token"] = _t(sd[f"{ve}.fusion_token"])
    p["nav_camera_token"] = _t(sd[f"{ve}.visual_sensor_token_raw_navigation_camera"])
    if use_manipulation_camera:
        p["manip_camera_token"] = _t(
            sd[f"{ve}.visual_sensor_token_raw_manipulation_camera"]
        )

    def _fusion_layer(i):
        fp = f"{ve}.fusion_xformer.layers.{i}"
        return {
            "self_attn": {
                "in_proj_weight": _t(sd[f"{fp}.self_attn.in_proj_weight"]),
                "in_proj_bias": _t(sd[f"{fp}.self_attn.in_proj_bias"]),
                "out_proj": _linear(sd, f"{fp}.self_attn.out_proj"),
            },
            "linear1": _linear(sd, f"{fp}.linear1"),
            "linear2": _linear(sd, f"{fp}.linear2"),
            "norm1": _layernorm(sd, f"{fp}.norm1"),
            "norm2": _layernorm(sd, f"{fp}.norm2"),
        }

    # first n-1 layers depth-stacked for the scan module, last separate
    fusion: Dict[str, Any] = {"layer_last": _fusion_layer(combiner_layers - 1)}
    if combiner_layers > 1:
        fusion["layers"] = _stack_blocks(
            [_fusion_layer(i) for i in range(combiner_layers - 1)]
        )
    p["fusion"] = fusion

    p["prev_action_embed"] = _t(sd["last_actions_embed.weight"])
    if "object_in_hand_embed.weight" in sd:
        p["object_in_hand_embed"] = _t(sd["object_in_hand_embed.weight"])

    def _decoder_layer(i):
        dp = f"decoder.layers.{i}"
        return {
            "attention": {
                "wq": _linear(sd, f"{dp}.attention.wq", bias=False),
                "wk": _linear(sd, f"{dp}.attention.wk", bias=False),
                "wv": _linear(sd, f"{dp}.attention.wv", bias=False),
                "wo": _linear(sd, f"{dp}.attention.wo", bias=False),
            },
            "feed_forward": {
                "w1": _linear(sd, f"{dp}.feed_forward.w1", bias=False),
                "w2": _linear(sd, f"{dp}.feed_forward.w2", bias=False),
                "w3": _linear(sd, f"{dp}.feed_forward.w3", bias=False),
            },
            "attention_norm": _rmsnorm(sd, f"{dp}.attention_norm"),
            "ffn_norm": _rmsnorm(sd, f"{dp}.ffn_norm"),
        }

    # all decoder layers depth-stacked for the scan module
    dec: Dict[str, Any] = {
        "layers": _stack_blocks([_decoder_layer(i) for i in range(num_tx_layers)])
    }
    dec["norm"] = _rmsnorm(sd, "decoder.norm")
    dec["output"] = _linear(sd, "decoder.output", bias=False)
    p["decoder"] = dec

    p["actor_head"] = _linear(sd, "actor.linear")
    if critic_type == "linear":
        p["critic_head"] = _linear(sd, "critic.fc")
    else:
        # Sequential critic: layers_0/2(/4)
        layers = {}
        idx = 0
        for i in (0, 2, 4):
            if f"critic.fc.{i}.weight" in sd:
                layers[f"layers_{idx}"] = _linear(sd, f"critic.fc.{i}")
                idx += 2
        p["critic_head"] = layers
    return {"params": p}


def split_tower_state_dicts(flat_sd: Dict[str, Any]) -> Dict[str, Dict[str, Any]]:
    """Split a separate-critic state dict into per-tower dicts keyed by role."""
    towers: Dict[str, Dict[str, Any]] = {"actor": {}, "critic": {}, "c_critic": {}}
    for k, v in flat_sd.items():
        if k.startswith("c_critic_tsfm."):
            towers["c_critic"][k[len("c_critic_tsfm.") :]] = v
        elif k.startswith("critic_tsfm."):
            towers["critic"][k[len("critic_tsfm.") :]] = v
        else:
            towers["actor"][k] = v
    return towers


def normalize_reference_checkpoint(ckpt: Dict[str, Any]) -> Dict[str, Any]:
    """Unwrap the three reference container formats to a flat state dict."""
    if "model_state_dict" in ckpt:
        sd = ckpt["model_state_dict"]
    elif "state_dict" in ckpt:
        sd = {
            (k[len("model.") :] if k.startswith("model.") else k): v
            for k, v in ckpt["state_dict"].items()
        }
    else:
        sd = ckpt
    # IL checkpoints name the actor head "actor.weight/bias"
    # (reference train_utils.py remaps to actor.linear.*)
    out = {}
    for k, v in sd.items():
        if k.startswith("actor.") and not k.startswith("actor.linear."):
            k = "actor.linear." + k[len("actor.") :]
        out[k] = v
    return out


def _tower_import_kwargs(cfg) -> Dict[str, Any]:
    """Importer layout must follow the run's model config, not the defaults —
    e.g. critic_type="discrete" has a Sequential critic head, and deeper
    decoders/combiners have more layers to map."""
    if cfg is None:
        return {}
    m = getattr(cfg, "model", cfg)
    return dict(
        num_tx_layers=m.num_tx_layers,
        combiner_layers=m.combiner_layers,
        critic_type=m.critic_type,
        use_manipulation_camera=m.use_manipulation_camera,
    )


def import_stacked_towers_from_torch(path: str, cfg=None, num_towers: int = 3):
    """Torch SafeVLA checkpoint (any of the 3 reference container formats) ->
    stacked tower params (towers, ...). Missing critic towers are initialized
    from the actor tower (the reference loads the IL policy into every tower
    at RL start)."""
    import torch
    import jax
    import jax.numpy as jnp

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    flat = normalize_reference_checkpoint(ckpt)
    towers = split_tower_state_dicts(flat)
    kw = _tower_import_kwargs(cfg)

    actor = import_tower_state_dict(towers["actor"], **kw)
    critic = (
        import_tower_state_dict(towers["critic"], **kw) if towers["critic"] else actor
    )
    c_critic = (
        import_tower_state_dict(towers["c_critic"], **kw)
        if towers["c_critic"]
        else actor
    )
    if num_towers == 3:
        return jax.tree.map(
            lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), actor, critic, c_critic
        )
    return jax.tree.map(lambda x: jnp.asarray(x)[None], actor)


def load_reference_checkpoint(path: str, train_state, cfg=None):
    """Load a torch SafeVLA checkpoint into a TrainState (tower params only)."""
    import jax

    template = train_state.tower_params
    num_towers = jax.tree.leaves(template)[0].shape[0]
    stacked = import_stacked_towers_from_torch(path, cfg=cfg, num_towers=num_towers)

    # shape-check against the template
    def check(a, b):
        assert a.shape == b.shape, f"shape mismatch: {a.shape} vs {b.shape}"
        return a.astype(b.dtype)

    stacked = jax.tree.map(check, stacked, template)
    return train_state._replace(tower_params=stacked)


# ---------------------------------------------------------------------------
# frozen encoders
# ---------------------------------------------------------------------------


def interpolate_pos_embed(
    pos_embed: np.ndarray, src_grid: tuple, dst_grid: tuple
) -> np.ndarray:
    """Bicubic-interpolate ViT patch position embeddings (1, 1+S, D) ->
    (1, 1+G, D) for the target grid, once, at conversion time (the reference
    re-interpolates inside every DINOv2 forward)."""
    try:
        import torch
        import torch.nn.functional as F

        cls_tok, patch = pos_embed[:, :1], pos_embed[:, 1:]
        sh, sw = src_grid
        dh, dw = dst_grid
        t = torch.from_numpy(np.ascontiguousarray(patch)).reshape(1, sh, sw, -1)
        t = t.permute(0, 3, 1, 2)
        t = F.interpolate(t, size=(dh, dw), mode="bicubic", antialias=True)
        t = t.permute(0, 2, 3, 1).reshape(1, dh * dw, -1).numpy()
        return np.concatenate([cls_tok, t], axis=1)
    except ImportError:  # numpy bilinear fallback
        from scipy.ndimage import zoom  # pragma: no cover

        cls_tok, patch = pos_embed[:, :1], pos_embed[:, 1:]
        sh, sw = src_grid
        dh, dw = dst_grid
        t = patch.reshape(sh, sw, -1)
        t = zoom(t, (dh / sh, dw / sw, 1), order=3)
        return np.concatenate([cls_tok, t.reshape(1, dh * dw, -1)], axis=1)


def _stack_blocks(blocks):
    """Per-layer param dicts -> one dict with depth-stacked leaves (the
    nn.scan layout DinoViT consumes)."""
    first = blocks[0]
    if isinstance(first, dict):
        return {k: _stack_blocks([b[k] for b in blocks]) for k in first}
    return np.stack(blocks)


def import_dinov2(sd: Dict[str, Any], depth: int = 12, grid=(16, 27)) -> Dict[str, Any]:
    """torch-hub dinov2_vits14 state dict -> safevla_tpu.models.vit params."""
    p: Dict[str, Any] = {}
    # patch embed: torch conv (D, 3, P, P) -> (P, P, 3, D) matmul layout
    p["patch_embed_kernel"] = _t(sd["patch_embed.proj.weight"]).transpose(2, 3, 1, 0)
    p["patch_embed_bias"] = _t(sd["patch_embed.proj.bias"])
    p["cls_token"] = _t(sd["cls_token"])
    pos = _t(sd["pos_embed"])
    n_src = pos.shape[1] - 1
    side = int(round(n_src**0.5))
    p["pos_embed"] = interpolate_pos_embed(pos, (side, side), grid)
    blocks = [
        {
            "norm1": _layernorm(sd, f"blocks.{i}.norm1"),
            "norm2": _layernorm(sd, f"blocks.{i}.norm2"),
            "attn": {
                "qkv": _linear(sd, f"blocks.{i}.attn.qkv"),
                "proj": _linear(sd, f"blocks.{i}.attn.proj"),
            },
            "mlp_fc1": _linear(sd, f"blocks.{i}.mlp.fc1"),
            "mlp_fc2": _linear(sd, f"blocks.{i}.mlp.fc2"),
            "ls1_gamma": _t(sd[f"blocks.{i}.ls1.gamma"]),
            "ls2_gamma": _t(sd[f"blocks.{i}.ls2.gamma"]),
        }
        for i in range(depth)
    ]
    p["blocks"] = _stack_blocks(blocks)
    p["norm"] = _layernorm(sd, "norm")
    return {"params": p}


def _strip_prefix(sd: Dict[str, Any], prefix: str) -> Dict[str, Any]:
    if any(k.startswith(prefix) for k in sd):
        return {k[len(prefix) :]: v for k, v in sd.items() if k.startswith(prefix)}
    return sd


def import_siglip_trunk(sd: Dict[str, Any], depth: int = 12) -> Dict[str, Any]:
    """open_clip/timm SigLIP ViT trunk state dict -> safevla_tpu.models.vit
    params (patch-only trunk: no cls token, no layerscale; reference
    siglip_preprocessors.py:18-33 uses model.visual.trunk.forward_features).

    Accepts either bare timm-ViT keys (patch_embed.proj...) or the full
    open_clip checkpoint (visual.trunk.*-prefixed)."""
    sd = _strip_prefix(sd, "visual.trunk.")
    p: Dict[str, Any] = {}
    p["patch_embed_kernel"] = _t(sd["patch_embed.proj.weight"]).transpose(2, 3, 1, 0)
    p["patch_embed_bias"] = _t(sd["patch_embed.proj.bias"])
    # SigLIP-256 pos_embed is already the (16, 16) grid: no interpolation
    p["pos_embed"] = _t(sd["pos_embed"])
    blocks = [
        {
            "norm1": _layernorm(sd, f"blocks.{i}.norm1"),
            "norm2": _layernorm(sd, f"blocks.{i}.norm2"),
            "attn": {
                "qkv": _linear(sd, f"blocks.{i}.attn.qkv"),
                "proj": _linear(sd, f"blocks.{i}.attn.proj"),
            },
            "mlp_fc1": _linear(sd, f"blocks.{i}.mlp.fc1"),
            "mlp_fc2": _linear(sd, f"blocks.{i}.mlp.fc2"),
        }
        for i in range(depth)
    ]
    p["blocks"] = _stack_blocks(blocks)
    p["norm"] = _layernorm(sd, "norm")
    return {"params": p}


def import_siglip_text(sd: Dict[str, Any], num_layers: int = 12) -> Dict[str, Any]:
    """open_clip SigLIP text tower (TextTransformer) state dict ->
    safevla_tpu.models.text_towers.SigLIPTextEncoder params.

    Accepts bare TextTransformer keys (token_embedding...) or the full
    open_clip checkpoint (text.*-prefixed)."""
    sd = _strip_prefix(sd, "text.")
    p: Dict[str, Any] = {
        "token_embed": _t(sd["token_embedding.weight"]),
        "pos_embed": _t(sd["positional_embedding"]),
        "final_ln": _layernorm(sd, "ln_final"),
    }
    for i in range(num_layers):
        bp = f"transformer.resblocks.{i}"
        p[f"block_{i}"] = {
            "ln1": _layernorm(sd, f"{bp}.ln_1"),
            "ln2": _layernorm(sd, f"{bp}.ln_2"),
            # torch MHA packed in_proj (3D, D) rows [q;k;v] -> Dense (D, 3D)
            "qkv": {
                "kernel": _t(sd[f"{bp}.attn.in_proj_weight"]).T,
                "bias": _t(sd[f"{bp}.attn.in_proj_bias"]),
            },
            "proj": _linear(sd, f"{bp}.attn.out_proj"),
            "fc1": _linear(sd, f"{bp}.mlp.c_fc"),
            "fc2": _linear(sd, f"{bp}.mlp.c_proj"),
        }
    return {"params": p}


def import_t5(sd: Dict[str, Any], num_layers: int = 6) -> Dict[str, Any]:
    """HF T5EncoderModel state dict -> safevla_tpu.models.t5 params."""
    p: Dict[str, Any] = {"token_embed": _t(sd["shared.weight"])}
    for i in range(num_layers):
        bp = f"encoder.block.{i}"
        blk = {
            "attn_norm": {"weight": _t(sd[f"{bp}.layer.0.layer_norm.weight"])},
            "attn": {
                "q": _linear(sd, f"{bp}.layer.0.SelfAttention.q", bias=False),
                "k": _linear(sd, f"{bp}.layer.0.SelfAttention.k", bias=False),
                "v": _linear(sd, f"{bp}.layer.0.SelfAttention.v", bias=False),
                "o": _linear(sd, f"{bp}.layer.0.SelfAttention.o", bias=False),
            },
            "ffn_norm": {"weight": _t(sd[f"{bp}.layer.1.layer_norm.weight"])},
            "wi": _linear(sd, f"{bp}.layer.1.DenseReluDense.wi", bias=False),
            "wo": _linear(sd, f"{bp}.layer.1.DenseReluDense.wo", bias=False),
        }
        if i == 0:
            blk["attn"]["relative_attention_bias"] = _t(
                sd[f"{bp}.layer.0.SelfAttention.relative_attention_bias.weight"]
            )
        p[f"block_{i}"] = blk
    p["final_norm"] = {"weight": _t(sd["encoder.final_layer_norm.weight"])}
    return {"params": p}
