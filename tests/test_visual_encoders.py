"""NonTx (transformer-free) visual fusion encoder."""

import jax
import jax.numpy as jnp
import numpy as np

from safevla_tpu.models.visual_encoders import NonTxEncoderConfig, NonTxVisualEncoder


def _make(cfg=None):
    cfg = cfg or NonTxEncoderConfig(
        compressor_hidden_dims=(16, 8),
        text_adapter_output_dim=8,
        image_text_combiner_hidden_dims=(12, 6),
        final_out_dim=32,
        dtype=jnp.float32,
    )
    enc = NonTxVisualEncoder(cfg)
    frames = {
        "rgb_nav": jnp.asarray(np.random.default_rng(0).normal(size=(2, 3, 7, 12, 24)), jnp.float32),
        "rgb_manip": jnp.asarray(np.random.default_rng(1).normal(size=(2, 3, 7, 12, 24)), jnp.float32),
    }
    text = jnp.asarray(np.random.default_rng(2).normal(size=(2, 5, 20)), jnp.float32)
    params = enc.init(jax.random.PRNGKey(0), frames, text)
    return enc, params, frames, text


def test_shapes_and_dtypes():
    enc, params, frames, text = _make()
    fused, text_feats = jax.jit(enc.apply)(params, frames, text)
    assert fused.shape == (2, 3, 32) and fused.dtype == jnp.float32
    assert text_feats.shape == (2, 5, 32)


def test_weights_shared_across_cameras():
    """Same weights process both cameras (reference uses one compressor and
    one combiner module for all sensors, text_cond_visual_encoder.py:315,332):
    identical frames in both cameras -> identical per-camera halves feeding
    the final adapter, checked by swap-invariance of the fused output."""
    enc, params, frames, text = _make()
    same = {"rgb_nav": frames["rgb_nav"], "rgb_manip": frames["rgb_nav"]}
    swapped = {"rgb_nav": frames["rgb_manip"], "rgb_manip": frames["rgb_manip"]}
    f1, _ = enc.apply(params, same, text)
    f2, _ = enc.apply(params, swapped, text)
    # sanity: different inputs -> different outputs
    assert not np.allclose(np.asarray(f1), np.asarray(f2))
    # the parameter tree has exactly one compressor/combiner stack
    names = set(params["params"].keys())
    assert {"comp0", "comp1", "comb0", "comb1"} <= names
    assert not any(k.startswith("rgb_") for k in names)


def test_text_conditions_output():
    enc, params, frames, text = _make()
    f1, _ = enc.apply(params, frames, text)
    f2, _ = enc.apply(params, frames, text * 2.0)
    assert not np.allclose(np.asarray(f1), np.asarray(f2))
