"""Oracle that executes the ACTUAL reference policy tower and PPO-Lagrangian
loss source (/root/reference) against our TPU-native implementations.

reference_stubs.py supplies the import-time-only dependency surface
(gym/allenact/open_clip/ai2thor/omnisafe are not installed); everything
numerically relevant — DinoTxGoalEncoder (compressor, adapters, fusion
nn.TransformerEncoder), the vendored LLaMA decoder, the linear heads, the
3-tower Safe separate wiring, and SafePPOLogGrad's penalized surrogate —
runs from the reference's own files:
  * architecture/models/allenact_transformer_models/allenact_dino_transformer.py
  * architecture/models/allenact_transformer_models/separate_actor_critic.py
  * training/online/loss/customized_loss.py

Two reference pieces are patched at runtime, both frozen-encoder concerns our
architecture hoists out of the tower anyway (and parity-tests separately):
  * T5EncoderModel.from_pretrained — zero egress; distribute_target is
    patched to run the tower's own text_adapter on injected text encodings,
    so the trainable text path is still the reference's.
"""

import importlib
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

sys.path.insert(0, "/root/repo/tests")
from reference_stubs import (
    TinyT5Stub,
    TokenizerStub,
    install_reference_stubs,
)

install_reference_stubs()

adt = importlib.import_module(
    "architecture.models.allenact_transformer_models.allenact_dino_transformer"
)
sac = importlib.import_module(
    "architecture.models.allenact_transformer_models.separate_actor_critic"
)
closs = importlib.import_module("training.online.loss.customized_loss")

import gym  # the stub installed above

from safevla_tpu.config import ModelConfig
from safevla_tpu.models.actor_critic import SafeVLAPolicy
from safevla_tpu.models.convert import import_tower_state_dict, split_tower_state_dicts

# tiny-but-structurally-complete dims (text stays 512: the reference
# text_adapter input is hard-coded nn.Linear(512, goal_dims))
A, D, DV = 6, 32, 16
HEADS, TX_LAYERS, COMB_LAYERS = 2, 2, 2
GRID = (2, 3)
L = 5
B, T, S = 2, 4, 12
TEXT_D = 512


@pytest.fixture(scope="module")
def ref_model():
    """The ACTUAL reference SafeDinoLLAMATxNavActorCriticSeparate (3 towers)."""
    torch.manual_seed(11)
    # zero-egress patches: T5 construction + per-call tokenize/encode
    orig_t5, orig_tok = adt.T5EncoderModel, adt.AutoTokenizer
    orig_distribute = adt.DinoTxGoalEncoder.distribute_target
    adt.T5EncoderModel = TinyT5Stub
    adt.AutoTokenizer = TokenizerStub
    adt.DinoTxGoalEncoder.distribute_target = lambda self, obs: self.text_adapter(
        obs["__text_hidden__"]
    )
    try:
        model = sac.SafeDinoLLAMATxNavActorCriticSeparate(
            action_space=gym.spaces.Discrete(A),
            observation_space=gym.spaces.Dict(
                {
                    "dino": gym.spaces.Box(shape=(GRID[0], GRID[1], DV)),
                    "dino_manip": gym.spaces.Box(shape=(GRID[0], GRID[1], DV)),
                    "goal": gym.spaces.Box(shape=(L,)),
                }
            ),
            goal_sensor_uuid="goal",
            rgb_dino_preprocessor_uuid="dino",
            manipulation_rgb_dino_preprocessor_uuid="dino_manip",
            an_object_is_in_hand_uuid="oih",
            time_step_uuid="time_step",
            traj_idx_uuid="traj_idx",
            traj_max_idx=200,
            hidden_size=D,
            num_tx_layers=TX_LAYERS,
            num_tx_heads=HEADS,
            text_embed_size=TEXT_D,
            add_prev_actions=True,
            add_prev_action_null_token=True,
            action_embed_size=D,
            goal_dims=D,
            dino_compressor_hidden_out_dims=(D, D),
            combiner_hidden_out_dims=D,
            combiner_nhead=HEADS,
            combiner_layers=COMB_LAYERS,
            max_steps=S,
            max_steps_for_training=T,
            initial_tgt_cache_shape=(S, B, D),
            critic_type="linear",
        ).eval()
    finally:
        adt.T5EncoderModel = orig_t5
        adt.AutoTokenizer = orig_tok
    yield model
    adt.DinoTxGoalEncoder.distribute_target = orig_distribute


def _our_cfg():
    return ModelConfig(
        num_actions=A, hidden_size=D, num_tx_layers=TX_LAYERS, num_tx_heads=HEADS,
        goal_dims=D, text_embed_size=TEXT_D, combiner_layers=COMB_LAYERS,
        combiner_heads=HEADS, combiner_ffn_dim=2048,  # torch default
        dino_compressor_hidden_out_dims=(D, D), vision_feature_dim=DV,
        vision_grid=GRID, image_size=(GRID[0] * 14, GRID[1] * 14),
        max_steps=S, text_max_tokens=L, num_towers=3,
        compute_dtype="float32", fusion_chunk=0, critic_type="linear",
    )


def _stacked_params(ref_model):
    flat = {k: v.detach() for k, v in ref_model.state_dict().items()}
    towers = split_tower_state_dicts(flat)
    kw = dict(
        num_tx_layers=TX_LAYERS, combiner_layers=COMB_LAYERS, critic_type="linear",
        use_manipulation_camera=True,
    )
    parts = [import_tower_state_dict(towers[r], **kw) for r in ("actor", "critic", "c_critic")]
    return {
        "towers": jax.tree.map(
            lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *parts
        )
    }


def _inputs(seed=0):
    rng = np.random.default_rng(seed)
    gh, gw = GRID
    return dict(
        dino=rng.normal(size=(T, B, gh, gw, DV)).astype(np.float32),
        dino_manip=rng.normal(size=(T, B, gh, gw, DV)).astype(np.float32),
        text=rng.normal(size=(B, L, TEXT_D)).astype(np.float32),
        prev_actions=rng.integers(0, A, (T, B)).astype(np.int64),
        not_reset=np.array(
            [[0, 0], [1, 1], [1, 0], [1, 1]], np.int64
        ),  # sampler 1 resets at t=2
        oih=rng.integers(0, 2, (T, B)).astype(np.int64),
        time_step=np.array([[0, 0], [1, 1], [2, 0], [3, 1]], np.int64),
        traj_idx=np.array([[3, 7], [3, 7], [3, 8], [3, 8]], np.int64),
    )


def _ref_obs_update(x):
    """(T, B) layout observations for the reference update-path forward.
    dino goes channels-first (the DinoViT preprocessor emits (N, C, 7, 12));
    text is injected t-major to mirror adapt_input's flattening order."""
    text_flat = np.repeat(x["text"][None], T, axis=0).reshape(T * B, L, TEXT_D)
    return {
        "dino": torch.from_numpy(x["dino"]).permute(0, 1, 4, 2, 3).contiguous(),
        "dino_manip": torch.from_numpy(x["dino_manip"]).permute(0, 1, 4, 2, 3).contiguous(),
        "goal": torch.zeros((T, B, L), dtype=torch.uint8),
        "__text_hidden__": torch.from_numpy(text_flat),
        "oih": torch.from_numpy(x["oih"][..., None]),
        "time_step": torch.from_numpy(x["time_step"]),
        "traj_idx": torch.from_numpy(x["traj_idx"]),
    }


def test_three_tower_update_forward_matches_reference_source(ref_model):
    """Full-sequence (update-path) forward through the REAL 3-tower reference
    model vs our vmapped-tower forward_seq: logits, values, cost-values."""
    x = _inputs()
    obs = _ref_obs_update(x)
    from reference_stubs import Memory

    with torch.no_grad():
        out, _ = ref_model(
            observations=obs,
            memory=Memory(),
            prev_actions=torch.from_numpy(x["prev_actions"]),
            masks=torch.from_numpy(x["not_reset"][..., None].astype(np.float32)),
        )
    ref_logits = out.distributions.logits.numpy()  # (T, B, A)
    ref_values = out.values.numpy()[..., 0]  # (T, B)
    ref_c_values = out.c_values.numpy()[..., 0]

    policy = SafeVLAPolicy(_our_cfg())
    params = _stacked_params(ref_model)
    to_bt = lambda a: jnp.asarray(np.swapaxes(a, 0, 1))
    ours = policy.forward_seq(
        params,
        to_bt(x["dino"]),
        to_bt(x["dino_manip"]),
        jnp.asarray(x["text"]),
        jnp.ones((B, L), bool),
        to_bt(x["prev_actions"]).astype(jnp.int32),
        to_bt(x["not_reset"]).astype(jnp.int32),
        to_bt(x["oih"]).astype(jnp.int32),
        to_bt(x["time_step"]).astype(jnp.int32),
        to_bt(x["traj_idx"]).astype(jnp.int32),
    )
    np.testing.assert_allclose(
        np.swapaxes(np.asarray(ours.logits), 0, 1), ref_logits, atol=2e-4, rtol=2e-4
    )
    np.testing.assert_allclose(
        np.swapaxes(np.asarray(ours.values), 0, 1), ref_values, atol=2e-4, rtol=2e-4
    )
    np.testing.assert_allclose(
        np.swapaxes(np.asarray(ours.c_values), 0, 1), ref_c_values, atol=2e-4, rtol=2e-4
    )


def test_incremental_rollout_matches_reference_source(ref_model):
    """Rollout-path (seqlen==1 KV-cache decode with the reference's mutable
    time_step_counter) vs our functional act_step, across an episode reset."""
    from reference_stubs import Memory

    x = _inputs(seed=9)
    policy = SafeVLAPolicy(_our_cfg())
    params = _stacked_params(ref_model)
    state = policy.init_state(B, text_len=L)
    state = policy.update_text(
        state, jnp.arange(B), jnp.asarray(x["text"]), jnp.ones((B, L), bool)
    )

    # fresh reference caches/counter for this test
    for tower in (ref_model, ref_model.critic_tsfm, ref_model.c_critic_tsfm):
        tower.time_step_counter = 0
        tower.sampler_select(list(range(B)))

    text_flat = torch.from_numpy(x["text"])
    for t in range(T):
        obs = {
            "dino": torch.from_numpy(x["dino"][t : t + 1]).permute(0, 1, 4, 2, 3).contiguous(),
            "dino_manip": torch.from_numpy(x["dino_manip"][t : t + 1])
            .permute(0, 1, 4, 2, 3)
            .contiguous(),
            "goal": torch.zeros((1, B, L), dtype=torch.uint8),
            "__text_hidden__": text_flat,
            "oih": torch.from_numpy(x["oih"][t : t + 1][..., None]),
            "time_step": torch.from_numpy(x["time_step"][t : t + 1]),
            "traj_idx": torch.from_numpy(x["traj_idx"][t : t + 1]),
        }
        with torch.no_grad():
            out, _ = ref_model(
                observations=obs,
                memory=Memory(),
                prev_actions=torch.from_numpy(x["prev_actions"][t : t + 1]),
                masks=torch.from_numpy(
                    x["not_reset"][t : t + 1][..., None].astype(np.float32)
                ),
            )
        ref_logits = out.distributions.logits.numpy()[0]  # (B, A)
        ref_values = out.values.numpy()[0, :, 0]
        ref_c_values = out.c_values.numpy()[0, :, 0]

        # our act_step derives time_step from carried state + not_reset
        logits, values, c_values, state = policy.act_step(
            params,
            state,
            jnp.asarray(x["dino"][t]),
            jnp.asarray(x["dino_manip"][t]),
            jnp.asarray(x["prev_actions"][t], jnp.int32),
            jnp.asarray(x["not_reset"][t], jnp.int32),
            jnp.asarray(x["oih"][t], jnp.int32),
        )
        np.testing.assert_allclose(
            np.asarray(logits), ref_logits, atol=2e-4, rtol=2e-4,
            err_msg=f"rollout logits diverged at t={t}",
        )
        np.testing.assert_allclose(np.asarray(values), ref_values, atol=2e-4, rtol=2e-4)
        np.testing.assert_allclose(
            np.asarray(c_values), ref_c_values, atol=2e-4, rtol=2e-4
        )


# ---------------------------------------------------------------------------
# SafePPOLogGrad — the actual reference loss math as the oracle
# ---------------------------------------------------------------------------


def test_safe_ppo_log_grad_matches_reference_source():
    """Our PPO-Lagrangian surrogate + value loss vs the reference
    SafePPOLogGrad.loss (customized_loss.py:301-449) executed directly, at
    the production hyperparameters, across several lambda values."""
    from reference_stubs import ActorCriticOutput, CategoricalDistr

    from safevla_tpu.algo import losses as L

    rng = np.random.default_rng(0)
    n = (B, T)
    logits = rng.normal(size=(*n, A)).astype(np.float32)
    actions = rng.integers(0, A, n)
    old_log_probs = np.log(
        np.take_along_axis(
            np.exp(logits - logits.max(-1, keepdims=True))
            / np.exp(logits - logits.max(-1, keepdims=True)).sum(-1, keepdims=True),
            actions[..., None],
            -1,
        )[..., 0]
        + rng.uniform(0.01, 0.1, n)
    ).astype(np.float32)
    adv = rng.normal(size=n).astype(np.float32)
    c_adv = rng.normal(size=n).astype(np.float32)
    values = rng.normal(size=n).astype(np.float32)
    returns = rng.normal(size=n).astype(np.float32)

    loss_obj = closs.SafePPOLogGrad(
        clip_param=0.1, value_loss_coef=0.5, entropy_coef=0.0,
        use_clipped_value_loss=False, action_loss_schedule=None,
        discrete_critics=False, normalize_advantage=False,
    )

    for lam in (0.0, 0.3, 2.5):
        batch = {
            "actions": torch.from_numpy(actions),
            "old_action_log_probs": torch.from_numpy(old_log_probs),
            "adv_targ": torch.from_numpy(adv),
            "c_adv_targ": torch.from_numpy(c_adv),
            "values": torch.from_numpy(values),
            "returns": torch.from_numpy(returns),
        }
        aco = ActorCriticOutput(
            distributions=CategoricalDistr(logits=torch.from_numpy(logits)),
            values=torch.from_numpy(values),
            extras={
                "bias_norm": torch.tensor([0.0]),
                "weight_norm": torch.tensor([0.0]),
            },
        )
        ref_total, ref_info = loss_obj.loss(
            step_count=0, batch=batch, actor_critic_output=aco,
            lagrangian_multiplier=torch.tensor(lam),
        )

        # ours: same decomposition (action + value_loss_coef * value)
        jl = jnp.asarray(logits)
        log_probs = L.categorical_log_prob(jl, jnp.asarray(actions))
        penalized = (jnp.asarray(adv) - lam * jnp.asarray(c_adv)) / (1.0 + lam)
        action_loss = jnp.mean(
            L.clipped_surrogate(
                log_probs, jnp.asarray(old_log_probs), penalized, 0.1
            )
        )
        v_loss = L.value_loss(
            jnp.asarray(values), jnp.asarray(returns), jnp.asarray(values),
            0.1, use_clipped=False,
        )
        our_total = action_loss + 0.5 * v_loss
        assert float(our_total) == pytest.approx(float(ref_total), abs=2e-6), lam
        assert float(action_loss) == pytest.approx(ref_info["action"], abs=2e-6)
        assert float(v_loss) == pytest.approx(ref_info["value"], abs=2e-6)
