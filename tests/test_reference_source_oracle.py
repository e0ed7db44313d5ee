"""Oracles that execute the ACTUAL reference source (not reimplementations).

The reference repo is on disk at /root/reference and these modules import
cleanly with the local torch/scipy:
  * training/online/third_party_models/llama/model.py — the vendored decoder
    with mutable KV caches + sampler_select
  * environment/stretch_state.py — robot state differencing / tolerance /
    coordinate transforms
  * utils/sel_utils.py, utils/bbox_utils.py — metrics and bbox merging

Each test drives the reference code directly and asserts our TPU-native
counterpart matches numerically. This removes the double-entry-bookkeeping
risk of hand-written torch oracles (a misreading could otherwise be encoded
identically on both sides).
"""

import importlib
import math
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

REF_ROOT = "/root/reference"


def _ref_import(modname):
    if REF_ROOT not in sys.path:
        sys.path.append(REF_ROOT)  # append, never prepend: repo modules win
    return importlib.import_module(modname)


ref_llama = _ref_import("training.online.third_party_models.llama.model")
ref_state = _ref_import("environment.stretch_state")
ref_sel = _ref_import("utils.sel_utils")
ref_bbox = _ref_import("utils.bbox_utils")


# ---------------------------------------------------------------------------
# LLaMA decoder: full-sequence, incremental KV, sampler_select
# ---------------------------------------------------------------------------

D, HEADS, LAYERS, MULT = 32, 2, 2, 8
B, T, S = 3, 6, 10  # batch, window, cache/max_seq_len


def _ref_decoder():
    torch.manual_seed(7)
    args = ref_llama.ModelArgs(
        dim=D, n_layers=LAYERS, n_heads=HEADS, vocab_size=D, multiple_of=MULT,
        max_batch_size=B, max_seq_len=S,
    )
    return ref_llama.TransformerDecoder(args).eval()


def _our_decoder_params(ref_dec):
    """Map the reference decoder's state_dict onto our LlamaDecoder params."""
    from safevla_tpu.models.convert import _stack_blocks

    sd = {k: v.detach().numpy() for k, v in ref_dec.state_dict().items()}
    lin = lambda p: {"kernel": sd[p + ".weight"].T}
    norm = lambda p: {"weight": sd[p + ".weight"]}
    layers = _stack_blocks(
        [
            {
                "attention": {w: lin(f"layers.{i}.attention.{w}") for w in ("wq", "wk", "wv", "wo")},
                "feed_forward": {w: lin(f"layers.{i}.feed_forward.{w}") for w in ("w1", "w2", "w3")},
                "attention_norm": norm(f"layers.{i}.attention_norm"),
                "ffn_norm": norm(f"layers.{i}.ffn_norm"),
            }
            for i in range(LAYERS)
        ]
    )
    return {"params": {"layers": layers, "norm": norm("norm"), "output": lin("output")}}


def _our_decoder():
    from safevla_tpu.models.llama_decoder import DecoderConfig, LlamaDecoder

    cfg = DecoderConfig(
        dim=D, n_layers=LAYERS, n_heads=HEADS, multiple_of=MULT,
        max_seq_len=S, dtype=jnp.float32,
    )
    return LlamaDecoder(cfg), cfg


def test_llama_full_seq_matches_reference_source():
    ref = _ref_decoder()
    ours, cfg = _our_decoder()
    params = _our_decoder_params(ref)

    rng = np.random.default_rng(0)
    x = rng.normal(size=(B, T, D)).astype(np.float32)
    with torch.no_grad():
        # mask=None -> the reference builds its own causal additive mask
        ref_out = ref(torch.from_numpy(x), start_pos=0, mask=None).numpy()
    causal = np.tril(np.ones((T, T), bool))[None, None]
    our_out = ours.apply(
        params, jnp.asarray(x), jnp.asarray(np.broadcast_to(causal, (B, 1, T, T))),
        method=ours.full,
    )
    np.testing.assert_allclose(np.asarray(our_out), ref_out, atol=2e-5, rtol=2e-5)


def test_llama_packed_mask_matches_reference_source():
    """Update path: the traj-packed block-causal mask, built exactly as the
    reference does (allenact_dino_transformer.py:398-402), fed to BOTH."""
    from safevla_tpu.ops.masks import packed_block_causal_mask

    ref = _ref_decoder()
    ours, cfg = _our_decoder()
    params = _our_decoder_params(ref)

    rng = np.random.default_rng(1)
    x = rng.normal(size=(B, T, D)).astype(np.float32)
    traj = np.array(
        [[0, 0, 0, 1, 1, 1], [4, 4, 4, 4, 4, 5], [9, 9, 9, 9, 9, 9]], np.int64
    )
    t_traj = torch.from_numpy(traj)
    t_mask = torch.tril(t_traj[:, :, None] == t_traj[:, None, :]).unsqueeze(1)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x), start_pos=0, mask=t_mask).numpy()
    our_out = ours.apply(
        params, jnp.asarray(x), packed_block_causal_mask(jnp.asarray(traj)),
        method=ours.full,
    )
    np.testing.assert_allclose(np.asarray(our_out), ref_out, atol=2e-5, rtol=2e-5)


def test_llama_incremental_kv_matches_reference_source():
    """Rollout path: seqlen==1 decode against the mutable reference cache,
    including mid-stream episode resets (the windowed episode mask the
    reference builds at allenact_dino_transformer.py:388-397)."""
    from safevla_tpu.models.llama_decoder import init_kv_cache
    from safevla_tpu.ops.masks import incremental_episode_mask

    ref = _ref_decoder()
    ours, cfg = _our_decoder()
    params = _our_decoder_params(ref)
    cache = init_kv_cache(cfg, B, dtype=jnp.float32)

    rng = np.random.default_rng(2)
    xs = rng.normal(size=(T, B, 1, D)).astype(np.float32)
    # per-sampler in-episode step counter; sampler 1 resets at pos 3
    time_step = np.zeros((B,), np.int64)
    for pos in range(T):
        if pos == 3:
            time_step[1] = 0
        x_t = torch.from_numpy(xs[pos])
        # reference incremental mask: epi_start <= k <= pos over pos+1 keys
        epi_start = np.maximum(pos - time_step, 0)
        step_range = np.arange(pos + 1)
        t_mask = torch.from_numpy(
            (epi_start[:, None] <= step_range[None, :])
        ).unsqueeze(1).unsqueeze(1)
        with torch.no_grad():
            ref_out = ref(x_t, start_pos=pos, mask=t_mask).numpy()

        our_mask = incremental_episode_mask(
            jnp.asarray(time_step, jnp.int32), jnp.int32(pos), S
        )
        our_out, cache = ours.apply(
            params, jnp.asarray(xs[pos]), cache, jnp.int32(pos), our_mask,
            method=ours.step,
        )
        np.testing.assert_allclose(
            np.asarray(our_out), ref_out, atol=2e-5, rtol=2e-5,
            err_msg=f"divergence at decode position {pos}",
        )
        time_step += 1


def test_llama_sampler_select_matches_reference_source():
    """Cache-row reshuffling on sampler pause/resume: the reference's
    sampler_select buffer surgery (model.py:241-247) vs our pure gather."""
    from safevla_tpu.models.llama_decoder import gather_cache, init_kv_cache
    from safevla_tpu.ops.masks import incremental_episode_mask

    ref = _ref_decoder()
    ours, cfg = _our_decoder()
    params = _our_decoder_params(ref)
    cache = init_kv_cache(cfg, B, dtype=jnp.float32)

    rng = np.random.default_rng(3)
    time_step = np.zeros((B,), np.int64)

    def step_both(x, pos, cache):
        t_mask = torch.from_numpy(
            (np.maximum(pos - time_step, 0)[:, None] <= np.arange(pos + 1)[None, :])
        ).unsqueeze(1).unsqueeze(1)
        with torch.no_grad():
            ref_out = ref(torch.from_numpy(x), start_pos=pos, mask=t_mask).numpy()
        our_mask = incremental_episode_mask(
            jnp.asarray(time_step, jnp.int32), jnp.int32(pos), S
        )
        our_out, cache = ours.apply(
            params, jnp.asarray(x), cache, jnp.int32(pos), our_mask, method=ours.step
        )
        return ref_out, np.asarray(our_out), cache

    for pos in range(3):
        x = rng.normal(size=(B, 1, D)).astype(np.float32)
        r, o, cache = step_both(x, pos, cache)
        np.testing.assert_allclose(o, r, atol=2e-5, rtol=2e-5)
        time_step += 1

    keep = [2, 0, 1]
    ref.sampler_select(keep)
    cache = gather_cache(cache, jnp.asarray(keep))
    time_step = time_step[keep]

    for pos in range(3, 6):
        x = rng.normal(size=(B, 1, D)).astype(np.float32)
        r, o, cache = step_both(x, pos, cache)
        np.testing.assert_allclose(
            o, r, atol=2e-5, rtol=2e-5,
            err_msg=f"post-sampler_select divergence at position {pos}",
        )
        time_step += 1


# ---------------------------------------------------------------------------
# StretchState: difference / tolerance / transforms
# ---------------------------------------------------------------------------


def _random_state_pair(cls, rng, held_before=(), held_after=()):
    def mk(held):
        s = cls()
        s._base_position = {
            "x": float(rng.uniform(-5, 5)), "y": cls.agent_center_y_height,
            "z": float(rng.uniform(-5, 5)), "theta": float(rng.uniform(0, 360)),
        }
        s._wrist_pose = {
            "y": float(rng.uniform(-0.05, 1.0)), "z": float(rng.uniform(0.24, 0.76)),
            "yaw": float(rng.uniform(-180, 180)),
        }
        s._hand_position = {
            "x": float(rng.uniform(-5, 5)), "y": float(rng.uniform(0, 2)),
            "z": float(rng.uniform(-5, 5)),
        }
        # the reference's gripper_openness property hard-returns 0 (THOR has
        # no metadata for it, stretch_state.py:113-116) — keep 0 on both sides
        s._gripper_openness = 0
        s._held_oids = set((True, oid) for oid in held)
        return s

    return mk(held_before), mk(held_after)


@pytest.mark.parametrize("seed", range(5))
def test_stretch_difference_matches_reference_source(seed):
    from safevla_tpu.envs.stretch_state import StretchState

    rng = np.random.default_rng(seed)
    rng2 = np.random.default_rng(seed)
    ref_a, ref_b = _random_state_pair(
        ref_state.StretchState, rng, held_before=["Mug|1"], held_after=["Cup|2"]
    )
    our_a, our_b = _random_state_pair(
        StretchState, rng2, held_before=["Mug|1"], held_after=["Cup|2"]
    )

    ref_d = ref_state.StretchState.difference(ref_b, ref_a)
    our_d = StretchState.difference(our_b, our_a)

    for k in ("x", "z", "theta"):
        assert our_d.base_position[k] == pytest.approx(ref_d.base_position[k], abs=1e-9), k
    for k in ("y", "z", "yaw"):
        assert our_d.wrist_pose[k] == pytest.approx(ref_d.wrist_pose[k], abs=1e-9), k
    for k in ("x", "y", "z"):
        assert our_d.hand_position[k] == pytest.approx(ref_d.hand_position[k], abs=1e-9), k
    assert our_d.held_oids == ref_d.held_oids


@pytest.mark.parametrize("scale", [0.001, 0.008, 0.012, 0.05, 1.0])
def test_stretch_tolerance_matches_reference_source(scale):
    """The controller's moved-enough decision must agree with the reference
    at every motion scale — including the RSS base-distance region where a
    per-axis check would disagree (e.g. dx=1.2*tol, dz=0)."""
    from safevla_tpu.envs.stretch_state import StretchState

    tol_kw = dict(
        diff_base={"x": 0.01, "z": 0.01, "theta": 1.5},
        diff_wrist={"y": 0.005, "z": 0.005, "yaw": 2},
        diff_hand={"x": 100, "y": 100, "z": 100},
        diff_gripper=100,
        diff_held_oids=set(),
    )
    ref_tol = ref_state.StretchState._create_difference_state(**tol_kw)
    our_tol = StretchState._create_difference_state(**tol_kw)

    rng = np.random.default_rng(int(scale * 10000))
    for case in range(20):
        delta_kw = dict(
            diff_base={
                "x": float(rng.normal() * scale), "z": float(rng.normal() * scale),
                "theta": float(rng.normal() * scale * 100),
            },
            diff_wrist={
                "y": float(rng.normal() * scale), "z": float(rng.normal() * scale),
                "yaw": float(rng.normal() * scale * 100),
            },
            diff_hand={
                "x": float(rng.normal() * scale), "y": float(rng.normal() * scale),
                "z": float(rng.normal() * scale),
            },
            diff_gripper=0,
            diff_held_oids=set(),
        )
        ref_ok, _ = ref_state.StretchState.state_change_within_tolerance(
            ref_state.StretchState._create_difference_state(**delta_kw), ref_tol
        )
        our_ok, _ = StretchState.state_change_within_tolerance(
            StretchState._create_difference_state(**delta_kw), our_tol
        )
        assert our_ok == ref_ok, f"case {case}: {delta_kw}"

    # the per-axis-vs-RSS disagreement region, pinned explicitly:
    # dx = 1.2*tol_x exceeds the axis but not sqrt(tol_x^2 + tol_z^2)
    edge = dict(
        diff_base={"x": 0.012, "z": 0.0, "theta": 0.0},
        diff_wrist={"y": 0, "z": 0, "yaw": 0},
        diff_hand={"x": 0, "y": 0, "z": 0},
        diff_gripper=0, diff_held_oids=set(),
    )
    ref_ok, _ = ref_state.StretchState.state_change_within_tolerance(
        ref_state.StretchState._create_difference_state(**edge), ref_tol
    )
    our_ok, _ = StretchState.state_change_within_tolerance(
        StretchState._create_difference_state(**edge), our_tol
    )
    assert our_ok == ref_ok is True


def test_wrist_travel_and_angle_helpers_match_reference_source():
    from safevla_tpu.envs.stretch_state import (
        StretchState,
        angle_point_to_point,
        wrap_angle_to_pm180,
    )

    rng = np.random.default_rng(0)
    for _ in range(200):
        a = float(rng.uniform(-720, 720))
        assert wrap_angle_to_pm180(a) == pytest.approx(
            ref_state.wrap_angle_to_pm180(a), abs=1e-9
        )
    for _ in range(200):
        init, fin = float(rng.uniform(-360, 360)), float(rng.uniform(-360, 360))
        assert StretchState.signed_travel_distance_wrist(init, fin) == pytest.approx(
            ref_state.StretchState.signed_travel_distance_wrist(init, fin), abs=1e-9
        )
    for _ in range(50):
        p = {"x": float(rng.uniform(-5, 5)), "z": float(rng.uniform(-5, 5))}
        q = {"x": float(rng.uniform(-5, 5)), "z": float(rng.uniform(-5, 5))}
        assert angle_point_to_point(p, q) == pytest.approx(
            ref_state.angle_point_to_point(p, q), abs=1e-9
        )


def test_world_agent_transforms_match_reference_source():
    from safevla_tpu.envs.stretch_state import (
        convert_agent_to_world_coordinate,
        convert_world_to_agent_coordinate,
    )

    rng = np.random.default_rng(4)
    for _ in range(25):
        agent = ref_state.StretchState()
        agent._base_position = {
            "x": float(rng.uniform(-5, 5)), "y": agent.agent_center_y_height,
            "z": float(rng.uniform(-5, 5)), "theta": float(rng.uniform(0, 360)),
        }
        world = {
            "x": float(rng.uniform(-5, 5)), "y": float(rng.uniform(0, 2)),
            "z": float(rng.uniform(-5, 5)),
        }
        ref_rel = ref_state.convert_world_to_agent_coordinate(world, agent, arm=False)
        our_rel = convert_world_to_agent_coordinate(
            world,
            {"x": agent.base_position["x"], "y": agent.agent_center_y_height,
             "z": agent.base_position["z"]},
            agent.base_position["theta"],
        )
        for k in ("x", "z"):
            assert our_rel[k] == pytest.approx(ref_rel[k], abs=1e-9), k

        rel = {
            "x": float(rng.uniform(-2, 2)), "y": float(rng.uniform(0, 2)),
            "z": float(rng.uniform(-2, 2)),
        }
        ref_world = ref_state.convert_relative_to_world_coordinate(rel, agent)
        our_world = convert_agent_to_world_coordinate(
            rel,
            {"x": agent.base_position["x"], "y": agent.base_position["y"],
             "z": agent.base_position["z"]},
            agent.base_position["theta"],
        )
        for k in ("x", "y", "z"):
            assert our_world[k] == pytest.approx(ref_world[k], abs=1e-9), k


# ---------------------------------------------------------------------------
# SEL metric + bbox merging
# ---------------------------------------------------------------------------


def test_sel_metric_matches_reference_source():
    from safevla_tpu.utils.metrics import sel_metric

    cases = [
        (False, 10.0, 20.0), (True, -1.0, 5.0), (True, 0.0, 0.0), (True, 0.0, 3.0),
        (True, 10.0, 20.0), (True, 20.0, 10.0), (True, 7.0, 7.0),
    ]
    for success, opt, actual in cases:
        assert sel_metric(success, opt, actual) == ref_sel.sel_metric(
            success, opt, actual
        ), (success, opt, actual)


def test_best_of_two_bboxes_matches_reference_source():
    from safevla_tpu.utils.bbox import get_best_of_two_bboxes

    rng = np.random.default_rng(5)
    b1 = rng.uniform(0, 100, size=(4, 6, 10)).astype(np.float32)
    b2 = rng.uniform(0, 100, size=(4, 6, 10)).astype(np.float32)
    ref_out = ref_bbox.get_best_of_two_bboxes(b1.copy(), b2.copy())
    our_out = get_best_of_two_bboxes(b1.copy(), b2.copy())
    np.testing.assert_allclose(our_out, ref_out)
