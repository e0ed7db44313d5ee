"""Lowering policy for depth-stacked scans: platform/site defaults, env
overrides, and the lowering-only invariant (identical param trees).

Reference behavior being preserved: the stacked modules must produce the
same param tree regardless of lowering so torch importers
(models/convert.py) and checkpoints are lowering-agnostic.
"""
import warnings

import jax
import jax.numpy as jnp
import pytest

from safevla_tpu.models import scan_policy
from safevla_tpu.models.scan_policy import stack_unroll, trace_site


def test_platform_default_is_rolled_on_cpu(monkeypatch):
    monkeypatch.delenv("SAFEVLA_TOWER_UNROLL", raising=False)
    # tests run on CPU (conftest); TPU would return depth here
    assert stack_unroll(12, "SAFEVLA_TOWER_UNROLL") == 1


@pytest.mark.parametrize("flag,expect", [("1", 12), ("0", 1)])
def test_module_env_override(monkeypatch, flag, expect):
    monkeypatch.setenv("SAFEVLA_TOWER_UNROLL", flag)
    assert stack_unroll(12, "SAFEVLA_TOWER_UNROLL") == expect


def test_invalid_override_warns_and_uses_default(monkeypatch):
    monkeypatch.setenv("SAFEVLA_TOWER_UNROLL", "true")
    with pytest.warns(UserWarning, match="SAFEVLA_TOWER_UNROLL"):
        assert stack_unroll(12, "SAFEVLA_TOWER_UNROLL") == 1


def test_act_site_follows_platform_default(monkeypatch):
    """r5: the act site uses the PLATFORM default (rolled act measured 672 s
    cold-compile vs 75 s unrolled on TPU — scan_policy.py docstring). On CPU
    (this suite) that is rolled."""
    monkeypatch.delenv("SAFEVLA_ACT_UNROLL", raising=False)
    monkeypatch.delenv("SAFEVLA_TOWER_UNROLL", raising=False)
    with trace_site("act"):
        assert stack_unroll(12, "SAFEVLA_TOWER_UNROLL") == 1
        assert scan_policy.current_trace_site() == "act"
    assert scan_policy.current_trace_site() is None
    monkeypatch.setattr(scan_policy, "on_tpu", lambda: True)
    with trace_site("act"):
        assert stack_unroll(12, "SAFEVLA_TOWER_UNROLL") == 12
    with trace_site("init"):
        assert stack_unroll(12, "SAFEVLA_VIT_UNROLL") == 1


def test_partial_unroll_factor(monkeypatch):
    """k >= 2 means partial unroll: k iterations per loop body, capped at
    depth (a 12-layer scan with k=16 is just fully unrolled)."""
    with trace_site("act"):
        monkeypatch.setenv("SAFEVLA_ACT_UNROLL", "4")
        assert stack_unroll(12, "SAFEVLA_TOWER_UNROLL") == 4
        monkeypatch.setenv("SAFEVLA_ACT_UNROLL", "16")
        assert stack_unroll(12, "SAFEVLA_TOWER_UNROLL") == 12
    monkeypatch.setenv("SAFEVLA_TOWER_UNROLL", "3")
    assert stack_unroll(12, "SAFEVLA_TOWER_UNROLL") == 3


def test_partial_unroll_invalid_values(monkeypatch):
    for bad in ("-2", "1.5", "true"):
        monkeypatch.setenv("SAFEVLA_TOWER_UNROLL", bad)
        with pytest.warns(UserWarning, match="SAFEVLA_TOWER_UNROLL"):
            assert stack_unroll(12, "SAFEVLA_TOWER_UNROLL") == 1


def test_site_env_beats_module_env(monkeypatch):
    monkeypatch.setenv("SAFEVLA_ACT_UNROLL", "1")
    monkeypatch.setenv("SAFEVLA_TOWER_UNROLL", "0")
    with trace_site("act"):
        assert stack_unroll(12, "SAFEVLA_TOWER_UNROLL") == 12
    # outside the site the module env rules
    assert stack_unroll(12, "SAFEVLA_TOWER_UNROLL") == 1


def test_module_env_applies_inside_site_when_site_env_unset(monkeypatch):
    monkeypatch.delenv("SAFEVLA_ACT_UNROLL", raising=False)
    monkeypatch.setenv("SAFEVLA_TOWER_UNROLL", "1")
    with trace_site("act"):
        assert stack_unroll(12, "SAFEVLA_TOWER_UNROLL") == 12


def test_init_site_defaults_to_rolled(monkeypatch):
    monkeypatch.delenv("SAFEVLA_INIT_UNROLL", raising=False)
    with trace_site("init"):
        assert stack_unroll(12, "SAFEVLA_VIT_UNROLL") == 1
    monkeypatch.setenv("SAFEVLA_INIT_UNROLL", "1")
    with trace_site("init"):
        assert stack_unroll(12, "SAFEVLA_VIT_UNROLL") == 12


def test_nested_sites_restore(monkeypatch):
    with trace_site("act"):
        with trace_site("init"):
            assert scan_policy.current_trace_site() == "init"
        assert scan_policy.current_trace_site() == "act"


def test_lowering_does_not_change_param_tree(monkeypatch, tiny_model_cfg):
    """Rolled vs unrolled init must produce the identical param tree —
    importers/checkpoints are lowering-agnostic (scan_policy.py docstring)."""
    from safevla_tpu.models.actor_critic import SafeVLAPolicy

    trees = {}
    for flag in ("0", "1"):
        monkeypatch.setenv("SAFEVLA_TOWER_UNROLL", flag)
        monkeypatch.setenv("SAFEVLA_VIT_UNROLL", flag)
        pol = SafeVLAPolicy(tiny_model_cfg)
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            trees[flag] = jax.eval_shape(pol.init_params, jax.random.PRNGKey(0))
    s0 = jax.tree_util.tree_structure(trees["0"])
    s1 = jax.tree_util.tree_structure(trees["1"])
    assert s0 == s1
    shapes0 = [x.shape for x in jax.tree_util.tree_leaves(trees["0"])]
    shapes1 = [x.shape for x in jax.tree_util.tree_leaves(trees["1"])]
    assert shapes0 == shapes1
