"""Minimal import-time stubs so the ACTUAL reference tower/loss source at
/root/reference can execute on this box (no gym/allenact/open_clip/omnisafe
installed — they are import-time-only for the modules we oracle against).

The stubs reproduce ONLY the tiny public surfaces the reference modules touch:
  * gym.spaces.{Discrete,Dict,Box} — carriers for .n / .spaces / .shape
  * allenact LinearActorHead / LinearCriticHead — the two linear heads
    (same init/forward as the public allenact source)
  * allenact PPO / AbstractActorCriticLoss — hyperparameter carriers for the
    loss classes (clip_param, value_loss_coef, entropy_coef, adv_key, ...)
  * ActorCriticOutput / Memory / CategoricalDistr — plain data carriers
  * VisualNavActorCritic — nn.Module base storing action/observation spaces
  * open_clip / clip / omnisafe — unused-at-runtime import placeholders

Everything numerically interesting (compressor, fusion transformer, decoder,
heads, the PPO-Lagrangian math) runs from the reference's OWN source files.
"""

import sys
import types

import torch
import torch.nn as nn

REF_ROOT = "/root/reference"


def _module(name):
    import importlib.machinery

    mod = types.ModuleType(name)
    mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
    mod.__path__ = []  # every stub acts as a package so submodules resolve
    sys.modules[name] = mod
    return mod


class _Discrete:
    def __init__(self, n):
        self.n = n


class _SpaceDict:
    def __init__(self, spaces):
        self.spaces = dict(spaces)


class _Box:
    def __init__(self, low=None, high=None, shape=None, dtype=None):
        self.shape = tuple(shape) if shape is not None else None


class CategoricalDistr:
    """Thin wrapper with the two methods the losses call; defers to
    torch.distributions.Categorical for the math."""

    def __init__(self, logits):
        self.logits = logits
        self._d = torch.distributions.Categorical(logits=logits)

    def log_prob(self, actions):
        return self._d.log_prob(actions)

    def entropy(self):
        return self._d.entropy()

    def mode(self):
        return self.logits.argmax(-1)


class _Subscriptable(type):
    def __getitem__(cls, item):
        return cls


class ActorCriticOutput(metaclass=_Subscriptable):
    def __init__(self, distributions=None, values=None, extras=None):
        self.distributions = distributions
        self.values = values
        self.extras = extras or {}


class SafeActorCriticOutput(ActorCriticOutput):
    def __init__(self, distributions=None, values=None, c_values=None, extras=None):
        super().__init__(distributions, values, extras)
        self.c_values = c_values


class Memory(dict, metaclass=_Subscriptable):
    pass


class LinearActorHead(nn.Module):
    """allenact.algorithms.onpolicy_sync.policy.LinearActorHead (public
    source): orthogonal(gain=0.01) linear -> CategoricalDistr."""

    def __init__(self, num_inputs, num_outputs):
        super().__init__()
        self.linear = nn.Linear(num_inputs, num_outputs)
        nn.init.orthogonal_(self.linear.weight, gain=0.01)
        nn.init.constant_(self.linear.bias, 0)

    def forward(self, x):
        return CategoricalDistr(logits=self.linear(x))


class LinearCriticHead(nn.Module):
    def __init__(self, input_size):
        super().__init__()
        self.fc = nn.Linear(input_size, 1)
        nn.init.orthogonal_(self.fc.weight)
        nn.init.constant_(self.fc.bias, 0)

    def forward(self, x):
        return self.fc(x).view(*x.shape[:2], -1)


class VisualNavActorCritic(nn.Module):
    """Base-class surface used by DinoLLAMATxNavActorCritic: stores spaces
    and sizes; aux-model creation is a no-op (auxiliary_uuids is None in
    every reference experiment config)."""

    def __init__(
        self,
        action_space,
        observation_space,
        hidden_size,
        multiple_beliefs=False,
        beliefs_fusion=None,
        auxiliary_uuids=None,
        **kwargs,
    ):
        super().__init__()
        self.action_space = action_space
        self.observation_space = observation_space
        self._hidden_size = hidden_size
        self.multiple_beliefs = multiple_beliefs
        self.beliefs_fusion = beliefs_fusion
        self.auxiliary_uuids = auxiliary_uuids

    def create_aux_models(self, obs_embed_size, action_embed_size):
        self.aux_models = nn.ModuleDict()


class AbstractActorCriticLoss:
    def __init__(self, *args, **kwargs):
        pass


class PPO(AbstractActorCriticLoss):
    """Hyperparameter surface of allenact's PPO loss base (public source);
    loss_per_step/loss are overridden by the reference subclasses."""

    def __init__(
        self,
        clip_param,
        value_loss_coef,
        entropy_coef,
        use_clipped_value_loss=True,
        clip_decay=None,
        entropy_method_name="entropy",
        normalize_advantage=True,
        *args,
        **kwargs,
    ):
        super().__init__(*args, **kwargs)
        self.clip_param = clip_param
        self.value_loss_coef = value_loss_coef
        self.entropy_coef = entropy_coef
        self.use_clipped_value_loss = use_clipped_value_loss
        self.clip_decay = clip_decay if clip_decay is not None else (lambda x: 1.0)
        self.entropy_method_name = entropy_method_name
        self.adv_key = "norm_adv_targ" if normalize_advantage else "adv_targ"


def install_reference_stubs():
    """Idempotently install the stub modules and put /root/reference on
    sys.path (APPENDED — repo modules always win)."""
    if "gym" not in sys.modules:
        gym = _module("gym")
        spaces = _module("gym.spaces")
        spaces.Discrete = _Discrete
        spaces.Dict = _SpaceDict
        spaces.Box = _Box
        gym.spaces = spaces

    if "allenact" not in sys.modules:
        _module("allenact")
        _module("allenact.algorithms")
        _module("allenact.algorithms.onpolicy_sync")
        pol = _module("allenact.algorithms.onpolicy_sync.policy")
        pol.DistributionType = object
        pol.ObservationType = dict
        pol.LinearActorHead = LinearActorHead
        pol.LinearCriticHead = LinearCriticHead
        losses_pkg = _module("allenact.algorithms.onpolicy_sync.losses")
        losses_pkg.PPO = PPO
        abstract = _module("allenact.algorithms.onpolicy_sync.losses.abstract_loss")
        abstract.AbstractActorCriticLoss = AbstractActorCriticLoss
        abstract.ObservationType = dict
        _module("allenact.base_abstractions")
        misc = _module("allenact.base_abstractions.misc")
        misc.ActorCriticOutput = ActorCriticOutput
        misc.SafeActorCriticOutput = SafeActorCriticOutput
        misc.Memory = Memory
        distributions = _module("allenact.base_abstractions.distributions")
        distributions.Distr = CategoricalDistr
        distributions.CategoricalDistr = CategoricalDistr
        sensor_mod = _module("allenact.base_abstractions.sensor")

        class _RefSensor:
            def __init__(self, *a, **k):
                for key, val in k.items():
                    setattr(self, key, val)

        sensor_mod.Sensor = _RefSensor
        sensor_mod.SensorSuite = type("SensorSuite", (), {})
        task_mod = _module("allenact.base_abstractions.task")
        task_mod.Task = type("Task", (), {})
        task_mod.SubTaskType = object
        misc_utils = _module("allenact.utils.misc_utils")

        def prepare_locals_for_super(local_vars, ignore_kwargs=False):
            local_vars = {
                k: v for k, v in local_vars.items()
                if k not in ("self", "__class__", "kwargs")
            }
            return local_vars

        misc_utils.prepare_locals_for_super = prepare_locals_for_super
        _module("allenact.embodiedai")
        _module("allenact.embodiedai.aux_losses")
        aux = _module("allenact.embodiedai.aux_losses.losses")

        class MultiAuxTaskNegEntropyLoss:
            UUID = "multitask_entropy"

        aux.MultiAuxTaskNegEntropyLoss = MultiAuxTaskNegEntropyLoss
        _module("allenact.embodiedai.models")
        vnm = _module("allenact.embodiedai.models.visual_nav_models")
        vnm.FusionType = object
        vnm.VisualNavActorCritic = VisualNavActorCritic
        system = _module("allenact.utils.system")
        _module("allenact.utils")
        sys.modules["allenact.utils.system"] = system
        import logging

        system.get_logger = lambda: logging.getLogger("ref_stub")

    if "open_clip" not in sys.modules:
        oc = _module("open_clip")
        oc.__path__ = []  # mark as package so submodule imports resolve
        oc.create_model_from_pretrained = lambda *a, **k: (_ for _ in ()).throw(
            RuntimeError("open_clip stub: not available offline")
        )
        oc.get_tokenizer = lambda *a, **k: (_ for _ in ()).throw(
            RuntimeError("open_clip stub: not available offline")
        )
        oc.tokenize = oc.get_tokenizer
        oct_mod = _module("open_clip.transformer")
        oct_mod.TextTransformer = type("TextTransformer", (nn.Module,), {})
        oc.transformer = oct_mod
        tok_mod = _module("open_clip.tokenizer")
        tok_mod.HFTokenizer = type("HFTokenizer", (), {})
        oc.tokenizer = tok_mod

    if "clip" not in sys.modules:
        clip = _module("clip")
        clip.load = lambda *a, **k: (_ for _ in ()).throw(
            RuntimeError("clip stub: not available offline")
        )

    if "torchvision" not in sys.modules:
        import importlib.machinery

        tv = _module("torchvision")
        tv.__path__ = []
        tv.__version__ = "0.0.0"

        class _AnyAttr(types.ModuleType):
            def __getattr__(self, name):
                if name.startswith("__"):
                    raise AttributeError(name)
                # transforms are referenced at class-definition time in the
                # reference preprocessors; any attribute resolves to a
                # do-nothing callable factory
                return lambda *a, **k: (lambda x: x)

        for sub in ("transforms", "io", "models"):
            m = _AnyAttr(f"torchvision.{sub}")
            m.__spec__ = importlib.machinery.ModuleSpec(f"torchvision.{sub}", None)
            m.__path__ = []
            sys.modules[f"torchvision.{sub}"] = m
            setattr(tv, sub, m)

    if "ai2thor" not in sys.modules:
        ai2thor = _module("ai2thor")
        ai2thor.__path__ = []
        for sub in ("fifo_server", "hooks", "platform", "controller", "util"):
            m = _module(f"ai2thor.{sub}")
            m.__path__ = []
            setattr(ai2thor, sub, m)
        sys.modules["ai2thor.fifo_server"].FifoServer = type("FifoServer", (), {})
        sys.modules["ai2thor.hooks"].ObjaverseAssetHook = type(
            "ObjaverseAssetHook", (), {}
        )
        sys.modules["ai2thor.platform"].CloudRendering = type("CloudRendering", (), {})
        util_mod = sys.modules["ai2thor.util"]
        runtime_assets = _module("ai2thor.util.runtime_assets")
        runtime_assets.save_with_asset_generator = lambda *a, **k: None
        util_mod.runtime_assets = runtime_assets
        hooks_pkg = sys.modules["ai2thor.hooks"]
        proc_mod = _module("ai2thor.hooks.procedural_asset_hook")

        class ProceduralAssetHookRunner:
            def __init__(self, *a, **k):
                pass

        proc_mod.ProceduralAssetHookRunner = ProceduralAssetHookRunner
        proc_mod.get_all_asset_ids_recursively = lambda *a, **k: []
        proc_mod.create_assets_if_not_exist = lambda *a, **k: None
        hooks_pkg.procedural_asset_hook = proc_mod

    if "objathor" not in sys.modules:
        objathor = _module("objathor")
        objathor.__path__ = []
        for sub in ("asset_conversion", "dataset"):
            m = _module(f"objathor.{sub}")
            m.__path__ = []
            setattr(objathor, sub, m)

    if "compress_json" not in sys.modules:
        cj = _module("compress_json")
        cj.load = lambda *a, **k: {}
        cj.dump = lambda *a, **k: None

    if "compress_pickle" not in sys.modules:
        cp = _module("compress_pickle")
        cp.load = lambda *a, **k: {}
        cp.dump = lambda *a, **k: None

    if "omnisafe" not in sys.modules:
        _module("omnisafe")
        _module("omnisafe.common")
        lagrange_mod = _module("omnisafe.common.lagrange")

        class Lagrange:  # constructor surface only; unused by loss_per_step
            def __init__(self, *a, **k):
                pass

        lagrange_mod.Lagrange = Lagrange

    if REF_ROOT not in sys.path:
        sys.path.append(REF_ROOT)

    # task_spec_to_instruction needs the wordnet2022 corpus at import time
    # (zero egress on this box); the tower only calls convert_byte_to_string
    # from string_utils, so the instruction registry can be empty.
    if "utils.task_spec_to_instruction" not in sys.modules:
        import importlib

        importlib.import_module("utils")  # the reference's real utils package
        tsi = _module("utils.task_spec_to_instruction")
        tsi.REGISTERED_INSTRUCTION_TYPES = {}

    # The transformer_models package __init__ eagerly imports the whole
    # offline-model stack; the tower only needs text_cond_visual_encoder.
    # Register the package with the REAL directory on its __path__ but an
    # empty body, then pre-load text_cond_visual_encoder from source with
    # ONE textual patch: py3.12 rejects the mutable TransformerConfig
    # instance default (dataclasses gained the unhashable-default check
    # after the reference's py3.9 era) -> make TransformerConfig frozen,
    # which is semantics-preserving (it is never mutated).
    pkg_name = "architecture.models.transformer_models"
    if pkg_name not in sys.modules:
        import importlib

        importlib.import_module("architecture.models")  # real (empty) inits
        pkg = _module(pkg_name)
        pkg_dir = f"{REF_ROOT}/architecture/models/transformer_models"
        pkg.__path__ = [pkg_dir]

        tcv_name = f"{pkg_name}.text_cond_visual_encoder"
        src = open(f"{pkg_dir}/text_cond_visual_encoder.py").read()
        patched = src.replace(
            "@dataclass\nclass TransformerConfig:",
            "@dataclass(frozen=True)\nclass TransformerConfig:",
        )
        assert patched != src, "py3.12 dataclass patch target not found"
        tcv = _module(tcv_name)
        tcv.__file__ = f"{pkg_dir}/text_cond_visual_encoder.py"
        exec(compile(patched, tcv.__file__, "exec"), tcv.__dict__)
        pkg.text_cond_visual_encoder = tcv


class TinyT5Stub(nn.Module):
    """Replaces the frozen t5-small download inside DinoTxGoalEncoder. The
    tower oracle patches DinoTxGoalEncoder.distribute_target to inject
    precomputed text encodings, so this model's weights are never used."""

    def __init__(self):
        super().__init__()

    @staticmethod
    def from_pretrained(name):
        return TinyT5Stub()

    def forward(self, **kwargs):
        raise RuntimeError("TinyT5Stub should never run — distribute_target is patched")


class TokenizerStub:
    @staticmethod
    def from_pretrained(name):
        return TokenizerStub()

    def __call__(self, *a, **k):
        raise RuntimeError("TokenizerStub should never run")
