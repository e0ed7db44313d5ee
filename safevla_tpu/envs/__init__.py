from safevla_tpu.envs.controller_base import BaseController, Event
from safevla_tpu.envs.fake_controller import FakeController

__all__ = ["BaseController", "Event", "FakeController"]
