"""Vectorized environment pool: N task samplers stepping in parallel.

Replaces the engine-side `VectorSampledTasks` the reference leans on (forked
AllenAct; one sampler subprocess per rollout stream, SURVEY §2.3) with an
owned pool:

  * `num_workers > 0`: one OS process per sampler (the AI2-THOR Unity binary
    is single-threaded per controller — processes are required), communicating
    over pipes with auto-restart on death.
  * inline mode (`num_workers == 0`): all samplers stepped in the calling
    process — for tests, FakeController benchmarking, and debugging.

Each stream auto-resets: when an episode ends the worker immediately samples
the next task and returns the fresh observation plus the new instruction, so
the TPU-side rollout never stalls on episode boundaries.
"""

from __future__ import annotations

import multiprocessing as mp
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional


@dataclass
class EnvStep:
    obs: Dict[str, Any]
    reward: float
    cost: float
    done: bool
    new_episode: bool  # True if obs belongs to a freshly-reset episode
    instruction: Optional[str]  # set when new_episode
    metrics: Optional[Dict[str, Any]] = None  # completed episode's metrics
    info: Dict[str, Any] = field(default_factory=dict)


def _episode_start(sampler, force_advance: bool):
    task = sampler.next_task(force_advance_scene=force_advance)
    if task is None:
        return None, None
    obs = task.get_observations()
    instruction = task.task_info.get("natural_language_spec", "")
    return task, (obs, instruction)


class _InlineStream:
    def __init__(self, sampler_factory: Callable, stream_id: int):
        self.sampler = sampler_factory(stream_id)
        self.task = None

    def reset(self, force_advance: bool = False):
        self.task, payload = _episode_start(self.sampler, force_advance)
        if payload is None:
            return None
        obs, instruction = payload
        return EnvStep(
            obs=obs, reward=0.0, cost=0.0, done=False,
            new_episode=True, instruction=instruction,
        )

    def step(self, action: int, force_advance: bool = False) -> EnvStep:
        if self.task is None:
            # stream exhausted (finite eval): inert step
            return EnvStep(
                obs=None, reward=0.0, cost=0.0, done=True,
                new_episode=False, instruction=None,
            )
        res = self.task.step(action)
        if res.done:
            metrics = self.task.metrics()
            nxt = self.reset(force_advance)
            if nxt is None:
                return EnvStep(
                    obs=res.observation, reward=res.reward, cost=res.cost,
                    done=True, new_episode=False, instruction=None,
                    metrics=metrics, info=res.info,
                )
            return EnvStep(
                obs=nxt.obs, reward=res.reward, cost=res.cost, done=True,
                new_episode=True, instruction=nxt.instruction,
                metrics=metrics, info=res.info,
            )
        return EnvStep(
            obs=res.observation, reward=res.reward, cost=res.cost,
            done=False, new_episode=False, instruction=None, info=res.info,
        )


_FRAME_KEYS = ("rgb_raw", "manipulation_rgb_raw")


def _detach_frames(step: "EnvStep", ring) -> "EnvStep":
    """Move camera frames out of the pickled payload into the shm ring."""
    if ring is None or step is None or step.obs is None:
        return step
    import numpy as np

    obs = dict(step.obs)
    meta = []
    for key in _FRAME_KEYS:
        if key in obs:
            frame = np.ascontiguousarray(obs.pop(key))
            ring.push(frame)
            meta.append((key, frame.shape, str(frame.dtype)))
    obs["__ring_frames__"] = meta
    step.obs = obs
    return step


def _attach_frames(step: "EnvStep", ring) -> "EnvStep":
    if ring is None or step is None or step.obs is None:
        return step
    import numpy as np

    obs = dict(step.obs)
    meta = obs.pop("__ring_frames__", [])
    for key, shape, dtype in meta:
        data, _ = ring.pop()
        obs[key] = data.view(np.dtype(dtype)).reshape(shape)
    step.obs = obs
    return step


def _worker_main(conn, sampler_factory: Callable, stream_id: int, shm_name=None,
                 shm_slots: int = 8, shm_slot_bytes: int = 0):
    try:
        ring = None
        if shm_name is not None:
            from safevla_tpu.native import ObsRing

            ring = ObsRing(shm_name, shm_slots, shm_slot_bytes, create=False)
        stream = _InlineStream(sampler_factory, stream_id)
        first = stream.reset()
        conn.send(("ready", _detach_frames(first, ring)))
        while True:
            msg = conn.recv()
            cmd = msg[0]
            if cmd == "step":
                _, action, force_advance = msg
                conn.send(("step", _detach_frames(stream.step(action, force_advance), ring)))
            elif cmd == "reset":
                conn.send(("reset", _detach_frames(stream.reset(force_advance=msg[1]), ring)))
            elif cmd == "close":
                stream.sampler.close()
                conn.send(("closed", None))
                return
            else:
                conn.send(("error", f"unknown command {cmd}"))
    except Exception as e:  # pragma: no cover - crash path
        import traceback

        try:
            conn.send(("crash", (repr(e), traceback.format_exc())))
        except Exception:
            pass


class EnvPool:
    """B parallel environment streams with a step/collect API.

    Process workers self-heal: a crashed worker (simulator death the sampler
    couldn't recover from) is respawned up to `max_restarts` times and its
    stream resumes with a fresh episode — the pool-level analog of the
    reference's controller-reallocation + crash-recovery machinery
    (reference abstract_task_sampler.py:196-225, allenact_trainer.py:56-69).
    """

    def __init__(
        self,
        sampler_factory: Callable[[int], Any],
        num_streams: int,
        num_workers: Optional[int] = None,
        mp_context: str = "forkserver",
        use_shm_frames: bool = False,
        shm_slot_bytes: int = 2 * 1024 * 1024,
        shm_slots: int = 8,
        max_restarts: int = 10,
        step_timeout_s: Optional[float] = 300.0,
        startup_timeout_s: Optional[float] = 600.0,
    ):
        # liveness defense: a worker that HANGS (alive but unresponsive — the
        # classic stuck-Unity failure the reference guards with SIGALRM,
        # online_evaluator.py:43-57, and a 1200s THOR server timeout) is
        # killed and restarted after step_timeout_s. None disables.
        self.step_timeout_s = step_timeout_s
        self.startup_timeout_s = startup_timeout_s
        self.max_restarts = max_restarts
        self.restarts = 0
        self.num_streams = num_streams
        self.use_processes = (num_workers or 0) > 0
        self._streams: List[_InlineStream] = []
        self._conns = []
        self._procs = []
        self._rings: List[Any] = []
        self._sampler_factory = sampler_factory
        self._mp_context = mp_context
        self.last_steps: List[Optional[EnvStep]] = [None] * num_streams

        if self.use_processes:
            shm_names = [None] * num_streams
            if use_shm_frames:
                from safevla_tpu.native import ObsRing, native_available

                if native_available():
                    import os as _os

                    shm_names = [
                        f"/safevla_obs_{_os.getpid()}_{i}" for i in range(num_streams)
                    ]
                    # the pool side creates/owns the rings (consumer)
                    self._rings = [
                        ObsRing(n, shm_slots, shm_slot_bytes, create=True)
                        for n in shm_names
                    ]
            self._shm_names = shm_names
            self._shm_slots = shm_slots
            self._shm_slot_bytes = shm_slot_bytes
            ctx = mp.get_context(mp_context)
            self._ctx = ctx
            for i in range(num_streams):
                parent, child = ctx.Pipe()
                p = ctx.Process(
                    target=_worker_main,
                    args=(child, sampler_factory, i, shm_names[i], shm_slots, shm_slot_bytes),
                    daemon=True,
                )
                p.start()
                self._conns.append(parent)
                self._procs.append(p)
            if not self._rings:
                self._rings = [None] * num_streams
            for i, conn in enumerate(self._conns):
                tag, first = conn.recv()
                if tag == "crash":
                    raise RuntimeError(f"env worker {i} crashed at startup: {first[1]}")
                self.last_steps[i] = _attach_frames(first, self._rings[i])
        else:
            for i in range(num_streams):
                s = _InlineStream(sampler_factory, i)
                self._streams.append(s)
                self.last_steps[i] = s.reset()

    # ------------------------------------------------------------------
    def _restart_worker(self, i: int) -> EnvStep:
        """Respawn a dead worker; returns the fresh episode's first step."""
        if self.restarts >= self.max_restarts:
            raise RuntimeError(
                f"env worker {i} crashed and the restart budget "
                f"({self.max_restarts}) is exhausted"
            )
        self.restarts += 1
        try:
            self._procs[i].terminate()
        except Exception:
            pass
        parent, child = self._ctx.Pipe()
        p = self._ctx.Process(
            target=_worker_main,
            args=(
                child, self._sampler_factory, i,
                self._shm_names[i], self._shm_slots, self._shm_slot_bytes,
            ),
            daemon=True,
        )
        p.start()
        self._conns[i] = parent
        self._procs[i] = p
        if self.startup_timeout_s is not None and not parent.poll(self.startup_timeout_s):
            p.kill()
            raise RuntimeError(
                f"env worker {i} hung at restart (no ready message within "
                f"{self.startup_timeout_s}s)"
            )
        tag, first = parent.recv()
        if tag == "crash":
            raise RuntimeError(f"env worker {i} crashed again at restart: {first[1]}")
        first = _attach_frames(first, self._rings[i] if self._rings else None)
        # surface the restart as an episode boundary (done + new episode)
        first.done = True
        return first

    def _recv_step(self, i: int) -> EnvStep:
        try:
            if self.step_timeout_s is not None and not self._conns[i].poll(
                self.step_timeout_s
            ):
                # worker is alive but unresponsive: kill it so the pipe EOFs
                # deterministically, then restart
                import sys

                print(
                    f"env worker {i} hung (> {self.step_timeout_s}s without a "
                    f"step result); killing and restarting "
                    f"({self.restarts + 1}/{self.max_restarts})",
                    file=sys.stderr,
                )
                try:
                    self._procs[i].kill()
                except Exception:
                    pass
                return self._restart_worker(i)
            tag, payload = self._conns[i].recv()
        except (EOFError, ConnectionResetError):
            tag, payload = "crash", ("worker pipe closed", "pipe EOF")
        if tag == "crash":
            import sys

            print(
                f"env worker {i} crashed ({payload[0]}); restarting "
                f"({self.restarts + 1}/{self.max_restarts})",
                file=sys.stderr,
            )
            return self._restart_worker(i)
        return _attach_frames(payload, self._rings[i] if self._rings else None)

    def initial_steps(self) -> List[EnvStep]:
        return list(self.last_steps)

    def step_slice(
        self,
        start: int,
        stop: int,
        actions: List[int],
        force_advance: Optional[List[bool]] = None,
    ) -> List[EnvStep]:
        """Step only streams [start:stop) (used by pipelined rollout groups)."""
        force_advance = force_advance or [False] * (stop - start)
        if self.use_processes:
            for i, (a, f) in enumerate(zip(actions, force_advance)):
                try:
                    self._conns[start + i].send(("step", int(a), bool(f)))
                except (BrokenPipeError, OSError):
                    pass  # surfaced by _recv_step as a crash
            out = [self._recv_step(i) for i in range(start, stop)]
        else:
            out = [
                self._streams[start + i].step(int(a), bool(f))
                for i, (a, f) in enumerate(zip(actions, force_advance))
            ]
        self.last_steps[start:stop] = out
        return out

    def step(
        self, actions: List[int], force_advance: Optional[List[bool]] = None
    ) -> List[EnvStep]:
        force_advance = force_advance or [False] * self.num_streams
        if self.use_processes:
            for conn, a, f in zip(self._conns, actions, force_advance):
                try:
                    conn.send(("step", int(a), bool(f)))
                except (BrokenPipeError, OSError):
                    pass  # surfaced by _recv_step as a crash
            out = [self._recv_step(i) for i in range(self.num_streams)]
        else:
            out = [
                s.step(int(a), bool(f))
                for s, a, f in zip(self._streams, actions, force_advance)
            ]
        self.last_steps = out
        return out

    def close(self):
        if self.use_processes:
            for conn in self._conns:
                try:
                    conn.send(("close",))
                except Exception:
                    pass
            for p in self._procs:
                p.join(timeout=5)
                if p.is_alive():
                    p.terminate()
            for r in self._rings:
                if r is not None:
                    r.close()
        else:
            for s in self._streams:
                s.sampler.close()
