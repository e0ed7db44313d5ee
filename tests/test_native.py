"""Native shared-memory observation ring: C++ build + cross-process transport."""

import multiprocessing as mp

import numpy as np
import pytest

from safevla_tpu.native import ObsRing, build_native, native_available

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native obs_ring library unavailable"
)


def test_build_idempotent():
    path = build_native()
    assert path.endswith(".so")


def _producer(name, n):
    ring = ObsRing(name, 4, 1 << 20, create=False)
    for i in range(n):
        ring.push(np.full((64, 64, 3), i % 251, dtype=np.uint8), tag=i)
    ring.close()


def test_cross_process_roundtrip():
    name = "/svtest_xproc"
    ring = ObsRing(name, 4, 1 << 20, create=True)
    p = mp.get_context("fork").Process(target=_producer, args=(name, 30))
    p.start()
    for i in range(30):
        data, tag = ring.pop()
        assert tag == i
        assert data.reshape(64, 64, 3)[0, 0, 0] == i % 251
    p.join()
    ring.close()


def test_pop_into_zero_copy():
    name = "/svtest_popinto"
    ring = ObsRing(name, 4, 1 << 20, create=True)
    frame = np.arange(300, dtype=np.uint8)
    ring.push(frame, tag=7)
    out = np.zeros(300, np.uint8)
    tag = ring.pop_into(out)
    assert tag == 7
    np.testing.assert_array_equal(out, frame)
    ring.close()


def test_oversized_payload_rejected():
    name = "/svtest_oversize"
    ring = ObsRing(name, 2, 1024, create=True)
    with pytest.raises(ValueError):
        ring.push(np.zeros(4096, np.uint8))
    ring.close()


def test_backpressure_timeout():
    name = "/svtest_backpressure"
    ring = ObsRing(name, 2, 1024, create=True)
    ring.push(np.zeros(8, np.uint8))
    ring.push(np.zeros(8, np.uint8))
    with pytest.raises(TimeoutError):
        ring.push(np.zeros(8, np.uint8), timeout_s=0.05)
    ring.close()


def test_env_pool_shm_transport():
    """EnvPool with use_shm_frames: frames travel via shm, not the pipe."""
    from safevla_tpu.rollout.env_pool import EnvPool
    from tests.test_rollout_training import make_sampler_factory

    pool = EnvPool(
        make_sampler_factory(max_steps=6),
        num_streams=2,
        num_workers=2,
        mp_context="fork",
        use_shm_frames=True,
        shm_slot_bytes=1 << 20,
    )
    first = pool.initial_steps()
    assert first[0].obs["rgb_raw"].shape[2] == 3
    out = pool.step([0, 1])
    assert out[0].obs["rgb_raw"].dtype == np.uint8
    assert "__ring_frames__" not in out[0].obs
    pool.close()


class _CrashySampler:
    """Sampler whose controller dies after N steps (simulates Unity death)."""

    def __init__(self, stream_id):
        import os
        import tempfile

        from tests.test_rollout_training import make_sampler_factory

        self.inner = make_sampler_factory(max_steps=100)(stream_id)
        self.steps = 0
        # crash exactly once per stream across process restarts
        self.marker = os.path.join(
            tempfile.gettempdir(), f"svtest_crash_once_{os.getppid()}_{stream_id}"
        )

    def next_task(self, force_advance_scene=False):
        task = self.inner.next_task(force_advance_scene=force_advance_scene)
        outer = self

        class _Wrap:
            def __getattr__(self, k):
                return getattr(task, k)

            def step(self, a):
                import os

                outer.steps += 1
                if outer.steps == 4 and not os.path.exists(outer.marker):
                    open(outer.marker, "w").close()
                    raise RuntimeError("Unity process has exited")
                return task.step(a)

        return _Wrap()

    def close(self):
        self.inner.close()


def test_env_pool_worker_restart():
    """A worker whose simulator dies is respawned and its stream resumes."""
    from safevla_tpu.rollout.env_pool import EnvPool

    pool = EnvPool(
        _CrashySampler, num_streams=2, num_workers=2, mp_context="fork",
        max_restarts=4,
    )
    for t in range(8):
        out = pool.step([0, 0])
        for s in out:
            assert s.obs is not None
    assert pool.restarts >= 1  # stream 0 and 1 both crash at their step 4
    # streams keep producing observations after the restart
    out = pool.step([1, 1])
    assert out[0].obs["rgb_raw"].dtype == np.uint8
    pool.close()


class _HangingSampler:
    """Sampler whose controller hangs (alive, unresponsive) once per stream —
    the stuck-Unity failure mode the reference defends against with SIGALRM
    (reference online_evaluator.py:43-57)."""

    def __init__(self, stream_id):
        import os
        import tempfile

        from tests.test_rollout_training import make_sampler_factory

        self.inner = make_sampler_factory(max_steps=100)(stream_id)
        self.steps = 0
        self.marker = os.path.join(
            tempfile.gettempdir(), f"svtest_hang_once_{os.getppid()}_{stream_id}"
        )

    def next_task(self, force_advance_scene=False):
        task = self.inner.next_task(force_advance_scene=force_advance_scene)
        outer = self

        class _Wrap:
            def __getattr__(self, k):
                return getattr(task, k)

            def step(self, a):
                import os
                import time

                outer.steps += 1
                if outer.steps == 3 and not os.path.exists(outer.marker):
                    open(outer.marker, "w").close()
                    time.sleep(3600)  # hang "forever" (killed by the pool)
                return task.step(a)

        return _Wrap()

    def close(self):
        self.inner.close()


def test_env_pool_hung_worker_timeout():
    """A worker that hangs mid-step is killed after step_timeout_s and its
    stream resumes on a fresh worker."""
    from safevla_tpu.rollout.env_pool import EnvPool

    pool = EnvPool(
        _HangingSampler, num_streams=2, num_workers=2, mp_context="fork",
        max_restarts=4, step_timeout_s=2.0,
    )
    for t in range(6):
        out = pool.step([0, 0])
        for s in out:
            assert s.obs is not None
    assert pool.restarts >= 1  # both streams hang at their step 3
    out = pool.step([1, 1])
    assert out[0].obs["rgb_raw"].dtype == np.uint8
    pool.close()
