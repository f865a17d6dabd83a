"""Checkpoint/resume and profiling utility tests (SURVEY.md §5 analogues)."""

import os
import time
from typing import NamedTuple

import numpy as np
import jax.numpy as jnp
import pytest

from bifrost3d_tpu.utils import (
    FrameTimer,
    StageTimings,
    latest_checkpoint,
    load_checkpoint,
    save_checkpoint,
)


class AccumState(NamedTuple):
    buffer: jnp.ndarray
    count: jnp.ndarray


class TestCheckpoint:
    def test_roundtrip_namedtuple(self, tmp_path):
        state = AccumState(buffer=jnp.arange(12, dtype=jnp.float32).reshape(3, 4),
                           count=jnp.uint32(7))
        p = save_checkpoint(str(tmp_path / "ckpt_7.npz"), state, step=7,
                            metadata={"scene": "CornellBox"})
        like = AccumState(buffer=jnp.zeros((3, 4), jnp.float32),
                          count=jnp.uint32(0))
        restored, step, meta = load_checkpoint(p, like=like)
        assert step == 7
        assert meta["scene"] == "CornellBox"
        np.testing.assert_array_equal(np.asarray(restored.buffer),
                                      np.asarray(state.buffer))
        assert int(restored.count) == 7
        assert restored.buffer.dtype == jnp.float32

    def test_roundtrip_nested_dict(self, tmp_path):
        tree = {"params": {"tint": jnp.ones(3), "roughness": jnp.float32(0.4)},
                "opt": [jnp.zeros(3), jnp.zeros(3)]}
        p = save_checkpoint(str(tmp_path / "c.npz"), tree)
        restored, step, _ = load_checkpoint(p, like=tree)
        assert step is None
        np.testing.assert_allclose(np.asarray(restored["params"]["roughness"]), 0.4)
        assert len(restored["opt"]) == 2

    def test_flat_load_without_template(self, tmp_path):
        p = save_checkpoint(str(tmp_path / "c.npz"), {"a": jnp.ones(2)})
        flat, _, _ = load_checkpoint(p)
        assert "a" in flat

    def test_structure_mismatch_raises(self, tmp_path):
        p = save_checkpoint(str(tmp_path / "c.npz"), {"a": jnp.ones(2)})
        with pytest.raises(ValueError):
            load_checkpoint(p, like={"b": jnp.ones(2)})
        with pytest.raises(ValueError):
            load_checkpoint(p, like={"a": jnp.ones(2), "c": jnp.ones(1)})

    def test_latest_checkpoint(self, tmp_path):
        assert latest_checkpoint(str(tmp_path)) is None
        for step in (1, 12, 3):
            save_checkpoint(str(tmp_path / f"ckpt_{step}.npz"),
                            {"x": jnp.zeros(1)}, step=step)
        best = latest_checkpoint(str(tmp_path))
        assert best.endswith("ckpt_12.npz")

    def test_resume_progressive_accumulation(self, tmp_path):
        """The renderer use case: save mid-progression, resume, and the
        final accumulation matches an uninterrupted run."""
        buf = jnp.zeros((4, 4, 3), jnp.float32)
        frames = [jnp.full((4, 4, 3), float(i + 1)) for i in range(6)]

        def accumulate(buf, n, frame):
            return buf + (frame - buf) / (n + 1.0)

        uninterrupted = buf
        for i, f in enumerate(frames):
            uninterrupted = accumulate(uninterrupted, i, f)

        partial = buf
        for i, f in enumerate(frames[:3]):
            partial = accumulate(partial, i, f)
        p = save_checkpoint(str(tmp_path / "ckpt_3.npz"),
                            AccumState(partial, jnp.uint32(3)), step=3)
        restored, step, _ = load_checkpoint(
            p, like=AccumState(buf, jnp.uint32(0)))
        resumed = restored.buffer
        for i, f in enumerate(frames[3:]):
            resumed = accumulate(resumed, step + i, f)
        np.testing.assert_allclose(np.asarray(resumed),
                                   np.asarray(uninterrupted), rtol=1e-6)


class TestProfiling:
    def test_stage_timings(self):
        t = StageTimings()
        with t.scope("shade"):
            time.sleep(0.01)
        with t.scope("shade"):
            time.sleep(0.01)
        with t.scope("trace", jnp.ones(8) * 2):
            pass
        acc = t.timings()
        assert acc["shade"][1] == 2
        assert acc["shade"][0] >= 0.02
        assert "trace" in t.report()
        t.reset()
        assert not t.timings()

    def test_frame_timer(self):
        ft = FrameTimer(window=4)
        assert ft.fps == 0.0
        for i in range(6):
            ft.tick(now=i * 0.1)
        assert abs(ft.fps - 10.0) < 1e-6
