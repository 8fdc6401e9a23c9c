"""Parameter tuning / debounced rebuild tests (vs common.rs:847-1165) and
profiling utilities."""

import pytest

from pitchvis_tpu.core.config import VqtParameters, VqtRange
from pitchvis_tpu.core.tuning import REBUILD_DEBOUNCE_SECS, ParameterTuner
from pitchvis_tpu.utils.profiling import StageTimer


class FakeClock:
    def __init__(self):
        self.t = 0.0

    def __call__(self):
        return self.t


class TestTuner:
    def _tuner(self):
        clock = FakeClock()
        params = VqtParameters(
            n_fft=8192, range=VqtRange(min_freq=110.0, octaves=4, buckets_per_octave=24)
        )
        return ParameterTuner(params, clock=clock), clock

    def test_clamped_adjustment(self):
        tuner, _ = self._tuner()
        assert tuner.adjust_vqt("quality", delta=100.0) == 5.0  # clamped hi
        assert tuner.adjust_vqt("quality", value=0.0) == 0.5  # clamped lo
        assert tuner.adjust_analysis("peak_config.min_height", delta=100.0) == 15.0
        assert tuner.adjust_analysis("highest_bassnote", value=500) == 60
        assert isinstance(tuner.analysis_params.highest_bassnote, int)

    def test_analysis_changes_apply_immediately(self):
        tuner, _ = self._tuner()
        tuner.adjust_analysis("harmonic_threshold", value=0.5)
        assert tuner.analysis_params.harmonic_threshold == 0.5
        assert not tuner.pending_rebuild()

    def test_vqt_rebuild_debounced(self):
        tuner, clock = self._tuner()
        tuner.adjust_vqt("quality", value=2.0)
        assert tuner.pending_rebuild()
        assert tuner.take_rebuilt() is None  # still debouncing
        clock.t += REBUILD_DEBOUNCE_SECS + 0.1
        new = tuner.take_rebuilt()
        assert new is not None and new.quality == 2.0
        assert tuner.vqt_params.quality == 2.0
        assert not tuner.pending_rebuild()

    def test_further_changes_extend_debounce(self):
        tuner, clock = self._tuner()
        tuner.adjust_vqt("gamma", value=10.0)
        clock.t += REBUILD_DEBOUNCE_SECS - 0.5
        tuner.adjust_vqt("gamma", delta=1.0)  # resets the timer
        clock.t += 1.0
        assert tuner.take_rebuilt() is None
        clock.t += REBUILD_DEBOUNCE_SECS
        assert tuner.take_rebuilt().gamma == 11.0

    def test_reset(self):
        """reset() routes the VQT revert through the rebuild handshake: a
        caller that only rebuilds when take_rebuilt() returns must receive
        the default parameters (previously reset cleared the pending state,
        leaving the old tuned kernel serving forever)."""
        tuner, clock = self._tuner()
        tuner.adjust_analysis("harmonic_threshold", value=0.7)
        tuner.adjust_vqt("quality", value=3.0)
        defaults = tuner._defaults[0]
        tuner.reset()
        assert tuner.analysis_params.harmonic_threshold == pytest.approx(0.3)
        assert tuner.pending_rebuild()  # the revert must be emitted
        clock.t += 3.0
        assert tuner.take_rebuilt() == defaults
        assert tuner.vqt_params == defaults
        # a second reset with nothing tuned is a no-op
        tuner.reset()
        assert not tuner.pending_rebuild()

    def test_rebuild_failure_resets_through_handshake(self):
        """A failed rebuild reverts to defaults THROUGH the handshake
        (common.rs:1137-1161's log+reset): vqt_params keeps matching the
        still-served kernel, and the next take_rebuilt() — debounce
        pre-elapsed — delivers the defaults for the caller to swap in."""
        import dataclasses

        from pitchvis_tpu.core.errors import VqtError

        tuner, clock = self._tuner()
        defaults = tuner._defaults[0]
        tuner.adjust_vqt("quality", value=2.0)
        clock.t += REBUILD_DEBOUNCE_SECS + 0.1
        # inject an unbuildable combination (window exceeds n_fft)
        tuner._pending_vqt = dataclasses.replace(
            tuner._pending_vqt, quality=5.0, gamma=0.01, n_fft=2048
        )
        with pytest.raises(VqtError):
            tuner.take_rebuilt()
        # vqt_params still matches the kernel actually being served (the
        # construction params here — nothing was ever committed)
        assert tuner.vqt_params == defaults
        assert tuner.pending_rebuild()
        got = tuner.take_rebuilt()  # immediately available, no extra debounce
        assert got == defaults
        assert tuner.vqt_params == defaults


class TestStageTimer:
    def test_stage_timing_and_report(self):
        t = StageTimer()
        with t.stage("vqt"):
            pass
        t.observe("analysis", 0.010)
        t.observe("analysis", 0.010)  # fps needs an inter-call gap
        rep = t.report()
        assert "vqt" in rep and "analysis" in rep
        assert rep["analysis"]["last_ms"] == 10.0
        assert rep["analysis"]["count"] == 2
        assert t.fps("analysis") > 0

    def test_fps_is_observed_rate_not_inverse_duration(self):
        """A 1 ms stage invoked every ~20 ms must report the ~50 Hz call
        rate, not its 1000 Hz theoretical maximum (that figure moved to
        max_fps)."""
        import time as _time

        t = StageTimer(horizon=0.05)
        for _ in range(6):
            t.observe("hop", 0.001)
            _time.sleep(0.02)
        assert t.max_fps("hop") > 500.0
        assert 20.0 < t.fps("hop") < 120.0  # ~50 Hz, generous bounds
