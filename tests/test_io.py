"""WAV IO, settings persistence, and xtask CLI tests."""

import numpy as np

from pitchvis_tpu.core.settings import (
    DisplayMode,
    SettingsState,
    VqtSmoothingMode,
    load_settings,
    save_settings,
)
from pitchvis_tpu.io.wav import frames_from_signal, load_wav, save_wav


class TestWav:
    def test_roundtrip(self, tmp_path):
        sr = 22050
        t = np.arange(sr) / sr
        x = (0.5 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32)
        path = str(tmp_path / "t.wav")
        save_wav(path, x, sr)
        y, sr2 = load_wav(path)
        assert sr2 == sr
        assert len(y) == len(x)
        # 16-bit quantization + 32767-vs-32768 scale convention
        np.testing.assert_allclose(y, x, atol=2.0 / 32768.0)

    def test_frames_from_signal(self):
        x = np.arange(1000, dtype=np.float32)
        frames = frames_from_signal(x, n_fft=256, hop=100)
        assert frames.shape == (10, 256)
        # frame i ends at sample (i+1)*hop - 1
        assert frames[0, -1] == x[99]
        assert frames[4, -1] == x[499]
        # zero-padded history before the signal starts
        assert frames[0, 0] == 0.0

    def test_fuzzed_wav_typed_rejection(self, tmp_path):
        """Same malformed-asset contract as the SMF/SF2 parsers: truncation
        at every offset plus 2k random byte corruptions either parse or
        raise ValueError — never wave.Error/EOFError/reshape crashes. A
        torn final frame (truncated data chunk) is dropped, not fatal."""
        import random

        sr = 22050
        x = (0.3 * np.sin(2 * np.pi * 440.0 * np.arange(200) / sr)).astype(np.float32)
        path = str(tmp_path / "f.wav")
        save_wav(path, x, sr)
        base = open(path, "rb").read()
        cpath = str(tmp_path / "c.wav")

        def check(data: bytes):
            open(cpath, "wb").write(data)
            try:
                y, _ = load_wav(cpath)
                assert np.isfinite(y).all()
            except ValueError:
                pass

        for cut in range(len(base)):
            check(base[:cut])
        rng = random.Random(0)
        for _ in range(2000):
            data = bytearray(base)
            for _ in range(rng.randint(1, 6)):
                data[rng.randrange(len(data))] = rng.randrange(256)
            check(bytes(data))
        # torn final frame: one byte short of a full 16-bit sample
        check(base[:-1])
        y, _ = load_wav(path)
        assert len(y) == len(x)


class TestSettings:
    def test_roundtrip(self, tmp_path):
        path = str(tmp_path / "settings.json")
        s = SettingsState(
            display_mode=DisplayMode.DEBUGGING,
            fps_limit=None,
            vqt_smoothing_mode=VqtSmoothingMode.LONG,
            enable_bloom=False,
        )
        save_settings(path, s)
        s2 = load_settings(path)
        assert s2 == s

    def test_corrupt_file_reverts_to_defaults(self, tmp_path):
        path = str(tmp_path / "settings.json")
        with open(path, "w") as f:
            f.write("{not json")
        s = load_settings(path)
        assert s == SettingsState()
        # and the file was repaired
        assert load_settings(path) == SettingsState()

    def test_bad_fps_limit_reverts_to_defaults(self, tmp_path):
        """fps_limit is validated like the enum fields: a string (or absurd
        number) triggers the revert-to-defaults, instead of surfacing later
        as a TypeError in a frame-budget division. None stays valid."""
        import json

        path = str(tmp_path / "settings.json")
        good = SettingsState().to_json()
        for bad in ('"60"', "0", "-5", "1e9", "true"):
            with open(path, "w") as f:
                f.write(good.replace('"fps_limit": 60', f'"fps_limit": {bad}'))
            assert json.loads(open(path).read()) is not None  # valid JSON
            assert load_settings(path) == SettingsState()
        s = SettingsState(fps_limit=None)
        assert SettingsState.from_json(s.to_json()) == s

    def test_smoothing_mode_durations(self):
        assert VqtSmoothingMode.NONE.base_duration_secs() == 0.0
        assert VqtSmoothingMode.DEFAULT.base_duration_secs() == 0.070
        assert VqtSmoothingMode.LONG.base_duration_secs() == 0.140


class TestXtask:
    def test_unknown_command(self, capsys):
        from pitchvis_tpu.xtask import main

        assert main(["nope"]) == 2
        assert main([]) == 2


class TestSmoothingModeGlue:
    def test_mode_applies_to_analysis(self):
        import jax.numpy as jnp

        from pitchvis_tpu.core.config import AnalysisParameters, VqtRange
        from pitchvis_tpu.core.settings import VqtSmoothingMode, analysis_params_for_mode
        from pitchvis_tpu.models.analysis import AnalysisState, analysis_step

        rng = VqtRange(min_freq=110.0, octaves=2, buckets_per_octave=24)
        n = rng.n_buckets
        x = jnp.full(n, 10.0)

        # None mode: passthrough (analysis.rs:243-270)
        ap = analysis_params_for_mode(AnalysisParameters(), VqtSmoothingMode.NONE)
        state = AnalysisState.init(n)
        _, out = analysis_step(ap, rng, state, x, 1.0 / 60.0)
        assert float(out.x_vqt_smoothed[0]) == 10.0

        # Long mode smooths more than Short
        outs = {}
        for mode in (VqtSmoothingMode.SHORT, VqtSmoothingMode.LONG):
            ap = analysis_params_for_mode(AnalysisParameters(), mode)
            state = AnalysisState.init(n)
            _, out = analysis_step(ap, rng, state, x, 1.0 / 60.0)
            outs[mode] = float(out.x_vqt_smoothed[0])
        assert outs[VqtSmoothingMode.SHORT] > outs[VqtSmoothingMode.LONG] > 0.0


class TestCapture:
    def test_wav_stream_driver(self, tmp_path):
        from pitchvis_tpu.io.capture import WavStreamDriver, dump_input_devices
        from pitchvis_tpu.io.wav import save_wav

        sr = 22050
        t = np.arange(sr // 2) / sr
        x = (0.3 * np.sin(2 * np.pi * 330.0 * t)).astype(np.float32)
        path = str(tmp_path / "in.wav")
        save_wav(path, x, sr)

        driver = WavStreamDriver(path, target_sr=sr, chunk_size=735)
        got = {}

        def push(idx, chunk):
            got.setdefault(idx, []).append(chunk.copy())

        n = driver.stream_to(push, stream_idx=3)
        assert n == len(x) // 735
        joined = np.concatenate(got[3])
        np.testing.assert_allclose(joined, x[: len(joined)], atol=2e-4)

        import io as _io
        buf = _io.StringIO()
        dump_input_devices(file=buf)
        assert "WavStreamDriver" in buf.getvalue()

    def test_wav_driver_pads_partial_tail(self, tmp_path):
        """The trailing partial chunk is zero-padded (RawPipeDriver's EOF
        semantics): a clip shorter than one chunk previously fed NOTHING."""
        from pitchvis_tpu.io.capture import WavStreamDriver
        from pitchvis_tpu.io.wav import save_wav

        sr = 22050
        x = (0.3 * np.sin(2 * np.pi * 330.0 * np.arange(300) / sr)).astype(
            np.float32
        )
        path = str(tmp_path / "short.wav")
        save_wav(path, x, sr)
        driver = WavStreamDriver(path, target_sr=sr, chunk_size=735)
        chunks = list(driver.chunks())
        assert len(chunks) == 1 and len(chunks[0]) == 735
        np.testing.assert_allclose(chunks[0][:300], x, atol=2e-4)
        assert np.all(chunks[0][300:] == 0.0)

        # and a 1.5-chunk clip yields 2 chunks, the tail padded
        x2 = np.concatenate([x] * 4).astype(np.float32)[: int(735 * 1.5)]
        save_wav(path, x2, sr)
        chunks = list(WavStreamDriver(path, target_sr=sr, chunk_size=735).chunks())
        assert len(chunks) == 2
        assert np.all(chunks[1][len(x2) - 735:] == 0.0)

    def test_wav_driver_resamples(self, tmp_path):
        from pitchvis_tpu.io.capture import WavStreamDriver
        from pitchvis_tpu.io.wav import save_wav

        t = np.arange(44100) / 44100
        x = (0.3 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32)
        path = str(tmp_path / "hi.wav")
        save_wav(path, x, 44100)
        driver = WavStreamDriver(path, target_sr=22050, chunk_size=512)
        assert abs(len(driver.audio) - 22050) < 64

    def test_raw_pipe_driver(self):
        import io as _io

        from pitchvis_tpu.io.capture import RawPipeDriver

        data = np.arange(1000, dtype=np.float32)
        driver = RawPipeDriver(_io.BytesIO(data.tobytes()), 22050, 256)
        chunks = []
        n = driver.stream_to(lambda i, c: chunks.append(c))
        assert n == 4  # 3 full + 1 partial (zero-padded to the chunk size)
        assert all(c.shape == (256,) for c in chunks)  # static shapes for jit
        joined = np.concatenate(chunks)
        np.testing.assert_array_equal(joined[:1000], data)
        assert np.all(joined[1000:] == 0.0)


class TestProfiling:
    def test_debug_report(self, small_params):
        from pitchvis_tpu.models.pipeline import StreamingPipeline
        from pitchvis_tpu.utils.profiling import StageTimer, debug_report

        pipe = StreamingPipeline(1, small_params)
        t = StageTimer()
        t.observe("vqt", 0.002)
        rep = debug_report(pipe, t)
        assert rep["vqt_delay_ms"] > 0
        assert rep["kernel"]["n_groups"] >= 2
        assert "vqt" in rep["stages"]


class TestRawPipeShortReads:
    """Round-2 review: unbuffered pipe producers return partial sample
    frames; the driver must loop to fill whole chunks, truncate the EOF tail
    to whole float32 samples, and zero-pad so shapes stay static."""

    class _Dribble:
        """File object that returns at most `step` bytes per read."""

        def __init__(self, data: bytes, step: int):
            self.data = data
            self.pos = 0
            self.step = step

        def read(self, n: int) -> bytes:
            take = min(n, self.step, len(self.data) - self.pos)
            out = self.data[self.pos : self.pos + take]
            self.pos += take
            return out

    def test_partial_reads_fill_whole_chunks(self):
        from pitchvis_tpu.io.capture import RawPipeDriver

        x = np.arange(100, dtype=np.float32)
        drv = RawPipeDriver(self._Dribble(x.tobytes(), step=7), 22050, chunk_size=32)
        chunks = []
        while (c := drv.read_chunk()) is not None:
            assert c.shape == (32,)
            chunks.append(c)
        joined = np.concatenate(chunks)
        np.testing.assert_array_equal(joined[:100], x)
        assert np.all(joined[100:] == 0.0)  # EOF tail zero-padded

    def test_unaligned_byte_tail(self):
        from pitchvis_tpu.io.capture import RawPipeDriver

        x = np.arange(10, dtype=np.float32)
        raw = x.tobytes() + b"\x01\x02"  # producer killed mid-sample
        drv = RawPipeDriver(self._Dribble(raw, step=5), 22050, chunk_size=8)
        chunks = []
        while (c := drv.read_chunk()) is not None:
            chunks.append(c)
        joined = np.concatenate(chunks)
        np.testing.assert_array_equal(joined[:10], x)  # partial sample dropped

    def test_serial_writer_file_fallback(self, tmp_path):
        """A plain file path must open as a file whether or not pyserial is
        installed (previously only the ImportError branch fell back)."""
        from pitchvis_tpu.io.led import SerialWriter

        path = str(tmp_path / "frames.bin")
        w = SerialWriter(path)
        w.write_frame(b"\xff\x00\x01abc")
        w.close()
        assert open(path, "rb").read() == b"\xff\x00\x01abc"

    def test_streaming_signal_short(self):
        """seconds shorter than the arpeggio schedule must not index past
        the buffer (round-2 review: IndexError at seconds <= 1.2)."""
        from pitchvis_tpu.core.config import VqtParameters
        from pitchvis_tpu.io.golden import streaming_signal

        sig = streaming_signal(VqtParameters(), seconds=0.8)
        assert np.isfinite(sig).all() and len(sig) == int(22050 * 0.8)


class TestCompileCache:
    def test_persistent_cache_writes_executables(self, tmp_path):
        """enable_compilation_cache points JAX's persistent executable
        cache at the given dir; a (non-trivial) jit compile then persists
        an entry that a future process can deserialize instead of
        recompiling (verified cross-process on the real chip: the serving
        step's first call dropped 2.3s -> 0.9s)."""
        import jax
        import jax.numpy as jnp

        from pitchvis_tpu.utils.compile_cache import enable_compilation_cache

        d = str(tmp_path / "xla")
        try:
            got = enable_compilation_cache(d, min_compile_secs=0.0)
            assert got == d
            # two suite-order hazards, both regression-covered here:
            # (1) JAX pins the cache object at first use, so if an earlier
            # test initialized it (corpus CLI tests do), a config re-point
            # is silently ignored — enable_compilation_cache now resets the
            # pinned cache when the dir changes; (2) the cache keeps an
            # in-process memory of KEYS, so use a computation no other test
            # compiles or the put never happens
            x = jnp.full((63, 65), 1.000123)
            jax.jit(lambda a: ((a * 0.9917) @ a.T).sum() + 42.125)(x).block_until_ready()
            entries = list(__import__("os").listdir(d))
            assert entries, "no cache entry written"
        finally:
            jax.config.update("jax_compilation_cache_dir", None)


class TestServeDemo:
    """`demo --serve` end to end in a subprocess: raw f32 tone on stdin ->
    native ingest (44.1 kHz resampled) -> pipelined StreamServer -> note
    summaries on stdout. The live-mic recipe (docs/DEPLOYMENT.md §1) minus
    the microphone."""

    def test_serve_pipelined_resampled_tone(self):
        import os
        import subprocess
        import sys

        input_sr = 44100
        t = np.arange(int(input_sr * 1.2)) / input_sr
        tone = (0.2 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32)

        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["PYTHONPATH"] = os.path.dirname(os.path.dirname(__file__))
        proc = subprocess.run(
            [
                sys.executable,
                "-m",
                "pitchvis_tpu.demo",
                "--serve",
                "--pipelined",
                "--input-sr",
                str(input_sr),
                "--fps",
                "30",
            ],
            input=tone.tobytes(),
            capture_output=True,
            timeout=600,
            env=env,
        )
        assert proc.returncode == 0, proc.stderr.decode()[-2000:]
        stdout = proc.stdout.decode()
        assert "A4" in stdout, f"no A4 detection in serve output:\n{stdout[-2000:]}"
        assert "serving stdin: 44100 Hz in -> 22050 Hz" in proc.stderr.decode()

    def test_serve_loop_mode(self):
        """--serve --loop: producer thread feeds the ring, the serving
        runtime owns the hop cadence (server.serve()), this process
        consumes published hops; drains the ring after stdin EOF."""
        import os
        import subprocess
        import sys

        sr = 22050
        t = np.arange(int(sr * 1.2)) / sr
        tone = (0.2 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32)

        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["PYTHONPATH"] = os.path.dirname(os.path.dirname(__file__))
        proc = subprocess.run(
            [
                sys.executable,
                "-m",
                "pitchvis_tpu.demo",
                "--serve",
                "--loop",
                "--fps",
                "30",
            ],
            input=tone.tobytes(),
            capture_output=True,
            timeout=600,
            env=env,
        )
        assert proc.returncode == 0, proc.stderr.decode()[-2000:]
        stdout = proc.stdout.decode()
        assert "A4" in stdout, f"no A4 detection in loop output:\n{stdout[-2000:]}"
        assert "loop stats" in proc.stderr.decode()


    def test_serve_loop_cadenced_mode(self):
        """--serve --loop --hops-per-dispatch K: the cadenced interactive
        mode end to end through the CLI (per-hop publishes, catch-up safe
        on a slow CI host)."""
        import os
        import subprocess
        import sys

        sr = 22050
        t = np.arange(int(sr * 1.2)) / sr
        tone = (0.2 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32)

        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["PYTHONPATH"] = os.path.dirname(os.path.dirname(__file__))
        proc = subprocess.run(
            [
                sys.executable, "-m", "pitchvis_tpu.demo",
                "--serve", "--loop", "--hops-per-dispatch", "4",
                "--fps", "30",
            ],
            input=tone.tobytes(),
            capture_output=True,
            timeout=600,
            env=env,
        )
        assert proc.returncode == 0, proc.stderr.decode()[-2000:]
        stdout = proc.stdout.decode()
        assert "A4" in stdout, f"no A4 in cadenced output:\n{stdout[-2000:]}"
        assert "loop stats" in proc.stderr.decode()

    def test_serve_tune_without_tty_degrades_gracefully(self):
        """--tune in a session with no controlling terminal (CI, pipes)
        must disable tuning with a notice and serve normally."""
        import os
        import subprocess
        import sys

        sr = 22050
        t = np.arange(int(sr * 1.0)) / sr
        tone = (0.2 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32)

        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["PYTHONPATH"] = os.path.dirname(os.path.dirname(__file__))
        proc = subprocess.run(
            [
                sys.executable, "-m", "pitchvis_tpu.demo",
                "--serve", "--loop", "--tune", "--fps", "30",
            ],
            input=tone.tobytes(),
            capture_output=True,
            timeout=600,
            env=env,
            start_new_session=True,  # guarantee no controlling tty
        )
        assert proc.returncode == 0, proc.stderr.decode()[-2000:]
        err = proc.stderr.decode()
        assert "tuning disabled" in err, err[-2000:]
        assert "A4" in proc.stdout.decode()

    def test_serve_render_gif_pipelined_drains_tail(self, tmp_path):
        """--serve --pipelined --render out.gif: live ingest -> fused viewer
        outputs -> rasterized frames -> animated GIF (the reference's live
        mic -> display UX, fully headless; needs the native runtime). The
        one-deep pipelined queue's in-flight tail hop must be drained at
        EOF, so the GIF has exactly one frame per ingested hop."""
        import os
        import subprocess
        import sys

        import pytest

        from pitchvis_tpu.runtime.native import available as native_available

        if not native_available():
            pytest.skip("native runtime unavailable")

        sr = 22050
        fps = 30
        n_hops = 24
        t = np.arange(n_hops * (sr // fps)) / sr
        tone = (0.2 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32)
        out = tmp_path / "live.gif"

        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["PYTHONPATH"] = os.path.dirname(os.path.dirname(__file__))
        proc = subprocess.run(
            [
                sys.executable, "-m", "pitchvis_tpu.demo",
                "--serve", "--pipelined", "--fps", str(fps),
                "--render", str(out), "--render-size", "160x90",
            ],
            input=tone.tobytes(),
            capture_output=True,
            timeout=600,
            env=env,
        )
        assert proc.returncode == 0, proc.stderr.decode()[-2000:]
        assert f"{n_hops}-frame GIF" in proc.stderr.decode()
        from PIL import Image

        im = Image.open(out)
        assert im.size == (160, 90)
        assert im.n_frames == n_hops


class TestAlsaCapture:
    """io/alsa.py against the stub libasound (native/alsa_stub.c): the same
    ctypes call discipline a real libasound sees — short reads, one injected
    overrun (-EPIPE -> snd_pcm_recover), strict set_params checking, hint
    enumeration with malloc'd strings."""

    @staticmethod
    def _stub_path():
        import os
        import subprocess

        import pytest

        d = os.path.join(os.path.dirname(__file__), "..", "native")
        so = os.path.join(d, "libalsa_stub.so")
        if not os.path.exists(so):
            try:
                subprocess.run(
                    ["make", "-C", d, "alsa-stub"],
                    check=True, capture_output=True, timeout=120,
                )
            except Exception as e:  # no compiler: the driver gates on this
                pytest.skip(f"cannot build alsa stub: {e}")
        return so

    def test_unavailable_without_lib(self):
        from pitchvis_tpu.io import alsa

        assert not alsa.available("/nonexistent/libasound.so")
        assert alsa.list_input_devices("/nonexistent/libasound.so") == []
        try:
            alsa.AlsaCaptureDriver(lib_path="/nonexistent/libasound.so")
            raise AssertionError("expected RuntimeError")
        except RuntimeError as e:
            assert "libasound" in str(e)

    def test_capture_tone_with_overrun_recovery(self):
        from pitchvis_tpu.io import alsa

        so = self._stub_path()
        assert alsa.available(so)
        sr, chunk = 22050, 368
        with alsa.AlsaCaptureDriver(sr=sr, chunk_size=chunk, lib_path=so) as drv:
            chunks = [drv.read_chunk() for _ in range(4)]
        assert all(c is not None and c.shape == (chunk,) for c in chunks)
        # the stub serves a continuous 440 Hz tone across short reads and the
        # recovered overrun: every chunk must be a pure contiguous sine
        joined = np.concatenate(chunks)
        t = np.arange(len(joined)) / sr
        np.testing.assert_allclose(
            joined, 0.2 * np.sin(2 * np.pi * 440.0 * t), atol=1e-5
        )

    def test_set_params_rejection_closes_pcm(self):
        from pitchvis_tpu.io import alsa

        so = self._stub_path()
        try:
            alsa.AlsaCaptureDriver(sr=1, chunk_size=64, lib_path=so)  # rate < 8000
            raise AssertionError("expected RuntimeError")
        except RuntimeError as e:
            assert "set_params" in str(e)
        try:
            alsa.AlsaCaptureDriver(device="missing", lib_path=so)
            raise AssertionError("expected RuntimeError")
        except RuntimeError as e:
            assert "snd_pcm_open" in str(e)

    def test_device_listing_filters_playback_only(self):
        from pitchvis_tpu.io import alsa

        devices = alsa.list_input_devices(self._stub_path())
        names = [d["NAME"] for d in devices]
        assert names == ["default", "hw:0,0"]  # Output-only hw:1,0 filtered
        assert devices[1]["DESC"] == "Stub microphone"

    def test_stream_to_feeds_server_rings(self):
        """AlsaCaptureDriver -> StreamServer.push: the in-process mic path
        end to end (native runtime required)."""
        import pytest

        from pitchvis_tpu.io import alsa
        from pitchvis_tpu.runtime.native import available as native_available

        if not native_available():
            pytest.skip("native runtime unavailable")
        from pitchvis_tpu.core.config import VqtParameters
        from pitchvis_tpu.runtime.server import StreamServer

        server = StreamServer(1, VqtParameters())
        try:
            with alsa.AlsaCaptureDriver(lib_path=self._stub_path()) as drv:
                n = drv.stream_to(server.push, 0, max_chunks=8)
            assert n == 8
            windows, _gains = server.rings.snapshot(2048)
            assert np.abs(windows[0, -512:]).max() > 0  # audio reached the ring
        finally:
            server.close()

    def test_serve_alsa_in_process(self):
        """`demo --serve --alsa` against the stub libasound: in-process
        capture -> StreamServer -> A4 detection, bounded by --seconds."""
        import os
        import subprocess
        import sys

        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["PYTHONPATH"] = os.path.dirname(os.path.dirname(__file__))
        env["PITCHVIS_ALSA_LIB"] = TestAlsaCapture._stub_path()
        proc = subprocess.run(
            [
                sys.executable, "-m", "pitchvis_tpu.demo",
                "--serve", "--alsa", "--seconds", "1", "--fps", "30",
            ],
            capture_output=True,
            timeout=600,
            env=env,
        )
        assert proc.returncode == 0, proc.stderr.decode()[-2000:]
        assert "A4" in proc.stdout.decode()
        assert "serving alsa:default" in proc.stderr.decode()
