"""On-device dataset generation vs the host pipeline (train/dataset.py)."""

import numpy as np
import pytest

from pitchvis_tpu.ops.vqt import Vqt
from pitchvis_tpu.synth.midi import load_midi, write_midi
from pitchvis_tpu.synth.synthesizer import MidiFileSequencer, Synthesizer
from pitchvis_tpu.train.dataset import annotate_midi
from pitchvis_tpu.train.device_dataset import (
    annotate_midi_device,
    generate_dataset_device,
    render_schedule_device,
    schedule_from_midi,
)
from tests.test_synth import SMALL_TRAIN_PARAMS


@pytest.fixture(scope="module")
def midi_file(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("mid") / "t.mid")
    write_midi(
        path,
        [(0.0, 1.23, 0, 57, 110), (0.51, 0.97, 0, 64, 90), (1.83, 0.77, 1, 45, 100)],
    )
    return load_midi(path)


class TestParallelCorpus:
    def test_parallel_matches_serial(self, tmp_path):
        """n_workers>1 (the reference's rayon-over-files structure,
        train.rs:146-153, as a GIL-releasing native thread pool) produces
        byte-identical rows in corpus order."""
        native = pytest.importorskip("pitchvis_tpu.runtime.native")
        if not native.available():
            pytest.skip("native library not built")
        from pitchvis_tpu.synth.sf2 import write_minimal_sf2
        from pitchvis_tpu.train.dataset import generate_dataset

        sr = int(SMALL_TRAIN_PARAMS.sr)
        t = np.arange(400)
        sf = str(tmp_path / "f.sf2")
        write_minimal_sf2(sf, 0.7 * np.sin(2 * np.pi * t / 50), sr, root_key=69, loop=True)
        paths = []
        for i in range(3):
            p = str(tmp_path / f"{i}.mid")
            write_midi(p, [(0.0, 0.4, 0, 50 + 3 * i, 100), (0.3, 0.5, 0, 62 + i, 90)])
            paths.append(p)
        kw = dict(
            params=SMALL_TRAIN_PARAMS, sound_font_path=sf, max_seconds_per_file=1.5
        )
        serial = generate_dataset(paths, n_workers=1, **kw)
        parallel = generate_dataset(paths, n_workers=3, **kw)
        assert serial.size > 0
        np.testing.assert_array_equal(serial, parallel)


class TestDeviceRender:
    def test_matches_host_synth(self, midi_file):
        """Absolute-time device rendering equals the host synthesizer's
        phase-accumulated chunked rendering (same voices, f32 tolerance)."""
        sr = 22050
        chunk = 441
        n = int(sr * 2.8) // chunk * chunk
        # quantize (round up) to the host sequencer's 64-sample block grid
        sched = schedule_from_midi(midi_file, n / sr, quantize_secs=64 / sr)
        dev = np.asarray(render_schedule_device(sched, n, float(sr)))

        synth = Synthesizer(sr)
        seq = MidiFileSequencer(synth)
        seq.play(midi_file)
        host = np.zeros(n, np.float32)
        chunk = 441
        buf_r = np.zeros(chunk, np.float32)
        for i in range(n // chunk):
            seg = host[i * chunk : (i + 1) * chunk]
            seq.render(seg, buf_r)
        # correlation-level match (host caps voices / event timing at chunk
        # granularity; device dispatches events exactly)
        err = np.abs(dev - host)
        assert err.mean() < 2e-3
        assert np.corrcoef(dev, host)[0, 1] > 0.99

    def test_polyphony_cap_matches_host(self, tmp_path):
        """>64 concurrently-live voices: the host pool evicts the OLDEST at
        note_on (synthesizer.py MAX_VOICES=64 pop(0)); the device render
        must silence exactly the same voices (NoteSchedule.t_cut via
        _polyphony_forced_ends) — without the cap, dense files rendered
        different audio AND labels on the two paths."""
        from pitchvis_tpu.train.device_dataset import active_keys_at

        sr = 22050
        notes = [(0.001 * i, 2.5, 0, 20 + i, 100) for i in range(80)]
        path = str(tmp_path / "dense.mid")
        write_midi(path, notes)
        midi = load_midi(path)
        n = int(sr * 3.0) // 64 * 64
        sched = schedule_from_midi(midi, n / sr, quantize_secs=64 / sr)
        # 80 simultaneous holds: notes 64..79 each evict one -> 16 forced
        assert int(np.isfinite(sched.t_cut).sum()) == 16
        dev = np.asarray(render_schedule_device(sched, n, float(sr)))

        synth = Synthesizer(sr)
        seq = MidiFileSequencer(synth)
        seq.play(midi)
        host = np.zeros(n, np.float32)
        buf_r = np.zeros(n, np.float32)
        seq.render(host, buf_r)

        scale = max(float(np.abs(host).max()), 1e-9)
        assert np.abs(dev - host).max() / scale < 1e-2
        assert np.corrcoef(dev, host)[0, 1] > 0.999

        # labels exclude the evicted voices, like get_active_voices()
        active = active_keys_at(sched, 1.0, 1.0)
        evicted = {20 + i for i in range(16)}
        held = {20 + i for i in range(16, 80)}
        assert not (set(active) & evicted)
        assert held <= set(active)

    def test_empty_schedule(self):
        sched = schedule_from_midi(load_midi_empty(), 1.0)
        out = np.asarray(render_schedule_device(sched, 1024, 22050.0))
        assert np.all(out == 0.0)


def load_midi_empty():
    from pitchvis_tpu.synth.midi import MidiFile

    return MidiFile(events=[], length=0.0)


class TestDeviceAnnotate:
    def test_matches_host_pipeline(self, midi_file):
        """Same capture cadence, equivalent labels, close spectra."""
        vqt = Vqt(SMALL_TRAIN_PARAMS)
        host = annotate_midi(midi_file, vqt, SMALL_TRAIN_PARAMS, max_seconds=2.8)
        dev = annotate_midi_device(midi_file, vqt, SMALL_TRAIN_PARAMS, max_seconds=2.8)
        assert len(dev) == len(host)
        for (hk, hs), (dk, ds) in zip(host, dev):
            assert set(hk) == set(dk)
            # spectra agree where there is signal (dB floor bins may differ)
            strong = hs > 10.0
            if strong.any():
                assert np.abs(hs[strong] - ds[strong]).max() < 3.0
            # label gains agree on the >0.5 attack threshold used by
            # generate_data_row (train.rs:455-457)
            for k in hk:
                assert (hk[k] > 0.5) == (dk[k] > 0.5), (k, hk[k], dk[k])

    def test_generate_dataset_device(self, midi_file, tmp_path):
        path = str(tmp_path / "m.mid")
        write_midi(path, [(0.0, 3.0, 0, 57, 110)])
        data = generate_dataset_device([path], SMALL_TRAIN_PARAMS, max_seconds_per_file=3.0)
        row_len = SMALL_TRAIN_PARAMS.n_buckets + 128
        rows = data.reshape(-1, row_len)
        labeled = rows[rows[:, SMALL_TRAIN_PARAMS.n_buckets + 57] > 0.5]
        assert len(labeled) >= 1
        assert abs(int(np.argmax(labeled[0, : SMALL_TRAIN_PARAMS.n_buckets])) - 36) <= 2


class TestOverlappingNotes:
    def test_note_off_releases_all_matching(self, tmp_path):
        """The host synthesizer's note_off releases ALL unreleased voices of
        (channel, key); the device schedule must close every open note too
        (round-2 review: it popped only the oldest, leaving the second
        overlapping same-key note sounding to end-of-file)."""
        path = str(tmp_path / "ov.mid")
        # two overlapping notes on the same key; one off event at 0.6s
        write_midi(path, [(0.0, 0.6, 0, 60, 100), (0.3, 0.6, 0, 60, 90)])
        midi = load_midi(path)
        sched = schedule_from_midi(midi, 2.0)
        on_key = np.where(np.asarray(sched.key) == 60)[0]
        assert len(on_key) == 2
        # write_midi emits offs at on+duration: 0.6 and 0.9; the FIRST off
        # (0.6) releases both open voices, like Synthesizer.note_off
        offs = np.asarray(sched.t_off)[on_key]
        assert np.allclose(offs, 0.6, atol=1e-6), offs
