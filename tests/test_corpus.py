"""Procedural training corpus (train/corpus.py): font, pieces, determinism.

The realistic-scale counterpart of the reference's MuseScore_General + lmd
corpus flow (pitchvis_train/train.py:31, train.rs:112-207).
"""

import numpy as np
import pytest

from pitchvis_tpu.synth.midi import load_midi
from pitchvis_tpu.synth.sf2 import SoundFont
from pitchvis_tpu.train.corpus import (
    build_midi_corpus,
    build_training_font,
    generate_piece,
)


class TestTrainingFont:
    def test_font_builds_and_parses(self, tmp_path):
        path = str(tmp_path / "font.sf2")
        programs = build_training_font(path, seed=0)
        font = SoundFont.from_file(path)
        assert sorted(p.patch_number for p in font.presets) == sorted(programs)
        assert len(programs) == 10
        # every preset is bank 0 so plain program changes reach it
        assert all(p.bank_number == 0 for p in font.presets)

    def test_font_samples_are_loopable(self, tmp_path):
        path = str(tmp_path / "font.sf2")
        build_training_font(path, seed=0)
        font = SoundFont.from_file(path)
        for h in font.sample_headers:
            assert h.end - h.start > 1000
            assert h.start_loop == h.start and h.end_loop == h.end


class TestGeneratePiece:
    def test_keys_in_register_and_channels(self):
        rng = np.random.default_rng(7)
        notes, programs = generate_piece(rng, 30.0, [0, 24], [19, 48])
        assert len(notes) > 40
        assert set(programs) == {0, 1, 2}
        for start, dur, ch, key, vel in notes:
            assert 0.0 <= start < 30.0
            assert dur > 0
            assert ch in (0, 1, 2)
            assert 36 <= key <= 96
            assert 1 <= vel <= 127

    def test_deterministic(self):
        a = generate_piece(np.random.default_rng(3), 20.0, [0], [19])
        b = generate_piece(np.random.default_rng(3), 20.0, [0], [19])
        assert a == b


class TestCorpusBuild:
    def test_corpus_files_parse_and_are_deterministic(self, tmp_path):
        d1 = str(tmp_path / "c1")
        d2 = str(tmp_path / "c2")
        p1 = build_midi_corpus(d1, 3, seconds_per_file=8.0, seed=5)
        p2 = build_midi_corpus(d2, 3, seconds_per_file=8.0, seed=5)
        assert len(p1) == 3
        for a, b in zip(p1, p2):
            assert open(a, "rb").read() == open(b, "rb").read()
        midi = load_midi(p1[0])
        assert midi.length > 4.0

    def test_distinct_seeds_distinct_pieces(self, tmp_path):
        p1 = build_midi_corpus(str(tmp_path / "a"), 1, seconds_per_file=8.0, seed=1)
        p2 = build_midi_corpus(str(tmp_path / "b"), 1, seconds_per_file=8.0, seed=2)
        assert open(p1[0], "rb").read() != open(p2[0], "rb").read()


class TestTunedCli:
    def test_tuned_flag_reaches_train_demo(self, monkeypatch):
        """--tuned selects the tuned recipe and the TUNED metrics artifact;
        --quick suppresses the artifact copy entirely."""
        from pitchvis_tpu.train import corpus

        calls = []

        def fake_train_demo(**kw):
            calls.append(kw)
            return {"n_frames": 1, "metrics": {"f1_micro": 0.0, "accuracy": 0.0}}

        monkeypatch.setattr(corpus, "train_demo", fake_train_demo)
        assert corpus.main(["--tuned"]) == 0
        assert calls[-1]["tuned"] is True
        assert calls[-1]["metrics_copy"] == "artifacts/TRAIN_DEMO_TUNED.json"
        assert corpus.main([]) == 0
        assert calls[-1]["tuned"] is False
        assert calls[-1]["metrics_copy"] == "artifacts/TRAIN_DEMO.json"
        assert corpus.main(["--quick", "--tuned"]) == 0
        assert calls[-1]["metrics_copy"] is None

    def test_full_preset(self, monkeypatch):
        """--full reproduces the committed reference-scale run: 1535 files,
        20 epochs, tuned recipe, FULLSCALE artifact, train_demo_full out dir
        (unless --out overrides it)."""
        from pitchvis_tpu.train import corpus

        calls = []

        def fake_train_demo(**kw):
            calls.append(kw)
            return {"n_frames": 1, "metrics": {"f1_micro": 0.0, "accuracy": 0.0}}

        monkeypatch.setattr(corpus, "train_demo", fake_train_demo)
        assert corpus.main(["--full"]) == 0
        kw = calls[-1]
        assert kw["n_files"] == 1535
        assert kw["epochs"] == 20
        assert kw["tuned"] is True
        assert kw["out_dir"] == "artifacts/train_demo_full"
        assert kw["metrics_copy"] == "artifacts/TRAIN_DEMO_FULLSCALE.json"
        assert corpus.main(["--full", "--out", "/tmp/elsewhere"]) == 0
        assert calls[-1]["out_dir"] == "/tmp/elsewhere"

    def test_downscaled_runs_do_not_clobber_artifacts(self, monkeypatch):
        """An explicit --files below the preset's corpus size keeps its own
        out_dir metrics but must not overwrite the committed evidence
        artifacts (they state results at a specific scale)."""
        from pitchvis_tpu.train import corpus

        calls = []

        def fake_train_demo(**kw):
            calls.append(kw)
            return {"n_frames": 1, "metrics": {"f1_micro": 0.0, "accuracy": 0.0}}

        monkeypatch.setattr(corpus, "train_demo", fake_train_demo)
        assert corpus.main(["--full", "--files", "8"]) == 0
        assert calls[-1]["n_files"] == 8
        assert calls[-1]["metrics_copy"] is None
        assert corpus.main(["--full", "--reference-hparams", "--files", "8"]) == 0
        assert calls[-1]["metrics_copy"] is None
        assert corpus.main(["--files", "4"]) == 0
        assert calls[-1]["metrics_copy"] is None
        assert corpus.main(["--tuned", "--files", "4"]) == 0
        assert calls[-1]["metrics_copy"] is None
        # at or above the preset scale the copy still happens
        assert corpus.main(["--full", "--files", "2000"]) == 0
        assert calls[-1]["metrics_copy"] == "artifacts/TRAIN_DEMO_FULLSCALE.json"

    def test_full_reference_hparams(self, monkeypatch):
        """--full --reference-hparams keeps the reference recipe at full
        scale (32 epochs, tuned off, REF artifact); it is rejected without
        --full (smaller runs already default to the reference recipe)."""
        import pytest

        from pitchvis_tpu.train import corpus

        calls = []

        def fake_train_demo(**kw):
            calls.append(kw)
            return {"n_frames": 1, "metrics": {"f1_micro": 0.0, "accuracy": 0.0}}

        monkeypatch.setattr(corpus, "train_demo", fake_train_demo)
        assert corpus.main(["--full", "--reference-hparams"]) == 0
        kw = calls[-1]
        assert kw["n_files"] == 1535 and kw["epochs"] == 32
        assert kw["tuned"] is False
        assert kw["out_dir"] == "artifacts/train_demo_full_ref"
        assert kw["metrics_copy"] == "artifacts/TRAIN_DEMO_FULLSCALE_REF.json"
        with pytest.raises(SystemExit):
            corpus.main(["--reference-hparams"])

    def test_library_call_auto_routes_metrics_copy(self, monkeypatch, tmp_path):
        """train_demo(tuned=True) called as a library (not via main()) must
        not overwrite the committed reference-hparams artifact: the 'auto'
        default follows the recipe (TUNED file for tuned runs)."""
        import os

        import pitchvis_tpu.train.dataset as ds
        import pitchvis_tpu.train.train as tr
        from pitchvis_tpu.core.config import TRAIN_VQT_PARAMETERS
        from pitchvis_tpu.train import corpus

        row = TRAIN_VQT_PARAMETERS.n_buckets + 128
        monkeypatch.setattr(corpus, "build_training_font", lambda *a, **kw: [0])
        monkeypatch.setattr(corpus, "build_midi_corpus", lambda *a, **kw: [])
        monkeypatch.setattr(
            ds, "generate_dataset", lambda *a, **kw: np.zeros(row * 8, np.float32)
        )
        monkeypatch.setattr(
            tr, "train",
            lambda *a, **kw: (None, {"f1_micro": 0.0, "accuracy": 0.0}),
        )
        monkeypatch.chdir(tmp_path)
        for tuned, name in ((True, "TRAIN_DEMO_TUNED.json"), (False, "TRAIN_DEMO.json")):
            corpus.train_demo(out_dir=str(tmp_path / f"t{tuned}"), tuned=tuned)
            assert os.path.exists(tmp_path / "artifacts" / name), name

        # ...but a TOY-scale library call (n_files below demo scale) must
        # NOT clobber the committed evidence artifacts
        for p in (tmp_path / "artifacts").glob("*.json"):
            p.unlink()
        corpus.train_demo(out_dir=str(tmp_path / "toy"), n_files=4, tuned=False)
        assert not list((tmp_path / "artifacts").glob("*.json"))

    def test_quick_and_full_mutually_exclusive(self, monkeypatch):
        """--quick --full would otherwise silently produce a hybrid run
        (full's 1535 files at quick's 10 s clips, no artifact copy)."""
        import pytest

        from pitchvis_tpu.train import corpus

        monkeypatch.setattr(corpus, "train_demo", lambda **kw: 0 / 0)
        with pytest.raises(SystemExit):
            corpus.main(["--quick", "--full"])
