"""ML stack tests: model shape/semantics (train.py:67-106), training loop
convergence on a synthetic task, checkpoint round-trip, inference hook."""

import jax
import jax.numpy as jnp
import numpy as np

from pitchvis_tpu.models.pitch_mlp import N_MIDI, PitchMLP, infer_window
from pitchvis_tpu.train.train import (
    TrainConfig,
    bce_loss,
    load_checkpoint,
    make_model,
    train,
    window_data,
)

CFG = TrainConfig(
    n_buckets=48, t_window=3, mlp_size=64, mlp_layers=2, epochs=10, batch_size=32,
    learning_rate=2e-3,
)


def synthetic_dataset(n_frames=400, seed=0):
    """Frames where bin activity directly encodes 4 MIDI keys."""
    rng = np.random.default_rng(seed)
    keys = [40, 45, 52, 60]
    rows = []
    for _ in range(n_frames):
        active = rng.random(4) > 0.5
        vqt = rng.random(CFG.n_buckets).astype(np.float32) * 2.0
        targets = np.zeros(N_MIDI, np.float32)
        for i, k in enumerate(keys):
            if active[i]:
                vqt[i * 12 : i * 12 + 4] += 20.0
                targets[k] = 1.0
        rows.append(np.concatenate([vqt, targets]))
    return np.concatenate(rows)


class TestModel:
    def test_output_shape_and_range(self):
        model = PitchMLP(input_bins=CFG.t_window * CFG.n_buckets, mlp_size=64, mlp_layers=2)
        params = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 1, CFG.t_window * CFG.n_buckets)))
        out = model.apply(params, jnp.ones((2, 1, CFG.t_window * CFG.n_buckets)))
        assert out.shape == (2, N_MIDI)
        assert float(out.min()) > 0.0 and float(out.max()) < 1.0

    def test_conv_pool_dims_match_reference(self):
        """train.py:76-79: O_conv = (L-5)/2 + 1, O_pool = (O_conv-2)/2 + 1,
        flattened 16*O_pool features."""
        L = 5 * 252
        model = PitchMLP(input_bins=L)
        params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, L)))
        # fc1 kernel input dim must be 16 * O_pool
        o_conv = (L - 5) // 2 + 1
        o_pool = (o_conv - 2) // 2 + 1
        fc1 = params["params"]["Dense_0"]["kernel"]
        assert fc1.shape[0] == 16 * o_pool

    def test_infer_window_hook(self):
        model = PitchMLP(input_bins=CFG.t_window * CFG.n_buckets, mlp_size=64, mlp_layers=2)
        params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, CFG.t_window * CFG.n_buckets)))
        frames = jnp.ones((3, CFG.t_window, CFG.n_buckets))
        out = infer_window(params, model, frames)
        assert out.shape == (3, N_MIDI)


class TestTraining:
    def test_window_data_layout(self):
        data = synthetic_dataset(20)
        x, y = window_data(data, CFG)
        assert x.shape == (20 - CFG.t_window + 1, CFG.t_window * CFG.n_buckets)
        assert y.shape == (20 - CFG.t_window + 1, N_MIDI)

    def test_bce_loss(self):
        p = jnp.asarray([[0.9, 0.1]])
        t = jnp.asarray([[1.0, 0.0]])
        assert float(bce_loss(p, t)) < 0.2
        assert float(bce_loss(1.0 - p, t)) > 1.5

    def test_training_learns_synthetic_task(self, tmp_path):
        data = synthetic_dataset()
        params, metrics = train(data, CFG, checkpoint_dir=str(tmp_path))
        assert metrics["f1_micro"] > 0.6
        assert metrics["accuracy"] > 0.99  # 124 always-zero outputs dominate

        restored = load_checkpoint(str(tmp_path), CFG)
        model = make_model(CFG)
        x, _ = window_data(data, CFG)
        a = model.apply(params, jnp.asarray(x[:4]))
        b = model.apply(restored, jnp.asarray(x[:4]))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    def test_small_dataset_still_trains(self, tmp_path):
        """n_train < batch_size must still run optimizer steps (the final
        partial batch trains, like the reference DataLoader's
        drop_last=False) — a drop-last loop trained ZERO steps on the
        --quick smoke corpus and reported untrained-model metrics."""
        import dataclasses

        data = synthetic_dataset()
        big_batch = dataclasses.replace(CFG, batch_size=100_000, epochs=3)
        params, metrics = train(data, big_batch)
        assert metrics["steps"] == 3  # one partial batch per epoch
        assert len(metrics["epoch_loss"]) == 3
        assert metrics["epoch_loss"][-1] < metrics["epoch_loss"][0]

    def test_checkpoint_saves_do_not_collide(self, tmp_path):
        """Two saves into one dir within the same second must both land
        (orbax raises on an existing directory — all trained params would
        be lost right after training completed); newest wins on load."""
        import dataclasses

        data = synthetic_dataset()
        cfg = dataclasses.replace(CFG, epochs=1)
        train(data, cfg, checkpoint_dir=str(tmp_path))
        train(data, cfg, checkpoint_dir=str(tmp_path))  # same second is fine
        import os

        models = [d for d in os.listdir(tmp_path) if d.startswith("model_")]
        assert len(models) == 2
        load_checkpoint(str(tmp_path), cfg)  # numeric-sorted newest restores

    def test_tuned_recipe_learns(self):
        """The tuned (AdamW warmup-cosine) mode trains at least as well as
        the reference recipe on the synthetic task, and its schedule really
        decays (peak lr is only hit after warmup)."""
        from pitchvis_tpu.train.train import make_optimizer, tuned_config
        import dataclasses
        import optax

        cfg = tuned_config(
            n_buckets=48, t_window=3, mlp_size=64, mlp_layers=2, epochs=10,
            batch_size=32, learning_rate=2e-3,
        )
        assert cfg.schedule == "warmup_cosine"
        data = synthetic_dataset()
        params, metrics = train(data, cfg)
        assert metrics["f1_micro"] > 0.6

        # the schedule shape: 0 at step 0, peak at warmup end, ~0 at the end
        sched_cfg = dataclasses.replace(cfg, steps_hint=100)
        lr = optax.warmup_cosine_decay_schedule(
            0.0, sched_cfg.learning_rate,
            max(int(100 * sched_cfg.warmup_frac), 1), 100,
        )
        assert float(lr(0)) < float(lr(5))
        np.testing.assert_allclose(float(lr(5)), sched_cfg.learning_rate, rtol=1e-5)
        assert float(lr(99)) < 0.1 * sched_cfg.learning_rate

    def test_default_config_is_reference_exact(self):
        """Guards the parity contract: TrainConfig() must keep the
        reference's hyperparameters (train.py:108-146) untouched."""
        cfg = TrainConfig()
        assert cfg.schedule == "const"
        assert cfg.learning_rate == 1e-5
        assert cfg.batch_size == 300
        assert cfg.eps == 1.1920929e-7


class TestLegacyLogistic:
    """The legacy linfa logistic-regression diagnostic (train.rs:45-110)
    on center_vqt_samples output (train.rs:366-441)."""

    def test_separable_clusters(self):
        rng = np.random.default_rng(7)
        pos = [(rng.normal(1.5, 1.0, 16), 1.0) for _ in range(120)]
        neg = [(rng.normal(-1.5, 1.0, 16), 1.0) for _ in range(120)]
        from pitchvis_tpu.train.logistic import fit

        res = fit(pos, neg, seed=3)
        assert res.confusion.sum() == 24  # 10% holdout of 240
        assert res.accuracy >= 0.9
        assert res.mcc >= 0.8
        # deterministic under a fixed seed
        res2 = fit(pos, neg, seed=3)
        np.testing.assert_array_equal(res.weights, res2.weights)

    def test_on_centered_vqt_samples(self):
        """End-to-end with the centering augmentation: positives put the
        note's energy at the canonical center bin (40 semitones in), so a
        logistic fit separates them from the shifted negatives."""
        from pitchvis_tpu.train.dataset import center_vqt_samples
        from pitchvis_tpu.train.logistic import fit

        rng = np.random.default_rng(11)
        pos, neg = [], []
        for _ in range(40):
            key = int(rng.integers(45, 100))
            vqt = rng.random(84).astype(np.float32) * 2.0
            idx = (key - 33) * 1  # buckets_per_semitone=1, FREQ_A1 midi 33
            vqt[max(0, idx - 1) : idx + 2] += 25.0
            p, n = center_vqt_samples({key: 1.0}, vqt, 1, 7)
            pos += p
            neg += n
        res = fit(pos, neg, seed=0)
        assert res.accuracy >= 0.9
        assert res.mcc >= 0.75
        # the discriminative weight sits at the positive center bin
        # (energy is smeared one bin either side, so allow 40 +- 1)
        assert int(np.argmax(res.weights)) in (39, 40, 41)

    def test_mcc_degenerate_and_chunking(self):
        from pitchvis_tpu.train.logistic import LogisticFit, matthews_corrcoef

        assert matthews_corrcoef(np.array([[5, 0], [0, 0]])) == 0.0
        assert matthews_corrcoef(np.array([[5, 0], [0, 5]])) == 1.0
        f = LogisticFit(np.arange(261, dtype=np.float32), 0.0,
                        np.eye(2, dtype=np.int64), 1.0, 1.0)
        chunks = f.params_by_octave(36)
        assert len(chunks) == 8 and len(chunks[0]) == 36 and len(chunks[-1]) == 9
