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
