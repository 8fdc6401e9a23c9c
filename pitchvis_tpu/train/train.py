"""Training loop for the pitch-recognition model.

Optax/flax port of pitchvis_train/train.py:108-208: BCE loss, Adam
(lr=1e-5, betas 0.9/0.999, eps=1.1920929e-7) with additive weight decay
5e-4 (torch Adam semantics: decay added to the gradient before the moment
update), batch 300, 32 epochs, 80/20 random split, micro-F1 + accuracy eval.
Checkpoints go through orbax instead of TorchScript.

Data layout matches the reference's data.npy: flat f32 rows of
(n_buckets VQT dB values + 128 MIDI targets); windows of T consecutive
frames are the model input (train.py:17-46).
"""

from __future__ import annotations

import dataclasses
import json
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.pitch_mlp import N_MIDI, PitchMLP


@dataclasses.dataclass
class TrainConfig:
    n_buckets: int = 7 * 36
    t_window: int = 5
    mlp_size: int = 1024
    mlp_layers: int = 2
    dropout: float = 0.1
    epochs: int = 32
    batch_size: int = 300
    learning_rate: float = 1e-5
    weight_decay: float = 5e-4
    beta1: float = 0.9
    beta2: float = 0.999
    eps: float = 1.1920929e-7
    train_fraction: float = 0.8
    seed: int = 0
    # --- tuned-mode knobs (defaults reproduce the reference exactly) ---
    # schedule: "const" = reference (fixed lr, additive torch-Adam decay);
    # "warmup_cosine" = linear warmup then cosine decay with DECOUPLED
    # weight decay (AdamW) — converges far past the reference's plateau.
    schedule: str = "const"
    warmup_frac: float = 0.05
    steps_hint: int = 0  # total steps for the schedule; set by train()


def tuned_config(**overrides) -> TrainConfig:
    """A deliberately-better-than-reference recipe: same model, same data,
    same split/eval — only the optimizer is modernized (AdamW, lr 3e-4,
    5% linear warmup, cosine decay, batch 1024). The reference's lr=1e-5
    constant-lr torch-Adam (train.py:144) leaves the model far from
    converged at 32 epochs; this recipe is the framework's "beat the
    baseline" training mode. Reference hparams remain the default."""
    base = dict(
        learning_rate=3e-4,
        batch_size=1024,
        eps=1e-8,
        schedule="warmup_cosine",
    )
    base.update(overrides)
    return TrainConfig(**base)


def window_data(flat: np.ndarray, cfg: TrainConfig) -> tuple[np.ndarray, np.ndarray]:
    """Reshapes the flat data rows and windows T consecutive VQT frames
    (train.py:17-34): inputs (N-T+1, T*n_buckets), targets at the window's
    last frame."""
    row = cfg.n_buckets + N_MIDI
    data = flat.reshape(-1, row)
    vqt = data[:, : cfg.n_buckets]
    midi = data[:, cfg.n_buckets :]
    t = cfg.t_window
    n = vqt.shape[0] - t + 1
    if n <= 0:
        raise ValueError("not enough frames for one window")
    idx = np.arange(t)[None, :] + np.arange(n)[:, None]
    x = vqt[idx].reshape(n, t * cfg.n_buckets)
    y = midi[t - 1 :]
    return x.astype(np.float32), y.astype(np.float32)


def make_model(cfg: TrainConfig) -> PitchMLP:
    return PitchMLP(
        input_bins=cfg.t_window * cfg.n_buckets,
        mlp_size=cfg.mlp_size,
        mlp_layers=cfg.mlp_layers,
        dropout=cfg.dropout,
    )


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    if cfg.schedule == "warmup_cosine":
        total = max(cfg.steps_hint, 1)
        lr = optax.warmup_cosine_decay_schedule(
            init_value=0.0,
            peak_value=cfg.learning_rate,
            warmup_steps=max(int(total * cfg.warmup_frac), 1),
            decay_steps=total,
        )
        # decoupled (AdamW) decay: applied after the moment update, scaled
        # by the live lr — unlike the reference's additive torch-Adam decay.
        return optax.chain(
            optax.scale_by_adam(b1=cfg.beta1, b2=cfg.beta2, eps=cfg.eps),
            optax.add_decayed_weights(cfg.weight_decay),
            optax.scale_by_learning_rate(lr),
        )
    # reference-exact: torch Adam semantics (decay added to the gradient
    # BEFORE the moment update), constant lr (train.py:144).
    return optax.chain(
        optax.add_decayed_weights(cfg.weight_decay),
        optax.scale_by_adam(b1=cfg.beta1, b2=cfg.beta2, eps=cfg.eps),
        optax.scale(-cfg.learning_rate),
    )


def bce_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """nn.BCELoss: mean binary cross-entropy on probabilities."""
    eps = 1e-7
    p = jnp.clip(pred, eps, 1.0 - eps)
    return -jnp.mean(target * jnp.log(p) + (1.0 - target) * jnp.log(1.0 - p))


@partial(jax.jit, static_argnums=(0, 1))
def train_step(model, tx, params, opt_state, x, y, dropout_key):
    def loss_fn(p):
        pred = model.apply(p, x, train=True, rngs={"dropout": dropout_key})
        return bce_loss(pred, y)

    loss, grads = jax.value_and_grad(loss_fn)(params)
    updates, opt_state = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss


@partial(jax.jit, static_argnums=(0,))
def eval_step(model, params, x, y):
    pred = model.apply(params, x)
    predicted = pred > 0.5
    labels = y > 0.5
    tp = jnp.sum(predicted & labels)
    fp = jnp.sum(predicted & ~labels)
    fn = jnp.sum(~predicted & labels)
    correct = jnp.sum(predicted == labels)
    return tp, fp, fn, correct, predicted.size


def train(
    data: np.ndarray,
    cfg: TrainConfig | None = None,
    *,
    checkpoint_dir: str | None = None,
    log_every: int = 50,
    epochs: int | None = None,
):
    """Trains on a flat data array (the data.npy layout). Returns
    (params, metrics dict)."""
    cfg = cfg or TrainConfig()
    if epochs is not None:
        cfg = dataclasses.replace(cfg, epochs=epochs)
    x, y = window_data(np.asarray(data, np.float32), cfg)

    rng = np.random.default_rng(cfg.seed)
    perm = rng.permutation(len(x))
    n_train = int(len(x) * cfg.train_fraction)
    train_idx, test_idx = perm[:n_train], perm[n_train:]

    model = make_model(cfg)
    # the final partial batch trains too, like the reference's DataLoader
    # default (drop_last=False, pitchvis_train/train.py:108-116) — dropping
    # it made any run with n_train < batch_size train ZERO steps
    per_epoch = -(-n_train // cfg.batch_size) if n_train else 0
    cfg = dataclasses.replace(cfg, steps_hint=cfg.epochs * per_epoch)
    tx = make_optimizer(cfg)
    key = jax.random.PRNGKey(cfg.seed)
    params = model.init(key, jnp.zeros((1, 1, cfg.t_window * cfg.n_buckets)))
    opt_state = tx.init(params)

    b = cfg.batch_size
    step = 0
    epoch_losses: list[float] = []
    for epoch in range(cfg.epochs):
        rng.shuffle(train_idx)
        losses = []
        for i in range(0, len(train_idx), b):
            batch = train_idx[i : i + b]
            key, sub = jax.random.split(key)
            params, opt_state, loss = train_step(
                model, tx, params, opt_state, jnp.asarray(x[batch]), jnp.asarray(y[batch]), sub
            )
            losses.append(float(loss))
            step += 1
        if losses:
            epoch_losses.append(float(np.mean(losses)))
            print(f"[epoch {epoch + 1}] loss: {epoch_losses[-1]:.4f}", flush=True)

    # evaluation (micro-F1 + accuracy, train.py:164-198)
    tp = fp = fn = correct = total = 0
    for i in range(0, len(test_idx), b):
        batch = test_idx[i : i + b]
        r = eval_step(model, params, jnp.asarray(x[batch]), jnp.asarray(y[batch]))
        tp += int(r[0]); fp += int(r[1]); fn += int(r[2]); correct += int(r[3]); total += int(r[4])
    f1 = 2 * tp / max(2 * tp + fp + fn, 1)
    acc = correct / max(total, 1)
    metrics = {"f1_micro": f1, "accuracy": acc, "steps": step, "epoch_loss": epoch_losses}
    print(f"micro-F1: {f1:.3f}, accuracy: {acc:.3%}")

    if checkpoint_dir:
        save_checkpoint(checkpoint_dir, params, cfg, metrics)
    return params, metrics


def save_checkpoint(path: str, params, cfg: TrainConfig, metrics: dict) -> None:
    import orbax.checkpoint as ocp
    import os

    path = os.path.abspath(path)
    ckpt = ocp.StandardCheckpointer()
    # nanosecond stamp: two saves within the same second must not collide
    # (orbax raises on an existing directory, losing the trained params)
    ckpt.save(os.path.join(path, f"model_{time.time_ns()}"), params)
    ckpt.wait_until_finished()
    ckpt.close()
    with open(os.path.join(path, "train_meta.json"), "w") as f:
        json.dump({"config": dataclasses.asdict(cfg), "metrics": metrics}, f)


def load_checkpoint(path: str, cfg: TrainConfig):
    import orbax.checkpoint as ocp
    import os

    ckpt = ocp.StandardCheckpointer()
    model = make_model(cfg)
    template = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, cfg.t_window * cfg.n_buckets)))
    dirs = sorted(
        (d
         for d in os.listdir(path)
         if d.startswith("model_") and not d.endswith("-tmp")
         and d.split("_", 1)[1].isdigit()),  # skip strays like "model_best"
        key=lambda d: int(d.split("_", 1)[1]),  # numeric: second- and
        # nanosecond-stamped names must not compare lexicographically
    )
    if not dirs:
        raise FileNotFoundError(
            f"no model_<step> checkpoint under {path!r} (training may have "
            "crashed before its first save; orbax staging dirs end in -tmp "
            "and are skipped)"
        )
    return ckpt.restore(os.path.join(os.path.abspath(path), dirs[-1]), template)
