"""Serving-state checkpoint/resume.

The reference persists only user settings and ML artifacts (SURVEY.md §5);
a long-running multi-stream server additionally wants its pipeline carry
(ring buffers, AGC gains, EMA/calmness state) to survive restarts. Orbax
handles the pytree; the VQT parameters are stored alongside so a restore
can rebuild the matching kernel.
"""

from __future__ import annotations

import dataclasses
import json
import os
import shutil

from ..core.config import (
    AgcParameters,
    AnalysisParameters,
    PeakDetectionParameters,
    VqtParameters,
    VqtRange,
)
from ..models.pipeline import PipelineState, init_pipeline_state


def _stage_dir(path: str) -> str:
    """Fresh staging directory next to ``path`` (same filesystem, so the
    commit renames are atomic); a leftover from a crashed save is cleared."""
    tmp = path + ".tmp"
    if os.path.isdir(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp)
    return tmp


def _commit_dir(tmp: str, path: str) -> None:
    """Crash-safe checkpoint commit: the fully-written staging directory
    replaces ``path`` via renames, so at every instant the on-disk state is
    either the complete previous checkpoint, the complete new one, or (for
    the instant between the two renames) only ``path.old`` — which the
    loaders fall back to. Without this, a crash mid-save destroyed the
    previous good checkpoint or left a silently inconsistent
    mixed-generation directory."""
    old = path + ".old"
    if os.path.exists(path):
        if os.path.isdir(old):
            shutil.rmtree(old)
        os.rename(path, old)
    # When ``path`` is absent (a prior save crashed between the renames and
    # only ``path.old`` survives), install the new generation BEFORE touching
    # ``path.old`` — clearing it first would leave a window with zero
    # loadable checkpoints.
    os.rename(tmp, path)
    if os.path.isdir(old):
        shutil.rmtree(old)


def _resolve_dir(path: str, marker: str) -> str:
    """Where to load from: ``path`` when it holds a complete checkpoint
    (its ``marker`` metadata is written last), else the ``path.old``
    generation a crash between _commit_dir's renames leaves behind."""
    path = os.path.abspath(path)
    if not os.path.exists(os.path.join(path, marker)) and os.path.exists(
        os.path.join(path + ".old", marker)
    ):
        return path + ".old"
    return path


def save_pipeline_state(
    path: str,
    state: PipelineState,
    params: VqtParameters,
    analysis_params: AnalysisParameters | None = None,
    agc_params: AgcParameters | None = None,
) -> None:
    """Pass the pipeline's ``analysis_params``/``agc_params`` too when they
    differ from the defaults: the restored EMA/calmness/gain carries are
    only meaningful under the SAME time constants and AGC target they were
    stepped with (``load_pipeline_config`` returns them for reconstruction;
    the server checkpoint persists its analysis params for this reason)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    tmp = _stage_dir(path)
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(os.path.join(tmp, "pipeline_state"), state, force=True)
    ckpt.wait_until_finished()
    ckpt.close()
    meta = {
        "params": dataclasses.asdict(params),
        "analysis_params": (
            dataclasses.asdict(analysis_params) if analysis_params is not None else None
        ),
        "agc_params": (
            dataclasses.asdict(agc_params) if agc_params is not None else None
        ),
        "n_streams": int(state.ring.buffer.shape[0]),
        "buffer_len": int(state.ring.buffer.shape[1]),
        # record the optional fused-stage carries so the restore template's
        # pytree structure matches (a template without them fails to restore
        # checkpoints saved from ML/viewer-fused pipelines)
        "ml_t_window": int(state.ml.history.shape[1]) if state.ml is not None else None,
        "with_viewer": state.balls is not None,
    }
    with open(os.path.join(tmp, "pipeline_meta.json"), "w") as f:
        json.dump(meta, f)
    _commit_dir(tmp, path)


def load_pipeline_config(
    path: str,
) -> tuple[VqtParameters, AnalysisParameters | None, AgcParameters | None]:
    """The full parameter set a checkpointed pipeline ran under (analysis/
    AGC entries are None for checkpoints saved without them — i.e. defaults
    or a pre-upgrade save)."""
    with open(
        os.path.join(_resolve_dir(path, "pipeline_meta.json"), "pipeline_meta.json")
    ) as f:
        meta = json.load(f)
    ap = meta.get("analysis_params")
    gp = meta.get("agc_params")
    return (
        _vqt_params_from_dict(meta["params"]),
        _analysis_params_from_dict(ap) if ap is not None else None,
        AgcParameters(**gp) if gp is not None else None,
    )


def load_pipeline_state(path: str) -> tuple[PipelineState, VqtParameters]:
    import orbax.checkpoint as ocp

    path = _resolve_dir(path, "pipeline_meta.json")
    with open(os.path.join(path, "pipeline_meta.json")) as f:
        meta = json.load(f)
    params = _vqt_params_from_dict(meta["params"])

    ckpt = ocp.StandardCheckpointer()
    template = init_pipeline_state(
        meta["n_streams"],
        params,
        meta["buffer_len"],
        ml_t_window=meta.get("ml_t_window"),
        with_viewer=meta.get("with_viewer", False),
    )
    state = ckpt.restore(os.path.join(path, "pipeline_state"), template)
    return state, params


# ---------------------------------------------------------------------------
# StreamServer (native rings + analysis carries)
# ---------------------------------------------------------------------------


def _vqt_params_from_dict(d: dict) -> VqtParameters:
    d = dict(d)
    rng = d.pop("range")
    return VqtParameters(range=VqtRange(**rng), **d)


def _analysis_params_from_dict(d: dict) -> AnalysisParameters:
    d = dict(d)
    d["peak_config"] = PeakDetectionParameters(**d["peak_config"])
    d["bassline_peak_config"] = PeakDetectionParameters(**d["bassline_peak_config"])
    return AnalysisParameters(**d)


def save_server_state(path: str, server) -> None:
    """Checkpoints a running StreamServer: the native ring bank image
    (audio windows, total-written counters, AGC gains), the per-stream
    analysis carries (orbax), and the parameter set / serving flags needed
    to rebuild the matching kernel on restore.

    The analysis carries and the ring image are captured back to back, not
    as one atomic cut: the carries are captured FIRST, so streams that
    receive audio during the save may be up to one hop newer in the ring
    than in the carries (the same skew a live step tolerates — restore
    simply replays that audio). The opposite order would be unsafe: carries
    computed from audio absent from the saved ring. Safe to call from the
    control plane while ingest and step() continue."""
    import numpy as np
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    tmp = _stage_dir(path)
    with server._state_lock:
        state = server.analysis_state
        ml_state = server.ml_state
        balls_state = server.balls_state
        vqt_params = server.vqt_params
    audio, heads, gains = server.rings.export_state()
    np.savez_compressed(
        os.path.join(tmp, "server_rings.npz"), audio=audio, heads=heads, gains=gains
    )
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(os.path.join(tmp, "server_analysis_state"), state, force=True)
    if ml_state is not None:
        ckpt.save(os.path.join(tmp, "server_ml_state"), ml_state, force=True)
    if balls_state is not None:
        ckpt.save(os.path.join(tmp, "server_balls_state"), balls_state, force=True)
    ckpt.wait_until_finished()
    ckpt.close()
    meta = {
        "vqt_params": dataclasses.asdict(vqt_params),
        "analysis_params": dataclasses.asdict(server.analysis_params),
        "n_streams": server.n_streams,
        "capacity": server.rings.capacity,
        "path": server.path,
        "fast": server.fast,
        # round-4 serving config (ml_model/mesh are code/topology, not data —
        # the caller re-attaches them at restore_server())
        "ingest": server.ingest,
        "hop": server._hop,
        "max_lag": server._max_lag,
        "max_catchup": server._max_catchup,
        "with_led": server.with_led,
        "with_viewer": server.with_viewer,
        "fetch": server.fetch,
        "ml_t_window": server._ml_t,
        "has_ml_state": ml_state is not None,
    }
    with open(os.path.join(tmp, "server_meta.json"), "w") as f:
        json.dump(meta, f)
    _commit_dir(tmp, path)


def restore_server(path: str, ml_model=None, ml_params=None, mesh=None):
    """Rebuilds a StreamServer from save_server_state: same parameters and
    serving config (ingest mode, hop pacing, fused output stages), ring
    audio/write-positions/AGC gains and the full carried state (analysis +
    ML history + ball fades) restored, so trajectories continue where the
    dead process left off (restart drill: tests/test_runtime.py). Producers
    re-attach to their previous slots afterwards.

    ``ml_model``/``ml_params`` re-attach the (unserializable) flax module a
    checkpointed ML-serving server used — required when the checkpoint
    carries an ML history. ``mesh`` re-attaches a device mesh (topology is
    not checkpointable)."""
    import numpy as np
    import orbax.checkpoint as ocp

    from ..models.analysis import init_state_batch
    from .server import StreamServer

    path = _resolve_dir(path, "server_meta.json")
    with open(os.path.join(path, "server_meta.json")) as f:
        meta = json.load(f)
    vqt_params = _vqt_params_from_dict(meta["vqt_params"])
    analysis_params = _analysis_params_from_dict(meta["analysis_params"])
    if meta.get("has_ml_state") and (ml_model is None or ml_params is None):
        raise ValueError(
            "checkpoint carries an ML history; pass BOTH ml_model and "
            "ml_params to restore_server to continue identical serving"
        )

    server = StreamServer(
        meta["n_streams"],
        vqt_params,
        analysis_params,
        buffer_seconds=meta["capacity"] / vqt_params.sr,
        path=meta["path"],
        fast=meta["fast"],
        ingest=meta.get("ingest", "delta"),
        hop_seconds=meta.get("hop", int(vqt_params.sr / 60.0)) / vqt_params.sr,
        max_lag_seconds=meta.get("max_lag", int(vqt_params.sr * 0.25)) / vqt_params.sr,
        max_catchup_hops=meta.get("max_catchup", 1),
        ml_model=ml_model,
        ml_params=ml_params,
        ml_t_window=meta.get("ml_t_window"),
        with_led=meta.get("with_led", False),
        with_viewer=meta.get("with_viewer", False),
        fetch=meta.get("fetch", "full"),
        mesh=mesh,
    )
    if server.rings.capacity != meta["capacity"]:  # defensive: rounding drift
        raise RuntimeError(
            f"restored capacity {server.rings.capacity} != saved {meta['capacity']}"
        )
    # exact integers survive the float seconds roundtrip defensively
    if "hop" in meta:
        server._hop = int(meta["hop"])
    if "max_lag" in meta:
        server._max_lag = int(meta["max_lag"])
    rings = np.load(os.path.join(path, "server_rings.npz"))
    server.rings.import_state(rings["audio"], rings["heads"], rings["gains"])

    ckpt = ocp.StandardCheckpointer()
    template = init_state_batch(meta["n_streams"], vqt_params.n_buckets)
    # _put_state re-pins the mesh sharding and is the identity otherwise
    server.analysis_state = server._put_state(
        ckpt.restore(os.path.join(path, "server_analysis_state"), template)
    )
    if meta.get("has_ml_state") and server.ml_state is not None:
        server.ml_state = server._put_state(
            ckpt.restore(os.path.join(path, "server_ml_state"), server.ml_state)
        )
    if server.balls_state is not None and os.path.isdir(
        os.path.join(path, "server_balls_state")
    ):
        server.balls_state = server._put_state(
            ckpt.restore(os.path.join(path, "server_balls_state"), server.balls_state)
        )
    ckpt.close()
    return server
