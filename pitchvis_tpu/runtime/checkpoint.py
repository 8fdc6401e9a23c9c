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



from ..core.config import (
    AnalysisParameters,
    PeakDetectionParameters,
    VqtParameters,
    VqtRange,
)
from ..models.pipeline import PipelineState, init_pipeline_state


def save_pipeline_state(path: str, state: PipelineState, params: VqtParameters) -> None:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(os.path.join(path, "pipeline_state"), state, force=True)
    ckpt.wait_until_finished()
    ckpt.close()
    meta = {
        "params": dataclasses.asdict(params),
        "n_streams": int(state.ring.buffer.shape[0]),
        "buffer_len": int(state.ring.buffer.shape[1]),
        # record the optional fused-stage carries so the restore template's
        # pytree structure matches (a template without them fails to restore
        # checkpoints saved from ML/viewer-fused pipelines)
        "ml_t_window": int(state.ml.history.shape[1]) if state.ml is not None else None,
        "with_viewer": state.balls is not None,
    }
    with open(os.path.join(path, "pipeline_meta.json"), "w") as f:
        json.dump(meta, f)


def load_pipeline_state(path: str) -> tuple[PipelineState, VqtParameters]:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with open(os.path.join(path, "pipeline_meta.json")) as f:
        meta = json.load(f)
    pd = meta["params"]
    rng = pd.pop("range")
    params = VqtParameters(range=VqtRange(**rng), **pd)

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

    The ring image and the analysis carries are captured back to back, not
    as one atomic cut: streams that receive audio during the save may be up
    to one hop newer in the ring than in the carries (the same skew a live
    step tolerates). Safe to call from the control plane while ingest and
    step() continue."""
    import numpy as np
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    audio, heads, gains = server.rings.export_state()
    with server._state_lock:
        state = server.analysis_state
        vqt_params = server.vqt_params
    np.savez_compressed(
        os.path.join(path, "server_rings.npz"), audio=audio, heads=heads, gains=gains
    )
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(os.path.join(path, "server_analysis_state"), state, force=True)
    ckpt.wait_until_finished()
    ckpt.close()
    meta = {
        "vqt_params": dataclasses.asdict(vqt_params),
        "analysis_params": dataclasses.asdict(server.analysis_params),
        "n_streams": server.n_streams,
        "capacity": server.rings.capacity,
        "path": server.path,
        "fast": server.fast,
    }
    with open(os.path.join(path, "server_meta.json"), "w") as f:
        json.dump(meta, f)


def restore_server(path: str):
    """Rebuilds a StreamServer from save_server_state: same parameters and
    serving flags, ring audio/write-positions/AGC gains and analysis carries
    restored, so spectra and calmness trajectories continue where the dead
    process left off (restart drill: tests/test_runtime.py). Producers
    re-attach to their previous slots afterwards."""
    import numpy as np
    import orbax.checkpoint as ocp

    from ..models.analysis import init_state_batch
    from .server import StreamServer

    path = os.path.abspath(path)
    with open(os.path.join(path, "server_meta.json")) as f:
        meta = json.load(f)
    vqt_params = _vqt_params_from_dict(meta["vqt_params"])
    analysis_params = _analysis_params_from_dict(meta["analysis_params"])

    server = StreamServer(
        meta["n_streams"],
        vqt_params,
        analysis_params,
        buffer_seconds=meta["capacity"] / vqt_params.sr,
        path=meta["path"],
        fast=meta["fast"],
    )
    if server.rings.capacity != meta["capacity"]:  # defensive: rounding drift
        raise RuntimeError(
            f"restored capacity {server.rings.capacity} != saved {meta['capacity']}"
        )
    rings = np.load(os.path.join(path, "server_rings.npz"))
    server.rings.import_state(rings["audio"], rings["heads"], rings["gains"])

    ckpt = ocp.StandardCheckpointer()
    template = init_state_batch(meta["n_streams"], vqt_params.n_buckets)
    server.analysis_state = ckpt.restore(
        os.path.join(path, "server_analysis_state"), template
    )
    ckpt.close()
    return server
