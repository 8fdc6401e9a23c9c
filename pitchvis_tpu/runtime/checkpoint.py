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



from ..core.config import VqtParameters, VqtRange
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
