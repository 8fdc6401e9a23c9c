"""pitchvis_tpu: a TPU-native (JAX/XLA/Pallas) real-time musical pitch
analysis framework with the capabilities of PitchVis (heinzelotto/pitchvis).

Core pipeline: audio -> AGC -> VQT (variable-Q transform) -> analysis
(peaks, calmness, tuning) -> colors/LED/display outputs, built as batched,
fused XLA computation serving thousands of concurrent streams per chip.
"""

from .core.config import (
    AgcParameters,
    AnalysisParameters,
    ColorParameters,
    PeakDetectionParameters,
    VqtParameters,
    VqtRange,
)
from .core.errors import AboveNyquistError, VqtError, WindowExceedsNFftError
from .kernel.builder import VqtKernel, build_kernel, get_kernel, kernel_stats
from .models.analysis import (
    AnalysisOutputs,
    AnalysisState,
    analysis_step,
    analysis_step_batch,
    init_state_batch,
)
from .models.pipeline import PipelineState, StreamingPipeline, pipeline_step
from .models.render import (
    DebugInputs,
    RenderConfig,
    render_batch,
    render_frame,
    render_streams,
)
from .runtime.loop import ServeLoop
from .runtime.server import CompactOutputs, ServeOutputs, StreamServer
from .ops.vqt import (
    Vqt,
    VqtArrays,
    make_vqt_arrays,
    power_to_db,
    vqt_db_auto,
    vqt_db_batch,
    vqt_power_batch,
)
from .utils.compile_cache import enable_compilation_cache

__version__ = "0.1.0"

__all__ = [
    "AgcParameters",
    "AnalysisParameters",
    "ColorParameters",
    "PeakDetectionParameters",
    "VqtParameters",
    "VqtRange",
    "VqtError",
    "AboveNyquistError",
    "WindowExceedsNFftError",
    "VqtKernel",
    "AnalysisOutputs",
    "AnalysisState",
    "analysis_step",
    "analysis_step_batch",
    "init_state_batch",
    "PipelineState",
    "StreamingPipeline",
    "pipeline_step",
    "StreamServer",
    "ServeLoop",
    "ServeOutputs",
    "CompactOutputs",
    "build_kernel",
    "get_kernel",
    "kernel_stats",
    "Vqt",
    "VqtArrays",
    "make_vqt_arrays",
    "vqt_db_auto",
    "vqt_db_batch",
    "vqt_power_batch",
    "power_to_db",
    "enable_compilation_cache",
    "RenderConfig",
    "DebugInputs",
    "render_frame",
    "render_batch",
    "render_streams",
]
