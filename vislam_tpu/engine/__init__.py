from vislam_tpu.engine.state import EngineState, KeyframeWindow, init_state
from vislam_tpu.engine.engine import VIOEngine, FrameResult
from vislam_tpu.engine.batch import (
    SequenceInputs,
    make_sequence_inputs,
    stage_dataset,
    run_sequence_scan,
    run_batch_scan,
)

__all__ = [
    "EngineState",
    "KeyframeWindow",
    "init_state",
    "VIOEngine",
    "FrameResult",
    "SequenceInputs",
    "make_sequence_inputs",
    "stage_dataset",
    "run_sequence_scan",
    "run_batch_scan",
]
