from vislam_tpu.engine.state import EngineState, KeyframeWindow, init_state
from vislam_tpu.engine.engine import VIOEngine, FrameResult

__all__ = ["EngineState", "KeyframeWindow", "init_state", "VIOEngine", "FrameResult"]
