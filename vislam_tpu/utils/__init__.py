from vislam_tpu.utils.config import (
    FrontendConfig,
    BackendConfig,
    EngineConfig,
    SystemConfig,
)
from vislam_tpu.utils.timing import StageTimer

__all__ = [
    "FrontendConfig",
    "BackendConfig",
    "EngineConfig",
    "SystemConfig",
    "StageTimer",
]
