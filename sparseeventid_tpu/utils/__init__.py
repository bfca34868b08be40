from .logger import Logger, getLogger  # noqa: F401
from .checkpoint import (  # noqa: F401
    CheckpointManager,
    encoder_freeze_mask,
    load_encoder_only,
)
from .telemetry import StepTimer, SummaryWriter, format_log_message  # noqa: F401
