from .logging import Logging, CSVlogger
from .seed import set_seed
from . import checkpoint, video

__all__ = ["Logging", "CSVlogger", "set_seed", "checkpoint", "video"]
