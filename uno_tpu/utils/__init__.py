from uno_tpu.utils.logger import Logger
from uno_tpu.utils.statistics import Statistics
from uno_tpu.utils.callbacks import UserCallbacks, NoUserCallbacks, RecordingCallbacks

__all__ = ["Logger", "Statistics", "UserCallbacks", "NoUserCallbacks",
           "RecordingCallbacks"]
