from . import native
from .control import ControlServer, poke
from .framing import (
    FLAG_CONFIG,
    FLAG_LAST,
    Frame,
    FrameDecoder,
    FrameError,
    decode_frame,
    encode_frame,
    encode_iq_frame,
)
from .stream import CpiMetrics, StreamingPipeline, StreamStats
from .uart import DspBlockUart, UartParams, UartRegs
