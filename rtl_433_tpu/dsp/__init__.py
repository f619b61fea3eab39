from . import baseband
from .engine import (
    DetectorParams,
    detector_init,
    process_block,
)
