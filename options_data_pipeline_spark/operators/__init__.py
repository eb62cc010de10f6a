from .ohlc import ohlc_candles
from .truerange import with_true_range
from .atr import with_wilder_atr, atr_summary
from .gapfill import gap_fill
from .ids import with_row_id

__all__ = [
    "ohlc_candles",
    "with_true_range",
    "with_wilder_atr",
    "atr_summary",
    "gap_fill",
    "with_row_id",
]
