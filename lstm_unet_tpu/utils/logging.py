"""Timestamped logging.

Reference parity: ``utils.py::log_print`` in arbellea/LSTM-UNet prints
timestamped console messages (SURVEY.md §2, file-level citation `utils.py`).
"""

from __future__ import annotations

import sys
import time


def log_print(*args, file=None, flush: bool = True) -> None:
    """Print with a wall-clock timestamp prefix (reference: utils.py::log_print)."""
    stamp = time.strftime("%Y-%m-%d %H:%M:%S", time.localtime())
    print(f"[{stamp}]", *args, file=file or sys.stdout, flush=flush)
