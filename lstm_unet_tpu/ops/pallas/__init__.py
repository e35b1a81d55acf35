"""Pallas TPU kernels with XLA fallbacks (SURVEY.md §7 step 3).

Every kernel here has an XLA-composite twin used as the correctness oracle
in tests and as the fallback on non-TPU backends (interpret-mode covers CPU
CI; see tests/test_pallas_parity.py).
"""

from .lstm_gates import fused_lstm_gate_update  # noqa: F401
