from .logging import log_print  # noqa: F401
