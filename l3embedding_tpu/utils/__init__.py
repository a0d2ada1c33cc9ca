"""Shared substrate: logging/timing, experiment tracking, config capture."""

from .log import LogTimer, init_console_logger, init_file_logger  # noqa: F401
