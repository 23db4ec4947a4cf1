"""Leveled logging with once-per-condition dedup.

TPU-native equivalent of the reference's ``GSplatLogger`` /
``GSplatOneTimeLogger`` (``gsplat_plugin/src/GSplatLogger.C:23-138``): three
levels routed to streams, printf-style formatting, thousands separators for
counts, and — the pattern SURVEY.md §5 flags as worth keeping verbatim — a
once-per-key suppressor that logs a condition the first time only and can be
*reset* so the message fires again when the condition recurs after clearing.

Built on the stdlib ``logging`` module rather than raw streams so host
applications can route/filter as usual.
"""

from __future__ import annotations

import logging
import sys
from typing import Set

_ROOT_NAME = "gsplat_tpu"
_configured = False


def _configure_root() -> None:
    global _configured
    if _configured:
        return
    root = logging.getLogger(_ROOT_NAME)
    if not root.handlers:
        handler = logging.StreamHandler(sys.stderr)
        handler.setFormatter(
            logging.Formatter("[%(levelname)s] %(name)s: %(message)s")
        )
        root.addHandler(handler)
        root.setLevel(logging.INFO)
    _configured = True


def format_count(n: int) -> str:
    """Thousands-separated integer (``GSplatLogger::formatInteger``,
    ``src/GSplatLogger.C:69-84``)."""
    return f"{int(n):,}"


class OnceLogger:
    """Logger with per-key one-time suppression.

    ``*_once`` methods log a given message only the first time (keyed by
    level+message like the reference's hash dedup, or by an explicit ``key``);
    :meth:`reset_once` re-arms a key so the message can fire again — the
    reference uses this to re-warn when a cleared condition recurs
    (``src/GSplatLogger.C:102-138``).
    """

    def __init__(self, name: str):
        _configure_root()
        self._log = logging.getLogger(f"{_ROOT_NAME}.{name}")
        self._seen: Set[str] = set()

    # plain passthroughs
    def info(self, msg: str, *args) -> None:
        self._log.info(msg, *args)

    def warning(self, msg: str, *args) -> None:
        self._log.warning(msg, *args)

    def error(self, msg: str, *args) -> None:
        self._log.error(msg, *args)

    # once-per-key variants
    def _once(self, level: int, msg: str, key: str | None) -> None:
        k = key if key is not None else f"{level}:{msg}"
        if k in self._seen:
            return
        self._seen.add(k)
        self._log.log(level, msg)

    def info_once(self, msg: str, key: str | None = None) -> None:
        self._once(logging.INFO, msg, key)

    def warning_once(self, msg: str, key: str | None = None) -> None:
        self._once(logging.WARNING, msg, key)

    def error_once(self, msg: str, key: str | None = None) -> None:
        self._once(logging.ERROR, msg, key)

    def reset_once(self, key: str) -> None:
        """Re-arm a suppressed key (fire again when the condition recurs)."""
        self._seen.discard(key)


_loggers: dict = {}


def get_logger(name: str) -> OnceLogger:
    if name not in _loggers:
        _loggers[name] = OnceLogger(name)
    return _loggers[name]
