"""Log4j 2 bridge for driver-side logging.

The reference ships a singleton ``SparkLoggerManager``
(``src/utils/spark.py:91-134``) that reaches through the Spark JVM
gateway to initialize Log4j 2, pin logger levels, and hand out JVM
logger objects so Python driver code logs into the same sink as Spark
itself (one interleaved, correctly-ordered log on the cluster).

Spark-first re-expression:

- Same singleton + double-checked-lock shape, same swallow-and-report
  failure policy (logging must never take down an ingest round).
- ``setup`` accepts per-logger level overrides (the reference hardcodes
  one ``org.apache.spark`` pin; deployments want to quiet noisy
  subsystems individually).
- Spark Connect sessions have no JVM gateway — ``get_logger`` degrades
  to a stdlib :mod:`logging` logger with the same method surface
  (``info/warn/error/debug``), so callers never branch.
"""

from __future__ import annotations

import logging as _pylogging
import threading

_LEVELS = ("OFF", "FATAL", "ERROR", "WARN", "INFO", "DEBUG", "TRACE", "ALL")
_PY_LEVELS = {
    "OFF": _pylogging.CRITICAL + 10,
    "FATAL": _pylogging.CRITICAL,
    "ERROR": _pylogging.ERROR,
    "WARN": _pylogging.WARNING,
    "INFO": _pylogging.INFO,
    "DEBUG": _pylogging.DEBUG,
    "TRACE": _pylogging.DEBUG - 5,
    "ALL": 1,
}


class _PyLoggerShim:
    """stdlib logger wearing the Log4j method surface (``warn``, no
    f-string formatting differences) — the Connect-mode fallback."""

    def __init__(self, name: str):
        self._log = _pylogging.getLogger(name)

    def info(self, msg: str) -> None:
        self._log.info(msg)

    def warn(self, msg: str) -> None:
        self._log.warning(msg)

    def error(self, msg: str) -> None:
        self._log.error(msg)

    def debug(self, msg: str) -> None:
        self._log.debug(msg)


class SparkLogManager:
    """Process-wide Log4j 2 manager (singleton, thread-safe)."""

    _instance: "SparkLogManager | None" = None
    _lock = threading.Lock()

    def __new__(cls) -> "SparkLogManager":
        if cls._instance is None:
            with cls._lock:
                if cls._instance is None:
                    inst = super().__new__(cls)
                    inst._initialized = False
                    inst._jvm = None
                    inst._root_ns = "org.apache.spark"
                    cls._instance = inst
        return cls._instance

    @classmethod
    def reset(cls) -> None:
        """Drop the singleton (test isolation only)."""
        with cls._lock:
            cls._instance = None

    @property
    def initialized(self) -> bool:
        return self._initialized

    @property
    def mode(self) -> str:
        """``jvm`` after a classic-session setup, ``python`` otherwise."""
        return "jvm" if self._jvm is not None else "python"

    def setup(
        self,
        spark,
        level: str = "WARN",
        overrides: dict[str, str] | None = None,
        root_namespace: str = "org.apache.spark",
    ) -> bool:
        """Initialize against a live session. Returns True when the JVM
        Log4j path is active, False when degraded to stdlib logging
        (Spark Connect, or any gateway failure — never raises)."""
        if self._initialized:
            return self._jvm is not None
        with self._lock:
            if self._initialized:
                return self._jvm is not None
            self._root_ns = root_namespace
            jvm = getattr(spark, "_jvm", None)  # absent on Connect sessions
            if jvm is not None:
                try:
                    self._configure_jvm(jvm, level, overrides or {})
                    self._jvm = jvm
                except Exception as exc:  # logging must never break a run
                    self._jvm = None
                    _pylogging.getLogger(__name__).warning(
                        "Log4j 2 setup failed, using python logging: %s", exc
                    )
            if self._jvm is None:
                self._configure_python(level, overrides or {})
            self._initialized = True
            return self._jvm is not None

    def _configure_jvm(self, jvm, level: str, overrides: dict[str, str]) -> None:
        configurator = jvm.org.apache.logging.log4j.core.config.Configurator
        configurator.setLevel(self._root_ns, self._jvm_level(jvm, level))
        for name, lvl in overrides.items():
            configurator.setLevel(name, self._jvm_level(jvm, lvl))

    def _configure_python(self, level: str, overrides: dict[str, str]) -> None:
        _pylogging.getLogger(self._root_ns).setLevel(self._py_level(level))
        for name, lvl in overrides.items():
            _pylogging.getLogger(name).setLevel(self._py_level(lvl))

    @staticmethod
    def _jvm_level(jvm, level: str):
        name = level.upper()
        if name not in _LEVELS:
            raise ValueError(f"unknown log level {level!r}; one of {_LEVELS}")
        return getattr(jvm.org.apache.logging.log4j.Level, name)

    @staticmethod
    def _py_level(level: str) -> int:
        name = level.upper()
        if name not in _PY_LEVELS:
            raise ValueError(f"unknown log level {level!r}; one of {_LEVELS}")
        return _PY_LEVELS[name]

    def set_level(self, name: str, level: str) -> None:
        """Re-pin one logger's level after setup (either mode)."""
        if self._jvm is not None:
            configurator = self._jvm.org.apache.logging.log4j.core.config.Configurator
            configurator.setLevel(name, self._jvm_level(self._jvm, level))
        else:
            _pylogging.getLogger(name).setLevel(self._py_level(level))

    def get_logger(self, name: str = ""):
        """A logger under the root namespace: the JVM Log4j logger when
        the gateway is live, a stdlib shim otherwise. Always usable —
        before ``setup`` the shim is returned (reference warns and
        returns None; returning a working logger is strictly safer)."""
        full = f"{self._root_ns}.{name}" if name else self._root_ns
        if self._jvm is not None:
            try:
                return self._jvm.org.apache.logging.log4j.LogManager.getLogger(full)
            except Exception:
                pass
        return _PyLoggerShim(full)


def get_logger(name: str = ""):
    """Module-level convenience mirroring the reference's usage sites."""
    return SparkLogManager().get_logger(name)
