"""Log4j bridge (reference SparkLoggerManager) and Spark Connect
session-builder wiring."""

import logging

import pytest

from datalake_iceberg_spark.loggers import SparkLogManager, get_logger
from datalake_iceberg_spark.session import build_session_builder
from datalake_iceberg_spark.settings import Settings


@pytest.fixture(autouse=True)
def fresh_singleton():
    SparkLogManager.reset()
    yield
    SparkLogManager.reset()


def test_singleton_identity():
    assert SparkLogManager() is SparkLogManager()


def test_jvm_setup_and_logger(spark):
    mgr = SparkLogManager()
    assert mgr.setup(spark, level="WARN", overrides={"org.apache.spark.scheduler": "ERROR"})
    assert mgr.mode == "jvm"
    # idempotent: second setup is a no-op returning the same mode
    assert mgr.setup(spark) is True
    log = mgr.get_logger("ingest")
    log.info("bridge smoke")  # must not raise; JVM object has info/warn/error
    log.warn("bridge smoke")
    assert "org.apache.spark.ingest" in str(log.getName())
    mgr.set_level("org.apache.spark.ingest", "DEBUG")


def test_python_fallback_without_jvm():
    class FakeConnectSession:  # no _jvm attribute, like pyspark.sql.connect
        pass

    mgr = SparkLogManager()
    assert mgr.setup(FakeConnectSession(), level="INFO") is False
    assert mgr.mode == "python"
    log = mgr.get_logger("ingest")
    log.info("py smoke")
    log.warn("py smoke")
    assert logging.getLogger("org.apache.spark").level == logging.INFO
    mgr.set_level("org.apache.spark.ingest", "ERROR")
    assert logging.getLogger("org.apache.spark.ingest").level == logging.ERROR


def test_get_logger_before_setup_is_usable():
    # reference returns None + warning here; we hand back a working shim
    get_logger("early").warn("pre-setup message")


def test_bad_level_rejected(spark):
    mgr = SparkLogManager()
    mgr.setup(spark)
    with pytest.raises(ValueError, match="unknown log level"):
        mgr.set_level("org.apache.spark", "LOUD")


def test_connect_builder_sets_remote(monkeypatch):
    monkeypatch.delenv("SPARK_REMOTE", raising=False)
    b = build_session_builder(remote="sc://example:15002")
    conf = dict(b._options)
    assert conf["spark.remote"] == "sc://example:15002"
    assert "spark.master" not in conf
    assert "spark.driver.memory" not in conf  # server-side conf, not client
    assert conf["spark.sql.session.timeZone"] == "UTC"


def test_connect_url_from_env_and_settings(monkeypatch):
    monkeypatch.setenv("SPARK_REMOTE", "sc://envhost:15002")
    conf = dict(build_session_builder()._options)
    assert conf["spark.remote"] == "sc://envhost:15002"
    monkeypatch.delenv("SPARK_REMOTE", raising=False)

    s = Settings.load(env={"SPARK_REMOTE": "sc://from-settings:15002"})
    assert s.remote == "sc://from-settings:15002"
    conf = dict(build_session_builder(settings=s)._options)
    assert conf["spark.remote"] == "sc://from-settings:15002"


def test_classic_builder_unchanged(monkeypatch):
    monkeypatch.delenv("SPARK_REMOTE", raising=False)
    conf = dict(build_session_builder(master="local[2]")._options)
    assert conf["spark.master"] == "local[2]"
    assert "spark.remote" not in conf
    assert "spark.driver.memory" in conf
