"""Settings layer: env parsing, .env precedence, secret-source fill,
runner/session wiring (reference src/utils/settings.py parity)."""

import pytest

from datalake_iceberg_spark.settings import (
    DatabaseSettings,
    Settings,
    VaultSettings,
    vault_secret_source,
)

ENV = {
    "DATABASE__TYPE": "mysql",
    "DATABASE__HOST": "db.example",
    "DATABASE__PORT": "3306",
    "DATABASE__USER": "ingest",
    "DATABASE__PASSWORD": "pw",
    "STORAGE__CATALOG": "prod",
    "STORAGE__CATALOG_TYPE": "glue",
    "STORAGE__BUCKET": "lake-bucket",
    "STORAGE__DATA_PATH": "/warehouse/prod",
    "KAFKA__BOOTSTRAP_SERVERS": "k1:9092,k2:9092",
    "KAFKA__MAX_OFFSETS_PER_TRIGGER": "5000",
    "KAFKA__STARTING_OFFSETS": "latest",
    "RUNNER__CHECKPOINT_ROOT": "/tmp/ckpt",
    "RUNNER__DAG_ID": "cdc-prod",
    "RUNNER__ROUND_INTERVAL_SEC": "30",
    "SPARK_GRAFT_CPUS": "8",
}


def test_nested_env_groups():
    s = Settings.load(env=ENV)
    assert s.database.require().host == "db.example"
    assert s.database.port == 3306
    assert s.kafka.max_offsets_per_trigger == 5000
    assert s.kafka.starting_offsets == "latest"
    assert s.runner.checkpoint_root == "/tmp/ckpt"
    assert s.runner.round_interval_sec == 30
    assert s.cpus == 8
    assert s.CATALOG == "prod"
    # reference WAREHOUSE formula: s3a:// + bucket + data_path
    assert s.WAREHOUSE == "s3a://lake-bucket/warehouse/prod"


def test_case_insensitive_and_extra_ignored():
    s = Settings.load(env={"database__host": "h", "DATABASE__BOGUS": "x"})
    assert s.database.host == "h"


def test_env_file_loses_to_process_env(tmp_path):
    f = tmp_path / ".env"
    f.write_text("DATABASE__HOST=from-file\nSTORAGE__CATALOG=file-cat\n# comment\n")
    s = Settings.load(env={"DATABASE__HOST": "from-env"}, env_file=str(f))
    assert s.database.host == "from-env"         # env wins
    assert s.storage.catalog == "file-cat"       # file fills the gap


def test_secret_source_fills_only_missing():
    s = Settings.load(
        env={"DATABASE__TYPE": "mysql", "DATABASE__USER": "explicit"},
        secret_source=lambda: {"host": "vault-h", "port": 3307, "user": "vault-u",
                               "password": "vault-pw"},
    )
    assert s.database.host == "vault-h"
    assert s.database.port == 3307
    assert s.database.user == "explicit"  # env beats secret source
    assert s.database.password == "vault-pw"


def test_require_reports_missing():
    with pytest.raises(ValueError, match="missing"):
        DatabaseSettings().require()


def test_unknown_override_rejected():
    with pytest.raises(ValueError, match="unknown settings override"):
        Settings.load(env={}, bogus=1)


def test_vault_source_needs_config_and_client():
    with pytest.raises(ValueError, match="incomplete"):
        vault_secret_source(VaultSettings())()
    full = VaultSettings(url="http://v", username="r", password="s", secret_path="kv/x")
    try:
        import hvac  # noqa: F401
    except ImportError:
        with pytest.raises(RuntimeError, match="hvac is not installed"):
            vault_secret_source(full)()


def test_runner_from_settings(spark):
    from datalake_iceberg_spark.streaming.runner import CdcStreamRunner

    s = Settings.load(env=ENV)
    r = CdcStreamRunner.from_settings(spark, settings=s)
    assert r.checkpoint_root == "/tmp/ckpt"
    assert r.dag_id == "cdc-prod"


def test_session_uses_settings_driver_mem():
    from datalake_iceberg_spark.session import create_spark_session

    # getOrCreate returns the shared session; we only assert the call
    # path accepts a Settings and doesn't regress
    s = Settings.load(env={"SPARK_GRAFT_DRIVER_MEM": "4g", "SPARK_GRAFT_CPUS": "4"})
    assert s.driver_memory == "4g"
    spark = create_spark_session(app_name="settings-smoke", settings=s)
    assert spark is not None
