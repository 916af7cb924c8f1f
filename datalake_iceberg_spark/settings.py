"""Environment-driven configuration (the reference's settings layer,
``src/utils/settings.py:48-117``, re-expressed without mandatory
third-party deps).

Semantics preserved from the reference:

- **Nested env keys** with the ``__`` delimiter: ``DATABASE__HOST``,
  ``STORAGE__BUCKET``, ``KAFKA__BOOTSTRAP_SERVERS`` … (case-insensitive).
- **.env file** support: ``KEY=VALUE`` lines, ``#`` comments, later
  real-environment values win over the file.
- **Secret source seam**: a callable that returns database credentials
  (host/port/user/password) fills any field the env left unset — the
  reference pulls these from Vault KV v2 via AppRole
  (``VaultSettingsSource``); here the adapter is injected so the engine
  never imports a Vault client. ``vault_secret_source`` builds one
  lazily IF ``hvac`` happens to be importable, mirroring the reference's
  read path, and raises a clear error otherwise.
- **Precedence**: explicit kwargs > process env > .env file > secret
  source (matching the reference's customise_sources order).
- ``CATALOG`` / ``WAREHOUSE`` convenience properties.

Groups the reference defines that are cloud-service bound (Polaris
OAuth, Glue profiles) keep their fields so configs round-trip, but
nothing in this engine dials out to them.
"""

from __future__ import annotations

import os
from collections.abc import Callable, Mapping
from dataclasses import dataclass, field, fields
from typing import Any

_DELIM = "__"


def _parse_env_file(path: str) -> dict[str, str]:
    out: dict[str, str] = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#") or "=" not in line:
                continue
            k, _, v = line.partition("=")
            out[k.strip()] = v.strip().strip("'\"")
    return out


def _group(env: Mapping[str, str], prefix: str) -> dict[str, str]:
    """Collect ``PREFIX__FIELD`` keys (case-insensitive) into a dict of
    lower-cased field names."""
    want = f"{prefix}{_DELIM}".upper()
    return {
        k.upper().removeprefix(want).lower(): v
        for k, v in env.items()
        if k.upper().startswith(want)
    }


def _build(cls, data: Mapping[str, str]):
    """Instantiate a dataclass from string values, casting to the
    annotated primitive (int/bool) — unknown keys are ignored, matching
    the reference's ``extra="ignore"``."""
    kwargs: dict[str, Any] = {}
    for f_ in fields(cls):
        if f_.name not in data:
            continue
        raw = data[f_.name]
        if f_.type in ("int", "int | None"):
            kwargs[f_.name] = int(raw)
        elif f_.type in ("bool", "bool | None"):
            kwargs[f_.name] = str(raw).lower() in ("1", "true", "yes", "on")
        else:
            kwargs[f_.name] = raw
    return cls(**kwargs)


@dataclass
class DatabaseSettings:
    """JDBC source (reference ``DatabaseSettings``): mysql / sqlserver."""

    type: str | None = None
    host: str | None = None
    port: int | None = None
    user: str | None = None
    password: str | None = None

    def require(self) -> "DatabaseSettings":
        missing = [k for k in ("type", "host", "port", "user") if getattr(self, k) is None]
        if missing:
            raise ValueError(f"database settings missing {missing} (DATABASE__* env)")
        return self


@dataclass
class StorageSettings:
    """Warehouse location (reference ``StorageSettings``)."""

    profile: str | None = None
    catalog: str = "lake"
    catalog_type: str = "local"  # reference: glue | polaris
    bucket: str = ""
    data_path: str = "/tmp/datalake_iceberg_spark/warehouse"

    @property
    def warehouse(self) -> str:
        # reference: "s3a://" + bucket + data_path; local layout has no bucket
        if self.bucket:
            return f"s3a://{self.bucket}{self.data_path}"
        return self.data_path


@dataclass
class KafkaSettings:
    """Stream source knobs (reference ``KafkaSettings``); the file-backed
    stream seam consumes max_offsets_per_trigger/starting_offsets, a real
    Kafka source consumes all of them verbatim."""

    bootstrap_servers: str | None = None
    schema_registry: str | None = None
    metric_namespace: str = "datalake"
    max_offsets_per_trigger: int = 10000
    starting_offsets: str = "earliest"


@dataclass
class VaultSettings:
    """AppRole coordinates for the optional secret source."""

    url: str | None = None
    username: str | None = None
    password: str | None = None
    secret_path: str | None = None

    def configured(self) -> bool:
        return all((self.url, self.username, self.password, self.secret_path))


@dataclass
class RunnerSettings:
    """Streaming-runner knobs (checkpoint root + cadence), env-settable
    so deployments configure the round loop without code."""

    checkpoint_root: str = "/tmp/datalake_iceberg_spark/checkpoints"
    dag_id: str = "default"
    round_interval_sec: int = 60
    max_concurrency: int = 4


@dataclass
class Settings:
    database: DatabaseSettings = field(default_factory=DatabaseSettings)
    storage: StorageSettings = field(default_factory=StorageSettings)
    kafka: KafkaSettings = field(default_factory=KafkaSettings)
    vault: VaultSettings = field(default_factory=VaultSettings)
    runner: RunnerSettings = field(default_factory=RunnerSettings)
    cpus: int | None = None
    driver_memory: str = "32g"
    # Spark Connect URL (sc://host:port); None = classic in-process
    remote: str | None = None

    @property
    def CATALOG(self) -> str:
        return self.storage.catalog

    @property
    def WAREHOUSE(self) -> str:
        return self.storage.warehouse

    @classmethod
    def load(
        cls,
        env: Mapping[str, str] | None = None,
        env_file: str | None = None,
        secret_source: Callable[[], Mapping[str, Any]] | None = None,
        **overrides: Any,
    ) -> "Settings":
        """Build settings with the reference's precedence: ``overrides``
        > process ``env`` > ``env_file`` > ``secret_source`` (which fills
        only database credential fields left unset, exactly like the
        reference's VaultSettingsSource)."""
        merged: dict[str, str] = {}
        if env_file and os.path.exists(env_file):
            merged.update(_parse_env_file(env_file))
        merged.update(env if env is not None else os.environ)

        s = cls(
            database=_build(DatabaseSettings, _group(merged, "database")),
            storage=_build(StorageSettings, _group(merged, "storage")),
            kafka=_build(KafkaSettings, _group(merged, "kafka")),
            vault=_build(VaultSettings, _group(merged, "vault")),
            runner=_build(RunnerSettings, _group(merged, "runner")),
        )
        if "SPARK_GRAFT_CPUS" in merged:
            s.cpus = int(merged["SPARK_GRAFT_CPUS"])
        if "SPARK_GRAFT_DRIVER_MEM" in merged:
            s.driver_memory = merged["SPARK_GRAFT_DRIVER_MEM"]
        if "SPARK_REMOTE" in merged:
            s.remote = merged["SPARK_REMOTE"]

        if secret_source is None and s.vault.configured():
            secret_source = vault_secret_source(s.vault)
        if secret_source is not None:
            secret = dict(secret_source())
            for k in ("host", "port", "user", "password"):
                if getattr(s.database, k) is None and k in secret:
                    v = secret[k]
                    setattr(s.database, k, int(v) if k == "port" else v)

        for k, v in overrides.items():
            if not hasattr(s, k):
                raise ValueError(f"unknown settings override {k!r}")
            setattr(s, k, v)
        return s


def vault_secret_source(vault: VaultSettings) -> Callable[[], Mapping[str, Any]]:
    """Adapter matching the reference's Vault read
    (``src/utils/settings.py:53-83``): AppRole login, KV v2 read,
    ``data.data`` unwrap → database credential dict. Import of the
    client library is deferred to call time so environments without it
    can still construct Settings (they just can't pull Vault secrets)."""

    def _read() -> Mapping[str, Any]:
        if not vault.configured():
            raise ValueError("vault settings incomplete: url, username, password, secret_path")
        try:
            import hvac  # noqa: PLC0415 — optional dependency seam
        except ImportError as exc:
            raise RuntimeError(
                "hvac is not installed; inject secret_source= explicitly"
            ) from exc
        client = hvac.Client(url=vault.url)
        client.auth.approle.login(role_id=vault.username, secret_id=vault.password)
        response = client.read(path=vault.secret_path)
        if not isinstance(response, dict) or "data" not in response or "data" not in response["data"]:
            raise ValueError(f"no data at Vault path: {vault.secret_path!r}")
        secret = response["data"]["data"]
        return {
            "host": secret.get("host"),
            "port": int(secret.get("port", 0)),
            "user": secret.get("user"),
            "password": secret.get("password"),
        }

    return _read
