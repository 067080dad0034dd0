"""SecretsProvider — the Vault-repository analog
(``src/repositories/vault_repository.py:104-312``): TTL cache,
refresh, lease renewal, dynamic DB credentials, health probe."""

from __future__ import annotations

import json

import pytest

from cass_cdc_pg_spark.secrets import SecretNotFound, SecretsProvider


def _store(tmp_path, data):
    p = tmp_path / "secrets.json"
    p.write_text(json.dumps(data))
    return str(p)


def test_cache_ttl_and_refresh(tmp_path):
    path = _store(tmp_path, {"cdc/cassandra": {"username": "a", "password": "x"}})
    t = [0.0]
    sp = SecretsProvider(path, cache_ttl_sec=100, clock=lambda: t[0])
    assert sp.get("cdc/cassandra")["username"] == "a"

    # rotate the secret on disk: cache serves the old value until TTL
    with open(path, "w") as fh:
        json.dump({"cdc/cassandra": {"username": "b", "password": "y"}}, fh)
    assert sp.get("cdc/cassandra")["username"] == "a"
    t[0] = 101  # TTL elapsed -> re-read
    assert sp.get("cdc/cassandra")["username"] == "b"

    # force refresh ignores a fresh cache entry
    with open(path, "w") as fh:
        json.dump({"cdc/cassandra": {"username": "c", "password": "z"}}, fh)
    assert sp.refresh("cdc/cassandra")["username"] == "c"
    # use_cache=False never populates the cache
    sp2 = SecretsProvider(path, clock=lambda: t[0])
    sp2.get("cdc/cassandra", use_cache=False)
    with pytest.raises(SecretNotFound):
        sp2.renew_lease("cdc/cassandra")


def test_lease_renewal_extends_expiry(tmp_path):
    path = _store(tmp_path, {"p": {"k": "v"}})
    t = [0.0]
    sp = SecretsProvider(path, cache_ttl_sec=50, clock=lambda: t[0])
    sp.get("p")
    t[0] = 40
    assert sp.renew_lease("p", increment_sec=100) == 140
    with open(path, "w") as fh:
        json.dump({"p": {"k": "rotated"}}, fh)
    t[0] = 120  # past original TTL, within renewed lease
    assert sp.get("p")["k"] == "v"


def test_env_override_and_db_credentials(tmp_path, monkeypatch):
    path = _store(tmp_path, {"database/creds/pg-writer": {"username": "u"}})
    sp = SecretsProvider(path)
    # file entry is missing the password field -> contract error
    with pytest.raises(SecretNotFound):
        sp.get_database_credentials("pg-writer", use_cache=False)
    # env wins over the file store (k8s secret-env pattern)
    monkeypatch.setenv(
        "CDC_SECRET_DATABASE_CREDS_PG-WRITER".replace("-", "-"),
        json.dumps({"username": "u2", "password": "p2"}),
    )
    got = sp.get_database_credentials("pg-writer", use_cache=False)
    assert got == {"username": "u2", "password": "p2"}
    with pytest.raises(SecretNotFound):
        sp.get("absent/path")
    assert "p2" not in repr(sp)  # no secret leakage


def test_health_probe_integration(tmp_path):
    from cass_cdc_pg_spark.monitoring import HEALTHY, UNHEALTHY, HealthCheckService

    good = SecretsProvider(_store(tmp_path, {}))
    hc = HealthCheckService(secrets=good)
    out = hc.check_all()
    assert out["components"]["secrets"]["status"] == HEALTHY

    bad = SecretsProvider(str(tmp_path / "corrupt.json"))
    (tmp_path / "corrupt.json").write_text("{not json")
    out2 = HealthCheckService(secrets=bad).check_all()
    assert out2["components"]["secrets"]["status"] == UNHEALTHY
    assert out2["status"] == UNHEALTHY
    # unconfigured -> component absent entirely (local-mode default)
    assert "secrets" not in HealthCheckService().check_all()["components"]
