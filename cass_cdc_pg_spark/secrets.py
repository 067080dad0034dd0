"""Credentials provider — the Vault-repository analog.

The reference resolves connection credentials through Vault's KV v2
store with a 23-hour in-process cache, explicit refresh, lease
renewal, and a dynamic database-credentials path
(``src/repositories/vault_repository.py:104-312``).  There is no
secrets server in a Spark deployment's inner loop, so the same
surface is re-expressed over the two stores a cluster job actually
has — environment variables and a mounted secrets file (the pattern
every k8s/YARN secret mount uses):

- ``get(path)``            → ``get_credentials``: env override first
  (``<PREFIX><PATH>`` with ``/`` → ``_``, upper-cased), then the JSON
  file keyed by path; TTL'd cache in front (default 23 h).
- ``refresh(path)``        → ``refresh_credentials``: drop cache,
  re-read.
- ``renew_lease(path)``    → ``renew_lease``: extend the cache expiry
  without re-reading (the lease-renewal analog).
- ``get_database_credentials(role)`` → the ``database/creds/<role>``
  path convention, returning ``{username, password}``.
- ``health_check()``       → the Vault probe in ``check_all``.

Secrets never appear in logs or reprs, and never travel to executors
— resolution happens on the driver before a reader/writer is built.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Callable


class SecretNotFound(KeyError):
    pass


class SecretsProvider:
    def __init__(
        self,
        store_path: str | None = None,
        env_prefix: str = "CDC_SECRET_",
        cache_ttl_sec: float = 23 * 3600,
        clock: Callable[[], float] = time.time,
    ) -> None:
        self.store_path = store_path
        self.env_prefix = env_prefix
        self.cache_ttl_sec = cache_ttl_sec
        self.clock = clock
        self._cache: dict[str, dict] = {}
        self._expiry: dict[str, float] = {}

    def __repr__(self) -> str:  # never leak values
        return f"SecretsProvider(store={self.store_path!r})"

    # -- store reads --------------------------------------------------------

    def _env_key(self, path: str) -> str:
        return self.env_prefix + path.replace("/", "_").upper()

    def _read(self, path: str) -> dict[str, Any]:
        env = os.environ.get(self._env_key(path))
        if env is not None:
            try:
                parsed = json.loads(env)
            except ValueError:
                parsed = env
            return parsed if isinstance(parsed, dict) else {"value": parsed}
        if self.store_path is not None:
            try:
                with open(self.store_path) as fh:
                    store = json.load(fh)
            except FileNotFoundError:
                store = {}
            if path in store:
                return dict(store[path])
        raise SecretNotFound(path)

    # -- the reference surface ----------------------------------------------

    def get(self, path: str, use_cache: bool = True) -> dict[str, Any]:
        if use_cache:
            hit = self._cache.get(path)
            if hit is not None and self.clock() < self._expiry[path]:
                return hit
            self._cache.pop(path, None)
            self._expiry.pop(path, None)
        creds = self._read(path)
        if use_cache:
            self._cache[path] = creds
            self._expiry[path] = self.clock() + self.cache_ttl_sec
        return creds

    def refresh(self, path: str) -> dict[str, Any]:
        self._cache.pop(path, None)
        self._expiry.pop(path, None)
        return self.get(path)

    def renew_lease(self, path: str, increment_sec: float = 86400) -> float:
        """Extend a cached secret's validity without re-reading; returns
        the new expiry.  Raises if nothing is cached (no lease)."""
        if path not in self._cache:
            raise SecretNotFound(f"no cached lease for {path}")
        self._expiry[path] = self.clock() + increment_sec
        return self._expiry[path]

    def get_database_credentials(
        self, role_name: str, use_cache: bool = True
    ) -> dict[str, str]:
        creds = self.get(f"database/creds/{role_name}", use_cache=use_cache)
        missing = {"username", "password"} - set(creds)
        if missing:
            raise SecretNotFound(
                f"role {role_name!r} missing fields: {sorted(missing)}"
            )
        return {"username": creds["username"], "password": creds["password"]}

    def health_check(self) -> bool:
        """Store reachable: the env namespace always is; a configured
        file store must exist and parse."""
        if self.store_path is None:
            return True
        try:
            with open(self.store_path) as fh:
                json.load(fh)
            return True
        except (OSError, ValueError):
            return False
