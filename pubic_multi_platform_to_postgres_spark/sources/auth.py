"""OAuth2 refresh-token flow + tenant discovery (reference O5).

Mirrors ``tap_xero/__init__.py:20-136``: a token cache (here an injected
store, file-backed in production) holding ``access_token`` /
``refresh_token`` / ``expires_at``; before each use the expiry is checked
and the token refreshed via a POST to the token endpoint; tenants are
discovered with ``GET /connections`` and cached alongside the tokens.

Transport-agnostic so tests can run the whole flow against a mock.
"""

from __future__ import annotations

import time
from collections.abc import Callable
from dataclasses import dataclass, field
from typing import Any

from pubic_multi_platform_to_postgres_spark.sources.rest import Transport


@dataclass
class OAuth2RefreshAuth:
    """Refresh-token OAuth2 client credentialing a :class:`Fetcher`."""

    transport: Transport
    token_url: str
    client_id: str
    client_secret: str
    tokens: dict[str, Any] = field(default_factory=dict)
    connections_url: str | None = None
    expiry_slack: float = 60.0
    clock: Callable[[], float] = field(default=time.time)

    def _expired(self) -> bool:
        exp = self.tokens.get("expires_at")
        return exp is None or self.clock() >= float(exp) - self.expiry_slack

    def refresh(self) -> dict[str, Any]:
        """POST the refresh grant and rotate both tokens (the reference
        persists the rotated refresh token — refresh tokens are
        single-use in Xero's flow)."""
        resp = self.transport.post(
            self.token_url,
            {
                "grant_type": "refresh_token",
                "refresh_token": self.tokens.get("refresh_token", ""),
                "client_id": self.client_id,
                "client_secret": self.client_secret,
            },
        )
        self.tokens.update(
            {
                "access_token": resp["access_token"],
                "refresh_token": resp.get(
                    "refresh_token", self.tokens.get("refresh_token")
                ),
                "expires_at": self.clock() + float(resp.get("expires_in", 1800)),
            }
        )
        return self.tokens

    def access_token(self) -> str:
        if self._expired():
            self.refresh()
        return str(self.tokens["access_token"])

    def auth_headers(self) -> dict[str, str]:
        return {"Authorization": f"Bearer {self.access_token()}"}

    def discover_tenants(self) -> list[dict[str, str]]:
        """``GET /connections`` → ``[{id, name}, ...]`` cached in the token
        store (reference caches tenants next to the tokens)."""
        if not self.connections_url:
            raise ValueError("connections_url not configured")
        conns = self.transport.get(
            self.connections_url, None, self.auth_headers()
        )
        tenants = [
            {"id": c.get("tenantId", c.get("id", "")), "name": c.get("tenantName", c.get("name", ""))}
            for c in conns
        ]
        self.tokens["tenants"] = tenants
        return tenants
