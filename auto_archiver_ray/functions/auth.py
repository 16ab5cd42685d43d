"""Per-site auth registry + API-token rotation.

Parity targets:
- ``AuthRegistry`` mirrors the reference's site-auth resolution
  (ref:core/base_module.py:66-152): a site → credential dict
  (username/password/api_key/cookie/...) looked up by domain with
  www-variant fallback (``www.x.com`` and ``x.com`` resolve to the same
  entry) and wildcard support.
- ``TokenRing`` mirrors the TwitterApiExtractor's bearer-token rotation
  (ref:modules/twitter_api_extractor/twitter_api_extractor.py:19-60):
  round-robin across N tokens, advancing on every acquire (rate-limit
  spreading) — deterministic, so an actor restarted mid-stream rotates the
  same sequence.

In the pipeline these live inside stateful actor stages' ``__init__``
(one registry per actor, resolved per batch by the host column).
"""

from __future__ import annotations

from itertools import count


def _variants(site: str) -> list[str]:
    site = site.lower().lstrip(".")
    if site.startswith("www."):
        return [site, site[4:]]
    return [site, f"www.{site}"]


class AuthRegistry:
    def __init__(self, config: dict[str, dict] | None = None):
        self._entries: dict[str, dict] = {}
        for site, creds in (config or {}).items():
            self.add(site, creds)

    def add(self, site: str, creds: dict) -> None:
        for v in _variants(site):
            self._entries[v] = creds

    def get(self, domain: str, default: dict | None = None) -> dict:
        """Resolve credentials for a domain: exact/www-variant first, then
        parent-domain suffix walk (api.x.com → x.com), then default."""
        domain = (domain or "").lower()
        for cand in _variants(domain):
            if cand in self._entries:
                return self._entries[cand]
        parts = domain.split(".")
        for i in range(1, len(parts) - 1):
            parent = ".".join(parts[i:])
            if parent in self._entries:
                return self._entries[parent]
        return default or {}


class TokenRing:
    def __init__(self, tokens: list[str]):
        if not tokens:
            raise ValueError("TokenRing needs at least one token")
        self._tokens = list(tokens)
        self._counter = count()

    def acquire(self) -> str:
        return self._tokens[next(self._counter) % len(self._tokens)]
