"""HMAC-SHA256 request signing — the Azure Log Analytics Data Collector
shared-key scheme used by the reference's log_analytics output
(/root/reference/internal/output/log_analytics/log_analytics.go:155-208).

Driver/partition-side helper (signing happens per HTTP POST, not per
row), so plain Python is the right altitude here.
"""

from __future__ import annotations

import base64
import hashlib
import hmac


def hmac_sha256_b64(key_b64: str, message: str) -> str:
    key = base64.b64decode(key_b64)
    digest = hmac.new(key, message.encode("utf-8"), hashlib.sha256).digest()
    return base64.b64encode(digest).decode("ascii")


def log_analytics_signature(
    workspace_id: str,
    primary_key_b64: str,
    content_length: int,
    rfc1123_date: str,
    method: str = "POST",
    content_type: str = "application/json",
    resource: str = "/api/logs",
) -> str:
    """SharedKey signature string for the Data Collector API."""
    string_to_sign = (
        f"{method}\n{content_length}\n{content_type}\n"
        f"x-ms-date:{rfc1123_date}\n{resource}"
    )
    sig = hmac_sha256_b64(primary_key_b64, string_to_sign)
    return f"SharedKey {workspace_id}:{sig}"
