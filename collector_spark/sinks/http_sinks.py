"""Network sinks: HTTP poster, Azure Log Analytics, Pub/Sub stub.

These mirror the reference's http / log_analytics / pubsub outputs
(internal/output/http/http.go:61-123, log_analytics/log_analytics.go:
69-153, pubsub/pubsub.go:60-122). The per-partition POST loop runs on
executors via ``foreachPartition``; chunking uses the bfp-equivalent
``chunk_lines``. The actual network call is injected (``poster``) so the
sandbox tests the batching/signing plumbing with a fake, and a real
deployment passes a requests.Session-based poster.
"""

from __future__ import annotations

import json
from datetime import datetime, timezone

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from collector_spark.functions.chunking import chunk_lines
from collector_spark.functions.signing import log_analytics_signature


def _default_poster(url: str, body: bytes, headers: dict) -> int:
    """Executor-side HTTP POST; requires the ``requests`` package and
    network egress — both absent in this sandbox, hence injectable."""
    try:
        import requests  # noqa: WPS433
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError(
            "HTTP sinks need the 'requests' package and network egress; "
            "inject a poster callable for testing"
        ) from e
    resp = requests.post(url, data=body, headers=headers, timeout=30)
    resp.raise_for_status()
    return resp.status_code


class HttpSink:
    """http output: re-batch lines to ≤max_size KB chunks, POST each as a
    JSON array (as_json), raw-string array, or plain body.

    Reference config {url, headers, max_size(KB, default 128),
    as_multi_part, as_json} — http.go:15-32.
    """

    def __init__(
        self,
        url: str,
        headers: dict | None = None,
        max_size_kb: int = 128,
        as_json: bool = False,
        value_col: str = "value",
        poster=None,
        **_,
    ):
        self.url = url
        self.headers = dict(headers or {})
        self.max_bytes = max_size_kb * 1024
        self.as_json = as_json
        self.value_col = value_col
        self.poster = poster or _default_poster

    def write(self, df: DataFrame, batch_id: int | None = None) -> int:
        url, headers = self.url, self.headers
        max_bytes, as_json, poster = self.max_bytes, self.as_json, self.poster

        count = df.sparkSession.sparkContext.accumulator(0)

        def send(partition) -> None:
            lines = []
            for row in partition:
                v = row[0]
                if v is None:
                    continue
                v = str(v).strip()
                if v:
                    lines.append(v)
            for chunk in chunk_lines(lines, max_bytes):
                if as_json:
                    parsed = []
                    for ln in chunk:
                        try:
                            parsed.append(json.loads(ln))
                        except ValueError:
                            continue  # non-JSON skipped (http.go:92-101)
                    body = json.dumps(parsed).encode("utf-8")
                    hdrs = {**headers, "Content-Type": "application/json"}
                else:
                    body = "\n".join(chunk).encode("utf-8")
                    hdrs = dict(headers)
                poster(url, body, hdrs)
                count.add(len(chunk))

        df.select(F.col(self.value_col).cast("string")).foreachPartition(send)
        return count.value


class LogAnalyticsSink:
    """Azure Log Analytics Data Collector sink: buffer ≤25 MB of parsed
    JSON entries, sign with HMAC-SHA256 SharedKey, POST
    (log_analytics.go:69-208). Non-JSON lines wrap as {"message": line}.
    """

    MAX_BUFFER = 25 * 1024 * 1024

    def __init__(
        self,
        workspace_id: str,
        primary_key: str,
        log_type: str,
        date_field: str | None = None,
        value_col: str = "value",
        poster=None,
        **_,
    ):
        self.workspace_id = workspace_id
        self.primary_key = primary_key
        self.log_type = log_type
        self.date_field = date_field
        self.value_col = value_col
        self.poster = poster or _default_poster

    def _headers(self, content_length: int) -> dict:
        date = datetime.now(timezone.utc).strftime("%a, %d %b %Y %H:%M:%S GMT")
        return {
            "Authorization": log_analytics_signature(
                self.workspace_id, self.primary_key, content_length, date
            ),
            "Log-Type": self.log_type,
            "x-ms-date": date,
            "Content-Type": "application/json",
            **(
                {"time-generated-field": self.date_field}
                if self.date_field
                else {}
            ),
        }

    def write(self, df: DataFrame, batch_id: int | None = None) -> int:
        url = (
            f"https://{self.workspace_id}.ods.opinsights.azure.com"
            "/api/logs?api-version=2016-04-01"
        )
        poster = self.poster
        headers_for = self._headers
        max_buffer = self.MAX_BUFFER
        count = df.sparkSession.sparkContext.accumulator(0)

        def send(partition) -> None:
            entries: list = []
            size = 0

            def flush() -> None:
                nonlocal entries, size
                if not entries:
                    return
                body = json.dumps(entries).encode("utf-8")
                poster(url, body, headers_for(len(body)))
                entries, size = [], 0

            for row in partition:
                v = row[0]
                if v is None or not str(v).strip():
                    continue
                line = str(v).strip()
                try:
                    obj = json.loads(line)
                except ValueError:
                    obj = {"message": line}  # log_analytics.go:95-103
                entries.append(obj)
                size += len(line)
                if size >= max_buffer:
                    flush()
                count.add(1)
            flush()

        df.select(F.col(self.value_col).cast("string")).foreachPartition(send)
        return count.value


class PubSubSink:
    """GCP Pub/Sub publisher (pubsub.go:60-122): per-row publish via
    foreachPartition. Requires google-cloud-pubsub + credentials —
    unavailable offline; the class validates config and fails loudly at
    write time, keeping plan construction testable."""

    def __init__(self, project_id: str, topic_id: str, credentials: str | None = None, **_):
        if not project_id or not topic_id:
            raise ValueError("project_id and topic_id are required")
        self.project_id = project_id
        self.topic_id = topic_id
        self.credentials = credentials

    def write(self, df: DataFrame, batch_id: int | None = None) -> int:
        raise NotImplementedError(
            "PubSubSink needs google-cloud-pubsub and network egress; "
            "not available in this environment"
        )
