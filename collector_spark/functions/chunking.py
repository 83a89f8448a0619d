"""Size-bounded line re-batching — the reference's ``bfp`` buffered file
processor (/root/reference/pkg/bfp/bfp.go:48-145): split a stream of
lines into chunks of at most ``max_bytes`` (UTF-8, newline-joined), never
splitting a line; a single oversized line becomes its own chunk.

Used by the HTTP sink (http output re-batches to <=128 KB POSTs,
internal/output/http/http.go:32,61-123) and the Log Analytics sink
(25 MB buffer, log_analytics.go:112).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator


def chunk_lines(lines: Iterable[str], max_bytes: int) -> Iterator[list[str]]:
    buf: list[str] = []
    size = 0
    for line in lines:
        n = len(line.encode("utf-8")) + 1  # +1 newline
        if buf and size + n > max_bytes:
            yield buf
            buf, size = [], 0
        buf.append(line)
        size += n
        if size > max_bytes:  # single oversized line flushes alone
            yield buf
            buf, size = [], 0
    if buf:
        yield buf
