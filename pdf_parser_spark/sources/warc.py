"""`warc` — a Spark Python DataSource reading WARC files (the actual
Common Crawl delivery format) straight into the engine's input-table
shape:

    spark.dataSource.register(WarcDataSource)
    df = (spark.read.format("warc")
          .option("path", "/data/cc-dump")       # dir of .warc / .warc.gz
          .option("files_per_partition", "4")
          .load())

One row per ``response`` record: url = WARC-Target-URI, warc_ts =
WARC-Date, html = the HTTP body (HTTP headers stripped), text = '',
lang = NULL. warcinfo/request/metadata records are skipped. Both plain
and gzipped WARCs work — Python's gzip reads Common Crawl's
concatenated per-record members transparently.

Parsing is stdlib-only (the WARC/1.0 framing is line headers +
Content-Length payload + CRLF CRLF), and happens entirely on executors:
the driver only lists file names; each InputPartition carries a file
slice, so a crawl dump of thousands of WARCs shards across the cluster.
"""

from __future__ import annotations

import gzip
import io
import os
from dataclasses import dataclass
from datetime import datetime, timezone

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


def iter_warc_records(stream: io.BufferedIOBase):
    """Yield (headers: dict[str, str], payload: bytes) per WARC record.
    Tolerates leading blank lines between records; stops cleanly at EOF.
    Raises ValueError on structural corruption (bad version line or
    missing Content-Length) — callers decide whether that kills the file
    or the job."""
    while True:
        line = stream.readline()
        if not line:
            return
        if line in (b"\r\n", b"\n"):
            continue
        if not line.startswith(b"WARC/"):
            raise ValueError(f"bad WARC version line: {line[:40]!r}")
        headers: dict[str, str] = {}
        while True:
            h = stream.readline()
            if not h or h in (b"\r\n", b"\n"):
                break
            if b":" in h:
                k, v = h.split(b":", 1)
                headers[k.strip().decode("latin1").lower()] = (
                    v.strip().decode("latin1")
                )
        try:
            n = int(headers["content-length"])
        except (KeyError, ValueError) as e:
            raise ValueError("WARC record missing Content-Length") from e
        payload = stream.read(n)
        if len(payload) != n:
            raise ValueError("truncated WARC payload")
        yield headers, payload


def _http_body(payload: bytes) -> bytes:
    """Drop the HTTP response header block if present."""
    if payload[:5] in (b"HTTP/",):
        sep = payload.find(b"\r\n\r\n")
        if sep >= 0:
            return payload[sep + 4 :]
    return payload


def _parse_warc_date(s: str | None):
    if not s:
        return None
    try:
        # WARC-Date is ISO-8601 UTC, e.g. 2024-03-01T12:30:00Z
        return datetime.fromisoformat(s.replace("Z", "+00:00")).astimezone(
            timezone.utc
        ).replace(tzinfo=None)
    except ValueError:
        return None


@dataclass
class _WarcPartition(InputPartition):
    root: str
    files: list[str]


class WarcReader(DataSourceReader):
    def __init__(self, options: dict):
        self.root = options.get("path")
        if not self.root:
            raise ValueError("warc requires .option('path', <dir>)")
        self.files_per_partition = int(options.get("files_per_partition", "4"))

    def partitions(self):
        names = sorted(
            f
            for f in os.listdir(self.root)
            if os.path.isfile(os.path.join(self.root, f))
            and (f.endswith(".warc") or f.endswith(".warc.gz"))
        )
        k = self.files_per_partition
        chunks = [names[i : i + k] for i in range(0, len(names), k)]
        if not chunks:
            chunks = [[]]
        return [_WarcPartition(self.root, c) for c in chunks]

    def read(self, partition: _WarcPartition):
        for name in partition.files:
            path = os.path.join(partition.root, name)
            opener = gzip.open if name.endswith(".gz") else open
            with opener(path, "rb") as f:
                for headers, payload in iter_warc_records(f):
                    if headers.get("warc-type") != "response":
                        continue
                    yield (
                        headers.get("warc-target-uri"),
                        _parse_warc_date(headers.get("warc-date")),
                        _http_body(payload),
                        "",
                        None,
                    )


class WarcDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "warc"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> WarcReader:
        return WarcReader(self.options)


def write_warc(records, path: str, compress: bool = False) -> None:
    """Minimal WARC writer for tests/synthesis: records are
    (warc_type, uri, date_iso, payload bytes); response payloads are
    wrapped in an HTTP/1.1 200 header block like a real crawl."""
    opener = gzip.open if compress else open
    with opener(path, "wb") as f:
        for warc_type, uri, date_iso, payload in records:
            if warc_type == "response":
                payload = (
                    b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
                    + payload
                )
            head = [b"WARC/1.0"]
            head.append(f"WARC-Type: {warc_type}".encode())
            if uri:
                head.append(f"WARC-Target-URI: {uri}".encode())
            if date_iso:
                head.append(f"WARC-Date: {date_iso}".encode())
            head.append(f"Content-Length: {len(payload)}".encode())
            f.write(b"\r\n".join(head) + b"\r\n\r\n")
            f.write(payload)
            f.write(b"\r\n\r\n")
