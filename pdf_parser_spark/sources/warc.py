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

WET dumps (Common Crawl's pre-extracted text: ``conversion`` records,
``*.warc.wet.gz`` files) are read with
``.option("record_types", "conversion")`` — the payload lands in the
``text`` column with ``html`` null; ``"response,conversion"`` mixes
both in one pass.

Corrupt records do NOT kill the job (the same never-fail contract as
the document extraction path): on structural corruption the reader
emits one bad-record row — url ``warcerr://<file>@<recno>``, the parse
error in ``text`` — then RESYNCS by scanning to the next ``WARC/``
version line and keeps going, so one mangled record costs itself, not
its file's partition.

REQUIREMENT: ``path`` must be a directory on a filesystem visible to
every executor under the same path (local dir in local mode, NFS/
FUSE-mounted object store on a cluster) — the driver lists it with
os.listdir and executors open plain paths. Remote schemes (s3://,
hdfs://...) are rejected up front; mount them or copy down first.
"""

from __future__ import annotations

import gzip
import io
import os
from dataclasses import dataclass
from datetime import datetime, timezone

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


def _scan_to_version(stream: io.BufferedIOBase) -> bytes:
    """Read lines until the next ``WARC/`` version line (returned) or
    EOF (empty bytes) — the resync point after a corrupt record."""
    while True:
        line = stream.readline()
        if not line or line.startswith(b"WARC/"):
            return line


def iter_warc_records(stream: io.BufferedIOBase, resync: bool = False):
    """Yield (headers: dict[str, str], payload: bytes) per WARC record.
    Tolerates leading blank lines between records; stops cleanly at EOF.

    On structural corruption (bad version line, missing Content-Length,
    truncated payload): with ``resync=False`` raise ValueError — the
    caller decides whether that kills the file or the job; with
    ``resync=True`` yield one error marker ``({"_error": msg}, b"")``,
    scan forward to the next ``WARC/`` version line, and keep parsing —
    one mangled record costs itself, not the rest of the file."""
    pending: bytes | None = None

    def corrupt(msg: str):
        nonlocal pending
        if not resync:
            raise ValueError(msg)
        pending = _scan_to_version(stream)
        return {"_error": msg}, b""

    while True:
        line = pending if pending is not None else stream.readline()
        pending = None
        if not line:
            return
        if line in (b"\r\n", b"\n"):
            continue
        if not line.startswith(b"WARC/"):
            yield corrupt(f"bad WARC version line: {line[:40]!r}")
            continue
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
        except (KeyError, ValueError):
            yield corrupt("WARC record missing Content-Length")
            continue
        payload = stream.read(n)
        if len(payload) != n:
            yield corrupt("truncated WARC payload")
            continue
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
        if self.root.startswith("file://"):
            self.root = self.root[len("file://"):]
        if "://" in self.root:
            raise ValueError(
                "warc source reads plain executor-visible paths only; "
                f"remote scheme in {self.root!r} — mount it (NFS/FUSE) "
                "or copy down first"
            )
        self.files_per_partition = int(options.get("files_per_partition", "4"))
        # 'response' (WARC: raw http bodies -> html column) and/or
        # 'conversion' (WET: pre-extracted plain text -> text column)
        self.record_types = frozenset(
            t.strip()
            for t in options.get("record_types", "response").split(",")
            if t.strip()
        )
        bad = self.record_types - {"response", "conversion"}
        if bad:
            raise ValueError(f"unsupported record_types: {sorted(bad)}")

    def partitions(self):
        names = sorted(
            f
            for f in os.listdir(self.root)
            if os.path.isfile(os.path.join(self.root, f))
            and f.endswith((".warc", ".warc.gz", ".wet", ".wet.gz"))
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
                for recno, (headers, payload) in enumerate(
                    iter_warc_records(f, resync=True)
                ):
                    if "_error" in headers:
                        # never-fail contract (same as the document
                        # extraction path): corruption becomes a row,
                        # the reader resyncs and the file keeps going
                        yield (
                            f"warcerr://{name}@{recno}",
                            None,
                            None,
                            headers["_error"],
                            None,
                        )
                        continue
                    wtype = headers.get("warc-type")
                    if wtype not in self.record_types:
                        continue
                    uri = headers.get("warc-target-uri")
                    ts = _parse_warc_date(headers.get("warc-date"))
                    if wtype == "conversion":
                        # WET record: payload is already-extracted text
                        yield (
                            uri,
                            ts,
                            None,
                            payload.decode("utf-8", errors="replace"),
                            None,
                        )
                    else:
                        yield (uri, ts, _http_body(payload), "", None)


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
