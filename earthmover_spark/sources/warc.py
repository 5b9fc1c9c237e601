"""WARC (Web ARChive) source — the container format web corpora ship
in (Common Crawl, Internet Archive). Dependency-free: WARC is plain
record framing (``WARC/1.x`` header block, ``Content-Length`` payload,
two CRLF separators), and the standard ``.warc.gz`` layout is one gzip
MEMBER per record, which ``zlib`` decompresses with an unused-data
loop — no warcio needed.

Scale shape (100 TB): files land via Spark's ``binaryFile`` source,
one row per file, then a ``mapInPandas`` pass splits records — so
parsing parallelizes file-per-task with the scan and no payload ever
touches the driver. The deliberate limit: each FILE must fit in one
task's memory (binaryFile materializes whole files; Common Crawl
shards are ~1 GB, sized for exactly this pattern). Shard bigger
archives upstream.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from earthmover_spark.util import EarthmoverSparkError

#: output schema: one row per WARC record
WARC_SCHEMA = T.StructType(
    [
        T.StructField("file", T.StringType()),
        T.StructField("record_id", T.StringType()),
        T.StructField("warc_type", T.StringType()),
        T.StructField("target_uri", T.StringType()),
        T.StructField("warc_date", T.StringType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("http_status", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
    ]
)

_CRLF2 = b"\r\n\r\n"


def _gunzip_members(blob: bytes) -> bytes:
    """Decompress concatenated gzip members (the .warc.gz layout:
    one member per record) into one byte stream.

    Streams through GzipFile, which walks members in place — a
    per-member ``decompressobj`` loop re-copies the remaining tail via
    ``unused_data`` on every member, O(members x file_size): terabytes
    of memcpy on a 1 GB shard with tens of thousands of records. A
    truncated or garbage trailing member keeps everything decoded up
    to it (complete records still parse)."""
    import gzip
    import io

    out = []
    decoded_any = False
    try:
        with gzip.GzipFile(fileobj=io.BytesIO(blob)) as g:
            while True:
                chunk = g.read(1 << 20)
                # a completed read means at least one member's framing
                # decoded — even when it produced ZERO bytes (a valid
                # empty .warc.gz shard is not a mislabeled archive)
                decoded_any = True
                if not chunk:
                    break
                out.append(chunk)
    except (EOFError, OSError, zlib.error):
        pass  # truncated/garbage tail: keep the complete members
    if blob and not decoded_any:
        # nothing decoded from non-empty input: the file isn't gzip at
        # all (mislabeled .gz) — raise rather than silently vanishing
        # an entire shard from the corpus
        raise EarthmoverSparkError(
            "read_warc: no gzip member could be decoded — corrupt or "
            "mislabeled .gz archive"
        )
    return b"".join(out)


def _parse_headers(block: bytes) -> dict[str, str]:
    headers: dict[str, str] = {}
    # unfold continuation lines first (RFC 822-style folding, allowed
    # by the WARC header grammar): a line starting with SP/HT extends
    # the previous header's value — splitting it off as its own line
    # would truncate a folded WARC-Target-URI / Content-Length
    lines: list[bytes] = []
    for line in block.split(b"\r\n")[1:]:  # line 0 is "WARC/1.x"
        if line[:1] in (b" ", b"\t") and lines:
            lines[-1] += b" " + line.strip()
        else:
            lines.append(line)
    for line in lines:
        if b":" in line:
            k, v = line.split(b":", 1)
            headers[k.strip().decode("ascii", "replace").lower()] = (
                v.strip().decode("utf-8", "replace")
            )
    return headers


def iter_warc_records(
    blob: bytes, strip_http: bool = True
) -> Iterator[dict]:
    """Yield one dict per WARC record in ``blob`` (already
    decompressed). ``strip_http``: for ``response`` records whose
    payload is an HTTP message, drop the HTTP header block and expose
    the status code separately — the usual first step, since corpus
    text lives in the HTTP body."""
    pos = 0
    n = len(blob)
    while pos < n:
        # skip inter-record padding
        while pos < n and blob[pos : pos + 1] in (b"\r", b"\n"):
            pos += 1
        if pos >= n:
            break
        if not blob.startswith(b"WARC/", pos):
            raise EarthmoverSparkError(
                f"read_warc: expected WARC/ header at byte {pos}"
            )
        hdr_end = blob.find(_CRLF2, pos)
        if hdr_end < 0:
            raise EarthmoverSparkError(
                "read_warc: unterminated WARC header block"
            )
        headers = _parse_headers(blob[pos:hdr_end])
        try:
            length = int(headers.get("content-length", ""))
        except ValueError as exc:
            raise EarthmoverSparkError(
                "read_warc: missing/invalid Content-Length"
            ) from exc
        if length < 0:
            # a negative length would move pos BACKWARDS and loop
            # forever re-yielding the same record
            raise EarthmoverSparkError(
                f"read_warc: negative Content-Length {length}"
            )
        body_start = hdr_end + len(_CRLF2)
        if body_start + length > n:
            # truncated tail (e.g. a cut-off member): the header
            # survived but the body didn't — drop the partial record
            # rather than yielding a silently-short payload
            break
        payload = blob[body_start : body_start + length]
        pos = body_start + length
        status: int | None = None
        if strip_http and payload.startswith(b"HTTP/"):
            line_end = payload.find(b"\r\n")
            if line_end > 0:
                parts = payload[:line_end].split()
                if len(parts) >= 2 and parts[1].isdigit():
                    status = int(parts[1])
            http_end = payload.find(_CRLF2)
            if http_end >= 0:
                payload = payload[http_end + len(_CRLF2):]
        yield {
            "record_id": headers.get("warc-record-id"),
            "warc_type": headers.get("warc-type"),
            "target_uri": headers.get("warc-target-uri"),
            "warc_date": headers.get("warc-date"),
            "content_type": headers.get("content-type"),
            "http_status": status,
            "payload": payload,
        }


def read_warc(
    spark: SparkSession,
    path: str,
    record_types: "tuple[str, ...] | None" = ("response",),
    strip_http: bool = True,
) -> DataFrame:
    """Read WARC / WARC-gzip archives into one row per record
    (:data:`WARC_SCHEMA`). ``record_types`` keeps only the named
    ``WARC-Type``s (default: ``response`` — the fetched pages;
    pass ``None`` for everything including warcinfo/request/metadata).
    Payload stays an opaque ``binary`` column — decode downstream
    (``F.decode(payload, 'utf-8')`` for text, the multimodal codecs
    for media), exactly the opaque-bytes-plus-typed-metadata pattern
    of ``llm.multimodal``."""
    if isinstance(record_types, str):  # scalar spelling: one type
        record_types = (record_types,)
    wanted = tuple(record_types) if record_types else None

    def _split(batches):
        import pandas as pd

        cols = [f.name for f in WARC_SCHEMA.fields]
        for pdf in batches:
            # yield per FILE, not per Arrow batch: a batch can pack
            # several archives, and holding all their decompressed
            # payloads at once breaks the one-file-in-memory contract
            for _, r in pdf.iterrows():
                blob = bytes(r["content"])
                if r["path"].endswith(".gz") or blob[:2] == b"\x1f\x8b":
                    blob = _gunzip_members(blob)
                rows = []
                for rec in iter_warc_records(blob, strip_http=strip_http):
                    if wanted and rec["warc_type"] not in wanted:
                        continue
                    rec["file"] = r["path"]
                    rows.append(rec)
                yield pd.DataFrame(rows, columns=cols)

    files = spark.read.format("binaryFile").load(path).select(
        "path", "content"
    )
    return files.mapInPandas(_split, WARC_SCHEMA)
