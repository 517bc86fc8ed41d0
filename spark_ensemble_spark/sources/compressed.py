"""Compressed text-container ingestion (.jsonl.gz / WARC-shaped inputs).

Real pretraining corpora arrive as gzip containers — concatenated gzip
MEMBERS holding newline-delimited JSON records (the Common-Crawl / WET /
.jsonl.gz convention).  Two ingestion tiers, mirroring the multimodal
codec posture (``operators/multimodal.py``: real codecs behind the Arrow
seam, stdlib only):

* :func:`gzip_extract_jsonl` — a REAL multi-member gzip walker + JSONL
  parser through the Arrow ``mapInPandas`` seam: stdlib ``zlib`` (wbits=31)
  decompresses each member, ``unused_data`` hands the walker the next
  member, JSON lines become typed rows.  This is the operator a 100 TB
  crawl ingest runs right after the object-store scan: payloads stay
  distributed, nothing collects to the driver, and one container expands to
  its records inside the executor.
* Spark's NATIVE compressed-JSON scan (``spark.read.json`` over ``.json.gz``
  part files) covers the simple case where containers are well-formed
  whole-file datasets — exercised by the ``docs_jsonl_gz_native`` registry
  query (write-once fixture, distributed write, explicit read schema).

The synthetic container fixture (:func:`synthetic_jsonl_gz_corpus`) packs
the ``documents`` table into deterministic multi-member payloads
(``gzip.compress(mtime=0)``), so the extractor's full output — container
id, member index, line index, and the record text — replays exactly from
the plaintext table in DuckDB: decode(encode(x)) == x is the oracle.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# records per gzip member inside a container payload: small enough that a
# container always has several members (the walker is actually exercised),
# large enough to amortize the per-member gzip header
_LINES_PER_MEMBER = 5

CONTAINER_SCHEMA = "container_id long, payload binary, n_bytes long, n_records long"
RECORD_SCHEMA = (
    "container_id long, doc_id long, member_index int, line_index int, text string"
)


def synthetic_jsonl_gz_corpus(
    df: DataFrame,
    num_containers: int = 40,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Pack documents into deterministic ``.jsonl.gz``-shaped container
    payloads: docs hash into ``num_containers`` containers (``id %
    num_containers``), each container's docs sort by id and serialize as
    JSON lines, every :data:`_LINES_PER_MEMBER` lines gzip-compress into
    one member (``mtime=0`` — byte-deterministic), members concatenate into
    the container payload.  ``applyInPandas`` — each container builds
    inside its executor, driver sees nothing.

    At 100 TB this layout IS the input, not a fixture; the generator exists
    so the extractor has hash-checkable content on the test tables."""
    import pandas as pd  # noqa: F401 — imported for the seam's type context

    def pack(pdf):
        import gzip
        import json

        import pandas as pd

        pdf = pdf.sort_values(id_col)
        lines = [
            json.dumps(
                {"doc_id": int(i), "text": t},
                ensure_ascii=False,
            )
            for i, t in zip(pdf[id_col], pdf[text_col])
        ]
        members = []
        for off in range(0, len(lines), _LINES_PER_MEMBER):
            chunk = "\n".join(lines[off : off + _LINES_PER_MEMBER]) + "\n"
            members.append(gzip.compress(chunk.encode("utf-8"), mtime=0))
        payload = b"".join(members)
        return pd.DataFrame(
            {
                "container_id": [int(pdf["__cid"].iloc[0])],
                "payload": [payload],
                "n_bytes": [len(payload)],
                "n_records": [len(lines)],
            }
        )

    keyed = df.select(
        F.col(id_col), F.col(text_col), (F.col(id_col) % num_containers).alias("__cid")
    )
    return keyed.groupBy("__cid").applyInPandas(pack, schema=CONTAINER_SCHEMA)


def gzip_extract_jsonl(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Expand multi-member gzip JSONL containers into typed records through
    the Arrow seam: per payload, stdlib ``zlib`` (wbits=31) walks every
    member via ``unused_data``, each member's UTF-8 text splits on the JSON
    line boundary (record text can never contain a raw newline — JSON
    escapes control characters), and each line parses to ``(doc_id,
    text)``.  Emits ``(container_id, doc_id, member_index, line_index,
    text)`` — the provenance columns a crawl pipeline keeps for dedup
    priority and re-fetch.

    A payload with trailing non-gzip bytes stops at the garbage (the WARC
    convention: a reader consumes members while magic bytes match); a
    TRUNCATED member raises — corrupt input is a data error, not a skip."""

    def op(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import json
        import zlib

        import pandas as pd

        def members(b: bytes):
            rest = bytes(b)
            while rest.startswith(b"\x1f\x8b"):
                d = zlib.decompressobj(wbits=31)
                data = d.decompress(rest) + d.flush()
                yield data
                rest = d.unused_data

        for pdf in batches:
            cids, dids, mis, lis, texts = [], [], [], [], []
            for cid, payload in zip(pdf["container_id"], pdf[payload_col]):
                for mi, member in enumerate(members(payload)):
                    lines = member.decode("utf-8").split("\n")
                    if lines and lines[-1] == "":
                        lines.pop()
                    for li, line in enumerate(lines):
                        obj = json.loads(line)
                        cids.append(int(cid))
                        dids.append(obj["doc_id"])
                        mis.append(mi)
                        lis.append(li)
                        texts.append(obj["text"])
            yield pd.DataFrame(
                {
                    "container_id": cids,
                    "doc_id": dids,
                    "member_index": mis,
                    "line_index": lis,
                    "text": texts,
                }
            )

    return df.mapInPandas(op, schema=RECORD_SCHEMA)


WARC_RECORD_SCHEMA = (
    "container_id long, record_index int, warc_type string, "
    "target_uri string, content_length long, text string"
)


def synthetic_warc_gz_corpus(
    df: DataFrame,
    num_containers: int = 40,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Pack documents into deterministic ``.warc.gz``-shaped containers —
    the Common-Crawl delivery format proper: one WARC/1.0 "response" record
    per document (version line, ``WARC-Type`` / ``WARC-Record-ID`` /
    ``WARC-Target-URI`` / ``Content-Length`` headers, CRLF framing, payload,
    trailing CRLF CRLF), each record gzip-compressed as its OWN member
    (``mtime=0`` — byte-deterministic) per the WARC spec §annex, members
    concatenated into the container. ``applyInPandas``: containers build in
    their executors, the driver sees nothing."""
    import pandas as pd  # noqa: F401

    def pack(pdf):
        import gzip

        import pandas as pd

        pdf = pdf.sort_values(id_col)
        members = []
        for i, t in zip(pdf[id_col], pdf[text_col]):
            body = ("" if t is None else str(t)).encode("utf-8")
            rec = (
                b"WARC/1.0\r\n"
                + b"WARC-Type: response\r\n"
                + f"WARC-Record-ID: <urn:doc:{int(i)}>\r\n".encode()
                + f"WARC-Target-URI: https://example.com/doc/{int(i)}\r\n".encode()
                + f"Content-Length: {len(body)}\r\n".encode()
                + b"\r\n"
                + body
                + b"\r\n\r\n"
            )
            members.append(gzip.compress(rec, mtime=0))
        payload = b"".join(members)
        return pd.DataFrame(
            {
                "container_id": [int(pdf["__cid"].iloc[0])],
                "payload": [payload],
                "n_bytes": [len(payload)],
                "n_records": [len(members)],
            }
        )

    keyed = df.select(
        F.col(id_col), F.col(text_col), (F.col(id_col) % num_containers).alias("__cid")
    )
    return keyed.groupBy("__cid").applyInPandas(pack, schema=CONTAINER_SCHEMA)


def warc_extract(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Expand ``.warc.gz`` containers into typed records through the Arrow
    seam: the multi-member gzip walk of :func:`gzip_extract_jsonl` (one
    member per record — the spec's random-access property), then a strict
    WARC parse per member: version line must be ``WARC/1.0``, headers read
    until the blank line, the payload is EXACTLY ``Content-Length`` bytes
    (never "until the next record" — binary payloads may contain anything).
    Emits ``(container_id, record_index, warc_type, target_uri,
    content_length, text)``; malformed version lines or short payloads
    raise — corrupt input is a data error, not a skip."""

    def op(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import zlib

        import pandas as pd

        def members(b: bytes):
            rest = bytes(b)
            while rest.startswith(b"\x1f\x8b"):
                d = zlib.decompressobj(wbits=31)
                data = d.decompress(rest) + d.flush()
                yield data
                rest = d.unused_data

        def parse(rec: bytes):
            head, sep, rest = rec.partition(b"\r\n\r\n")
            if not sep:
                raise ValueError("WARC record without header terminator")
            lines = head.split(b"\r\n")
            if lines[0] != b"WARC/1.0":
                raise ValueError(f"bad WARC version line: {lines[0]!r}")
            hdrs = {}
            for ln in lines[1:]:
                k, _, v = ln.partition(b": ")
                hdrs[k.decode("ascii").lower()] = v.decode("utf-8")
            n = int(hdrs["content-length"])
            if len(rest) < n:
                raise ValueError("truncated WARC payload")
            body = rest[:n]
            return (
                hdrs.get("warc-type", ""),
                hdrs.get("warc-target-uri", ""),
                n,
                body.decode("utf-8"),
            )

        for pdf in batches:
            rows = []
            for cid, payload in zip(pdf["container_id"], pdf[payload_col]):
                for ri, member in enumerate(members(payload)):
                    wt, uri, n, text = parse(member)
                    rows.append((int(cid), ri, wt, uri, n, text))
            yield pd.DataFrame(
                rows,
                columns=[
                    "container_id",
                    "record_index",
                    "warc_type",
                    "target_uri",
                    "content_length",
                    "text",
                ],
            )

    return df.mapInPandas(op, schema=WARC_RECORD_SCHEMA)
