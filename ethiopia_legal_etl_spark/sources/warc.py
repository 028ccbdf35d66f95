"""WARC (Web ARChive, ISO 28500) reader/writer — the container format
of Common Crawl and every large-scale web harvest, i.e. the actual
on-disk shape of a 100 TB pretraining corpus. Dependency-free: WARC is
line-oriented headers + byte-counted blocks, and the compressed layout
is per-record gzip MEMBERS, which stdlib zlib handles.

Why per-record gzip members matter at 100 TB (the Common Crawl
convention, and the scale-correct one): a .warc.gz file is a
CONCATENATION of independently-deflated records, so a reader can start
inflating at any member boundary without touching preceding bytes —
record-parallel decode, the same self-containment property as IMA
audio blocks and MJPEG frames elsewhere in this engine. A monolithic
gzip stream would force serial decompression of the whole file; the
member test pins that our writer preserves splittability.

Parity note: generalizes the reference's one-page HTTP fetch
(fetch_legal_docs.py) to the archive format a crawl at scale actually
produces and a training pipeline actually ingests.
"""

from __future__ import annotations

import gzip
import io

CRLF = b"\r\n"


def write_warc_record(
    rec_type: str,
    uri: str,
    date: str,
    payload: bytes,
    record_id: str,
) -> bytes:
    """One uncompressed WARC/1.0 record: header lines, a blank line,
    the byte-counted block, and the spec's two trailing CRLFs."""
    headers = (
        f"WARC/1.0\r\n"
        f"WARC-Type: {rec_type}\r\n"
        f"WARC-Target-URI: {uri}\r\n"
        f"WARC-Date: {date}\r\n"
        f"WARC-Record-ID: <urn:uuid:{record_id}>\r\n"
        f"Content-Length: {len(payload)}\r\n"
        f"\r\n"
    ).encode()
    return headers + payload + CRLF + CRLF


def write_warc(records: list[dict], compress: bool = False) -> bytes:
    """records of {type, uri, date, payload, record_id} -> WARC bytes.
    compress=True emits one gzip MEMBER per record (the Common Crawl
    splittable layout), not one stream over the whole file."""
    out = io.BytesIO()
    for r in records:
        raw = write_warc_record(
            r["type"], r["uri"], r["date"], r["payload"], r["record_id"]
        )
        if compress:
            # mtime=0 -> deterministic bytes (reproducible archives)
            out.write(gzip.compress(raw, mtime=0))
        else:
            out.write(raw)
    return out.getvalue()


def _split_gzip_members(payload: bytes) -> list[bytes]:
    """Decompress a concatenation of gzip members one member at a
    time — the record-parallel access pattern a splittable .warc.gz
    enables (each member is fully self-contained)."""
    import zlib

    members, pos = [], 0
    while pos < len(payload):
        d = zlib.decompressobj(wbits=31)  # 31 = gzip wrapper
        try:
            members.append(d.decompress(payload[pos:]))
        except zlib.error as exc:
            # corrupt DEFLATE must surface as the parser's rejection
            # type so per-record error isolation can route it
            raise ValueError(f"corrupt gzip member: {exc}") from exc
        if not d.eof:
            raise ValueError("truncated gzip member")
        consumed = len(payload) - pos - len(d.unused_data)
        pos += consumed
    return members


def parse_warc(payload: bytes) -> list[dict]:
    """WARC bytes (plain or per-record-gzipped) -> list of records
    {type, uri, date, record_id, payload}. ValueError on malformed
    input — truncated blocks, bad version lines, missing
    Content-Length — never a silently-wrong record."""
    if payload[:2] == b"\x1f\x8b":
        chunks = _split_gzip_members(payload)
        out = []
        for c in chunks:
            out.extend(parse_warc(c))
        return out
    records, pos = [], 0
    while pos < len(payload):
        if payload[pos : pos + 2] == CRLF:  # inter-record padding
            pos += 2
            continue
        end = payload.find(CRLF + CRLF, pos)
        if end < 0:
            raise ValueError("missing header terminator")
        head = payload[pos:end].decode("utf-8", "strict").split("\r\n")
        if not head[0].startswith("WARC/"):
            raise ValueError(f"bad version line {head[0]!r}")
        fields = {}
        for line in head[1:]:
            k, _, v = line.partition(":")
            fields[k.strip().lower()] = v.strip()
        if "content-length" not in fields:
            raise ValueError("record without Content-Length")
        n = int(fields["content-length"])
        if n < 0:
            # a negative length would move pos BACKWARDS and loop the
            # executor task forever — a hostile archive must reject,
            # not hang, for per-record error isolation to hold
            raise ValueError(f"negative Content-Length {n}")
        body_start = end + 4
        if body_start + n > len(payload):
            raise ValueError("truncated record block")
        records.append(
            {
                "type": fields.get("warc-type", ""),
                "uri": fields.get("warc-target-uri", ""),
                "date": fields.get("warc-date", ""),
                "record_id": fields.get("warc-record-id", "")
                .removeprefix("<urn:uuid:")
                .removesuffix(">"),
                "payload": payload[body_start : body_start + n],
            }
        )
        pos = body_start + n
    return records
