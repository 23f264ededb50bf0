"""WARC (Web ARChive, ISO 28500) writer/reader — the container Common
Crawl ships, i.e. THE ingest format of a web-scale pretraining pipeline.

Layout implemented from the public spec: each record is a WARC/1.0
header block (CRLF-separated ``Name: value`` lines, terminated by a
blank line), ``Content-Length`` octets of body, and a CRLF CRLF record
separator. Files are stored as CONCATENATED PER-RECORD GZIP MEMBERS —
the exact layout crawl archives use so readers can seek to a record and
inflate just that member; the reader here walks members with
``zlib.decompressobj(wbits=31)`` (preserving member boundaries rather
than flattening the stream) and parses one record per member.

At 100 TB: WARC payloads travel as binary columns (one file or one
record-group per row); both synth and extract stages run as
Arrow-batched ``mapInPandas`` over payload-sized partitions — the same
multimodal plumbing contract as operators/multimodal.py.
"""

from __future__ import annotations

import gzip
import zlib

_CRLF = b"\r\n"


def write_warc_record(
    warc_type: str,
    uri: str | None,
    body: bytes,
    extra_headers: dict[str, str] | None = None,
) -> bytes:
    """One uncompressed WARC/1.0 record with the mandatory framing."""
    lines = [b"WARC/1.0", f"WARC-Type: {warc_type}".encode()]
    if uri is not None:
        lines.append(f"WARC-Target-URI: {uri}".encode())
    for k, v in (extra_headers or {}).items():
        lines.append(f"{k}: {v}".encode())
    lines.append(f"Content-Length: {len(body)}".encode())
    return _CRLF.join(lines) + _CRLF + _CRLF + body + _CRLF + _CRLF


def encode_warc(
    records: list[tuple[str, str | None, bytes, dict[str, str] | None]],
    per_record_gzip: bool = True,
) -> bytes:
    """Assemble a WARC file from (type, uri, body, extra_headers)
    tuples. ``per_record_gzip=True`` emits one gzip member per record
    (the crawl-archive layout; mtime pinned to 0 so payloads are
    byte-deterministic), else a plain concatenation."""
    out = bytearray()
    for warc_type, uri, body, extra in records:
        raw = write_warc_record(warc_type, uri, body, extra)
        out += gzip.compress(raw, mtime=0) if per_record_gzip else raw
    return bytes(out)


def _parse_records(
    raw: bytes, prefix_recovery: bool = False, skip_counter=None
) -> list[dict]:
    """Parse concatenated uncompressed records via Content-Length.

    ``prefix_recovery=True`` returns the records parsed BEFORE the first
    framing error instead of raising — the plain (non-gzip) layout has
    no member magic to resync on, so prefix recovery is all a corrupt
    uncompressed WARC supports. A recovery that actually tore (returned
    early) adds 1 to ``skip_counter`` — the torn REMAINDER is of unknown
    record count, so the unit is one tear event, not a record count."""
    out = []
    i = 0
    while i < len(raw):
        try:
            he = raw.find(_CRLF + _CRLF, i)
            if he < 0:
                raise ValueError("truncated WARC header block")
            lines = raw[i:he].split(_CRLF)
            if lines[0] != b"WARC/1.0":
                raise ValueError(f"unsupported WARC version line {lines[0]!r}")
            headers: dict[str, str] = {}
            for ln in lines[1:]:
                k, _, v = ln.partition(b":")
                headers[k.decode().strip()] = v.decode().strip()
            if "Content-Length" not in headers:
                raise ValueError("record missing Content-Length")
            n = int(headers["Content-Length"])
            if n < 0:
                raise ValueError(f"negative Content-Length {n}")
            body = raw[he + 4 : he + 4 + n]
            if len(body) != n:
                raise ValueError("truncated WARC body")
            j = he + 4 + n
            if raw[j : j + 4] != _CRLF + _CRLF:
                raise ValueError("missing record separator")
        except (ValueError, UnicodeDecodeError):
            if prefix_recovery:
                if skip_counter is not None:
                    skip_counter.add(1)
                return out
            raise
        out.append({"headers": headers, "body": body})
        i = j + 4
    return out


_GZIP_MAGIC3 = b"\x1f\x8b\x08"  # magic + deflate method byte


def parse_warc(
    payload: bytes, on_error: str = "raise", skip_counter=None
) -> list[dict]:
    """REAL WARC decode. Gzip files are walked MEMBER BY MEMBER (each
    inflated with its own decompressobj; ``unused_data`` marks the next
    member's offset) — one record per member, as crawl archives store
    them; plain files are split by Content-Length. Returns
    [{"headers": {...}, "body": bytes}, ...].

    ``on_error='raise'`` (default): the first corrupt member fails the
    parse (contract: ValueError). ``on_error='skip'``: a corrupt gzip
    member is DROPPED and the walk RESYNCS at the next gzip magic
    (``1f 8b 08``) after the failed member's start — the recovery real
    crawl-archive readers use, possible exactly because the
    per-record-gzip layout keeps every healthy record independently
    inflatable. A resync candidate that is itself garbage just fails
    and re-resyncs, so the walk strictly advances and terminates. At
    100 TB one flipped bit in one member must cost one record, not the
    shard. Plain (uncompressed) files have no magic to resync on, so
    'skip' degrades to prefix recovery (records before the corruption).

    Quarantine observability (same contract as the media extractors,
    operators/multimodal.py): pass ``skip_counter`` (any object with
    ``.add(n)`` — a ``spark.sparkContext.accumulator(0)`` when called
    from inside a mapInPandas ingest closure) and every quarantine EVENT
    increments it: one per contiguous corrupt gzip REGION dropped (a
    resync chain through garbage that repeatedly fails counts once —
    one damage site must read as one event, not as however many spurious
    magic bytes the garbage happens to contain), one per plain-file tear
    (the torn remainder's record count is unknowable). A parser
    regression looks exactly like corruption to a silent skip; a job
    monitoring its corruption rate can tell them apart. Accumulator
    caveat applies: task retries/speculation can over-count — treat it
    as a monitoring signal; the exact quarantined set is inputs minus
    outputs.
    """
    if on_error not in ("raise", "skip"):
        raise ValueError(f"on_error must be 'raise' or 'skip', got {on_error!r}")
    if payload[:2] == b"\x1f\x8b":
        records = []
        rest = payload
        in_bad_region = False
        while rest:
            d = zlib.decompressobj(wbits=31)
            try:
                try:
                    raw = d.decompress(rest)
                except zlib.error as e:  # corruption contract is ValueError
                    raise ValueError(f"corrupt gzip member: {e}") from e
                if not d.eof:
                    raise ValueError("truncated gzip member")
                member = _parse_records(raw)
                if len(member) != 1:
                    raise ValueError(f"expected 1 record per gzip member, got {len(member)}")
            except ValueError:
                if on_error != "skip":
                    raise
                if not in_bad_region:
                    if skip_counter is not None:
                        skip_counter.add(1)
                    in_bad_region = True
                nxt = rest.find(_GZIP_MAGIC3, 1)
                rest = rest[nxt:] if nxt > 0 else b""
                continue
            in_bad_region = False
            records.extend(member)
            rest = d.unused_data
        return records
    return _parse_records(
        payload,
        prefix_recovery=(on_error == "skip"),
        skip_counter=skip_counter,
    )
