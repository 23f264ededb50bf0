"""WebDataset-style tar shards — the de-facto layout for sharded
multimodal training data: a POSIX tar whose members are named
``{key}.{ext}``; all members sharing a key form one SAMPLE (e.g.
``000123.jpg`` + ``000123.txt`` + ``000123.json``), and samples are
stored contiguously so a shard streams sequentially.

Container correctness is delegated to stdlib ``tarfile`` (USTAR
format); what this module owns is the webdataset GROUPING contract:
members split on the FIRST dot (keys may not contain dots, extensions
may — ``a.seg.png`` is sample ``a``, part ``seg.png``), sample order =
first-appearance order, non-contiguous members of the same key raise
(the sequential-streaming contract a shard reader relies on).

At 100 TB: one shard file per row (binary column), Arrow-batched
encode/extract like every media kernel here.
"""

from __future__ import annotations

import io
import tarfile


def encode_wds_shard(samples: list[tuple[str, list[tuple[str, bytes]]]]) -> bytes:
    """Assemble a shard from [(key, [(ext, payload), ...]), ...].
    Member metadata is pinned (mtime 0, root ownership) so shard bytes
    are deterministic."""
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        for key, parts in samples:
            if "." in key:
                raise ValueError(f"webdataset keys may not contain '.': {key!r}")
            for ext, payload in parts:
                info = tarfile.TarInfo(name=f"{key}.{ext}")
                info.size = len(payload)
                info.mtime = 0
                tf.addfile(info, io.BytesIO(payload))
    return buf.getvalue()


def parse_wds_shard(
    payload: bytes,
    on_error: str = "raise",
    skip_counter=None,
    expected_exts=None,
) -> list[tuple[str, dict[str, bytes]]]:
    """Read a shard back into [(key, {ext: payload})] in first-appearance
    order, enforcing the contiguity contract.

    ``on_error='raise'`` (default): any malformed member or torn tar
    framing fails the parse. ``on_error='skip'``: a CONTRACT-violating
    member (no extension, non-contiguous stray of an earlier key) is
    dropped and the walk continues; torn tar FRAMING (truncated shard,
    corrupt header block) ends the walk with the SEALED prefix — tar
    has no member magic to resync on, so prefix recovery is the honest
    contract, and it matches how a sequential shard reader consumes
    webdataset tars at 100 TB (everything before the tear streams fine).

    Sealing: a sample is *sealed* once a well-formed member header with
    a DIFFERENT key has been parsed after it (its contiguous run is
    provably over), or when the archive ends cleanly.  On a mid-walk
    tear only unsealed samples are dropped — a tear in sample k+1's
    first member no longer costs the fully-read sample k (it used to:
    the old recovery popped the last sample unconditionally).  Two
    asymmetries are intrinsic to tar framing and documented rather than
    papered over: (a) the final pre-tear sample is dropped even when
    its already-read parts were intact, because tar carries no
    end-of-sample marker and the tear may have eaten its continuation;
    (b) damage that MIMICS a clean end of archive (a zeroed header
    block, a truncation landing exactly on a member boundary — stdlib
    tarfile silently treats both as EOF) seals the walk, so the last
    returned sample can be a parts-subset of the original.  Survivors
    are always a byte-intact, order-preserving prefix with no
    fabrication (property-fuzzed in tests/test_properties.py).

    ``expected_exts`` closes asymmetry (b) for callers that require
    COMPLETE samples: pass the set of extensions every sample must
    carry (e.g. ``{"jpg", "txt"}``) and any returned sample missing one
    is dropped under ``on_error='skip'`` / raises under ``'raise'`` —
    so a forged-EOF parts-subset can never be consumed as a whole
    sample. Applied uniformly (not just to the final sample): an
    incomplete sample mid-shard is the same contract violation.
    Samples may carry EXTRA extensions; only the named ones are
    mandatory. Leave it ``None`` for corpora with legitimately ragged
    parts.

    Quarantine observability (same contract as parse_warc and the media
    extractors): ``skip_counter`` (any ``.add(n)`` object — a Spark
    accumulator from inside a mapInPandas ingest closure) counts every
    quarantine EVENT: +1 per dropped contract-violating member
    (extensionless, non-contiguous stray), +1 per unsealed sample a
    tear drops, +1 per sample failing the ``expected_exts`` check. A
    forged clean EOF whose parts-subset passes ``expected_exts`` (or
    when the check is off) is intrinsically unobservable — tar carries
    no sample count to reconcile against. Accumulator caveat: task
    retries/speculation can over-count; monitoring signal, not an exact
    ledger."""
    if on_error not in ("raise", "skip"):
        raise ValueError(f"on_error must be 'raise' or 'skip', got {on_error!r}")
    if isinstance(expected_exts, (str, bytes)):
        # frozenset("txt") == {'t','x'} — a bare string would silently
        # turn into per-CHARACTER requirements; demand a collection
        raise ValueError(
            "expected_exts must be a collection of extension strings, "
            f"not a bare string: {expected_exts!r}"
        )
    required = frozenset(expected_exts) if expected_exts is not None else None
    if required is not None and not required:
        raise ValueError("expected_exts must be None or a non-empty set of extensions")
    out: list[tuple[str, dict[str, bytes]]] = []
    seen: set[str] = set()
    sealed = 0  # leading samples whose contiguous run is provably over
    try:
        with tarfile.open(fileobj=io.BytesIO(payload), mode="r") as tf:
            for m in tf:
                if not m.isfile():
                    continue
                key, dot, ext = m.name.partition(".")
                if not dot:
                    if on_error == "skip":
                        if skip_counter is not None:
                            skip_counter.add(1)
                        continue
                    raise ValueError(f"member without extension: {m.name!r}")
                if out and out[-1][0] == key:
                    out[-1][1][ext] = tf.extractfile(m).read()
                    continue
                if key in seen:
                    if on_error == "skip":
                        # a SKIPPED stray must NOT seal: the preceding
                        # sample resumes through the continuation branch
                        # above (out[-1] is still it), so its run is not
                        # provably over and a later tear must drop it
                        if skip_counter is not None:
                            skip_counter.add(1)
                        continue
                    raise ValueError(f"non-contiguous sample {key!r} (shard not streamable)")
                # a member header that STARTS a new sample: whatever
                # sample precedes it can receive no further contiguous
                # members (its key reappearing later would be a stray) —
                # it is sealed and survives any later tear
                sealed = len(out)
                seen.add(key)
                out.append((key, {}))
                out[-1][1][ext] = tf.extractfile(m).read()
        sealed = len(out)  # clean end of archive seals the final sample
    except Exception:
        if on_error != "skip":
            raise
        # torn framing: keep the sealed prefix; only samples whose
        # contiguous run the tear could still have been feeding are lost
        if skip_counter is not None and len(out) > sealed:
            skip_counter.add(len(out) - sealed)
        del out[sealed:]
    if required is not None:
        complete = []
        for key, parts in out:
            missing = required - parts.keys()
            if not missing:
                complete.append((key, parts))
            elif on_error == "skip":
                if skip_counter is not None:
                    skip_counter.add(1)
            else:
                raise ValueError(
                    f"sample {key!r} missing required parts {sorted(missing)}"
                )
        out = complete
    return out
