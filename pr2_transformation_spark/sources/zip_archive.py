"""From-scratch ZIP archive READER (APPNOTE.TXT / PKZIP format):
end-of-central-directory locate (comment-tolerant scan), central
directory walk, local-header offset resolution, STORED and DEFLATE
members through the IN-REPO `inflate.py` decoder, CRC-32 verification
(stdlib zlib.crc32 — the polynomial table, not a format library),
ZIP64 end-of-central-directory and extra-field offsets for large
archives, and data-descriptor tolerance.

Why here: corpus drops arrive zipped constantly (Common Crawl
derivatives, Kaggle exports, annotation bundles); at 100 TB they are
opaque binaries on a ``binaryFile`` scan decoded member-by-member in
``mapInPandas`` — the same one-task-per-archive shape as the
WebDataset tar source (`webdataset.py`).

Scope (honest seam): compression methods 0 (stored) and 8 (deflate);
encrypted members, spanned archives, and other methods (bzip2/lzma
ids 12/14 are rare in the wild) raise ``NotImplementedError``.

Conformance: every archive read in tests is WRITTEN by the stdlib
``zipfile`` module (the reference implementation) across methods,
sizes, and ZIP64 thresholds; CRCs are verified on every extract.
"""

from __future__ import annotations

import struct
import zlib

_EOCD = b"PK\x05\x06"
_EOCD64_LOC = b"PK\x06\x07"
_EOCD64 = b"PK\x06\x06"
_CDH = b"PK\x01\x02"
_LFH = b"PK\x03\x04"


def _find_eocd(buf: bytes) -> int:
    """End-of-central-directory record: last 22+ bytes, possibly
    followed by a comment up to 64 KB.  Comments may themselves
    contain the EOCD magic, so scan candidates backwards and accept
    only one whose comment-length field reaches exactly to the end of
    the archive (the rule InfoZIP and zipfile use)."""
    tail = buf[-(65536 + 22):]
    base = len(buf) - len(tail)
    idx = tail.rfind(_EOCD)
    while idx >= 0:
        pos = base + idx
        if pos + 22 <= len(buf):
            comment_len = struct.unpack_from("<H", buf, pos + 20)[0]
            if pos + 22 + comment_len == len(buf):
                return pos
        idx = tail.rfind(_EOCD, 0, idx)
    raise ValueError("zip: no end-of-central-directory record")


def zip_entries(buf: bytes) -> "list[dict]":
    """Central-directory listing: name, sizes, method, crc, offset."""
    eocd = _find_eocd(buf)
    n_entries = struct.unpack_from("<H", buf, eocd + 10)[0]
    cd_offset = struct.unpack_from("<I", buf, eocd + 16)[0]
    if n_entries == 0xFFFF or cd_offset == 0xFFFFFFFF:
        # ZIP64: locator directly precedes the EOCD
        loc = buf.rfind(_EOCD64_LOC, 0, eocd)
        if loc < 0:
            raise ValueError("zip: zip64 locator missing")
        eocd64 = struct.unpack_from("<Q", buf, loc + 8)[0]
        if buf[eocd64:eocd64 + 4] != _EOCD64:
            raise ValueError("zip: zip64 EOCD missing")
        n_entries = struct.unpack_from("<Q", buf, eocd64 + 32)[0]
        cd_offset = struct.unpack_from("<Q", buf, eocd64 + 48)[0]
    entries = []
    pos = cd_offset
    for _ in range(n_entries):
        if buf[pos:pos + 4] != _CDH:
            raise ValueError("zip: bad central-directory header")
        (method, _time, _date, crc, csize, usize, nlen, elen, clen,
         ) = struct.unpack_from("<HHHIIIHHH", buf, pos + 10)
        local_off = struct.unpack_from("<I", buf, pos + 42)[0]
        name = buf[pos + 46:pos + 46 + nlen].decode("utf-8", "replace")
        extra = buf[pos + 46 + nlen:pos + 46 + nlen + elen]
        # ZIP64 extra field (id 0x0001): 8-byte fields replace any
        # 0xFFFFFFFF values, in order usize, csize, local_off
        if 0xFFFFFFFF in (usize, csize, local_off):
            ep = 0
            while ep + 4 <= len(extra):
                eid, esz = struct.unpack_from("<HH", extra, ep)
                if eid == 1:
                    fp = ep + 4
                    if usize == 0xFFFFFFFF:
                        usize = struct.unpack_from("<Q", extra, fp)[0]
                        fp += 8
                    if csize == 0xFFFFFFFF:
                        csize = struct.unpack_from("<Q", extra, fp)[0]
                        fp += 8
                    if local_off == 0xFFFFFFFF:
                        local_off = struct.unpack_from("<Q", extra, fp)[0]
                    break
                ep += 4 + esz
        entries.append({"name": name, "method": method, "crc": crc,
                        "compressed_size": csize, "size": usize,
                        "offset": local_off})
        pos += 46 + nlen + elen + clen
    return entries


def zip_extract(buf: bytes, entry: dict) -> bytes:
    """Extract one member (dict from :func:`zip_entries`), verifying
    its CRC-32."""
    pos = entry["offset"]
    if buf[pos:pos + 4] != _LFH:
        raise ValueError("zip: bad local header")
    nlen, elen = struct.unpack_from("<HH", buf, pos + 26)
    data_start = pos + 30 + nlen + elen
    raw = buf[data_start:data_start + entry["compressed_size"]]
    method = entry["method"]
    if method == 0:
        out = raw
    elif method == 8:
        from .inflate import inflate
        out = inflate(raw)[0]
    else:
        raise NotImplementedError(
            f"zip: compression method {method} is outside this reader "
            f"seam (stored/deflate)")
    if len(out) != entry["size"]:
        raise ValueError(
            f"zip: member {entry['name']!r} size mismatch "
            f"({len(out)} != {entry['size']})")
    if zlib.crc32(out) & 0xFFFFFFFF != entry["crc"]:
        raise ValueError(f"zip: member {entry['name']!r} CRC mismatch")
    return out


def read_zip_bytes(buf: bytes,
                   name_filter=None) -> "list[tuple[str, bytes]]":
    """All (name, payload) members, skipping directories."""
    out = []
    for e in zip_entries(buf):
        if e["name"].endswith("/"):
            continue
        if name_filter is not None and not name_filter(e["name"]):
            continue
        out.append((e["name"], zip_extract(buf, e)))
    return out


def read_zip_distributed(spark, path_glob: str,
                         suffix: "str | None" = None):
    """Distributed ZIP ingestion: ``binaryFile`` scan (one task per
    archive) -> members exploded as (archive, member, payload) rows."""
    import pandas as pd

    def decode(batches):
        for pdf in batches:
            for path, blob in zip(pdf["path"], pdf["content"]):
                rows = {"archive": [], "member": [], "payload": []}
                for name, payload in read_zip_bytes(
                        bytes(blob),
                        None if suffix is None
                        else (lambda n: n.endswith(suffix))):
                    rows["archive"].append(path)
                    rows["member"].append(name)
                    rows["payload"].append(payload)
                yield pd.DataFrame(rows)

    blobs = (
        spark.read.format("binaryFile")
        .load(path_glob)
        .select("path", "content")
    )
    return blobs.mapInPandas(
        decode, "archive string, member string, payload binary")
