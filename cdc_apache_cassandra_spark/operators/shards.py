"""WebDataset-style tar shard operations — native ustar parsing.

Large multimodal training corpora ship as tar shards whose members pair
up by basename (``0001.txt`` + ``0001.jpg`` = one sample; WebDataset
convention). The pipeline-level operations are CONTAINER work: walk the
512-byte ustar headers, resolve member byte ranges, group members into
samples by key, slice payloads — no decompression or codec involved, so
it all runs natively here and the per-member byte ranges feed the same
decode plug-points as the MP4/MP3 probes.

Parser scope: ustar/POSIX headers (name 100 bytes, octal size at offset
124, typeflag at 156), data rounded up to 512-byte blocks, end marker =
two zero blocks. GNU longname/longlink entries (typeflag 'L') are
resolved; sparse files and pax extended headers are rejected explicitly.
Cross-checked against the stdlib ``tarfile`` writer in tests (we parse
what an independent implementation wrote).
"""

from __future__ import annotations

BLOCK = 512


def parse_tar_members(blob: bytes) -> list[dict]:
    """Walk a tar archive's headers; return
    ``[{name, offset, size, typeflag}]`` with absolute payload offsets.
    Raises on malformed headers / truncation (a mis-stepped walk loses
    header alignment, so the walk itself validates the shard)."""
    out: list[dict] = []
    pos = 0
    pending_longname: str | None = None
    while pos + BLOCK <= len(blob):
        hdr = blob[pos : pos + BLOCK]
        if hdr == b"\x00" * BLOCK:  # end-of-archive marker
            break
        # header checksum FIRST (bytes 148-156 treated as spaces): it
        # gates every other field against corruption
        try:
            stored = int(hdr[148:156].split(b"\x00", 1)[0].strip() or b"0", 8)
        except ValueError as exc:
            raise ValueError(f"tar header checksum mismatch at {pos}") from exc
        calc = sum(hdr[:148]) + 8 * 32 + sum(hdr[156:])
        if stored != calc:
            raise ValueError(f"tar header checksum mismatch at {pos}")
        name = hdr[0:100].split(b"\x00", 1)[0].decode("utf-8")
        size_field = hdr[124:136].split(b"\x00", 1)[0].strip()
        try:
            size = int(size_field or b"0", 8)
        except ValueError as exc:
            raise ValueError(f"bad size field at {pos}: {size_field!r}") from exc
        typeflag = chr(hdr[156]) if hdr[156] else "0"
        data_off = pos + BLOCK
        if typeflag == "L":  # GNU longname: payload is the real name
            pending_longname = (
                blob[data_off : data_off + size].split(b"\x00", 1)[0].decode()
            )
        elif typeflag in ("x", "g", "S"):
            raise NotImplementedError(
                f"tar typeflag {typeflag!r} (pax/sparse) not supported"
            )
        else:
            if pending_longname is not None:
                name = pending_longname
                pending_longname = None
            if typeflag in ("0", "\x00"):
                out.append(
                    {
                        "name": name,
                        "offset": data_off,
                        "size": size,
                        "typeflag": typeflag,
                    }
                )
        pos = data_off + ((size + BLOCK - 1) // BLOCK) * BLOCK
    else:
        raise ValueError("tar truncated: no end-of-archive marker")
    return out


def gzip_members(blob: bytes) -> list[bytes]:
    """Decompress a MULTI-MEMBER gzip stream into its members' payloads
    — the Common Crawl WET/WARC convention (one gzip member per record,
    concatenated; readers must keep consuming after the first member,
    which naive ``zlib.decompress`` does not). Pure stdlib zlib:
    ``decompressobj(wbits=31)`` per member, member boundaries recovered
    from ``unused_data``. Raises on trailing garbage or a truncated
    member."""
    import zlib

    out: list[bytes] = []
    rest = bytes(blob)
    while rest:
        if rest[:2] != b"\x1f\x8b":
            raise ValueError(
                f"trailing non-gzip bytes after member {len(out)}"
            )
        d = zlib.decompressobj(wbits=31)
        payload = d.decompress(rest)
        if not d.eof:
            raise ValueError(f"truncated gzip member {len(out)}")
        out.append(payload)
        rest = d.unused_data
    return out


def jsonl_records(payload: bytes) -> list[dict]:
    """Parse a JSON-lines payload (one object per non-empty line)."""
    import json

    return [
        json.loads(line)
        for line in payload.decode("utf-8").splitlines()
        if line.strip()
    ]


def parse_zip_members(blob: bytes) -> list[dict]:
    """ZIP central-directory walk (the authoritative index — local
    headers can lie about sizes under streaming writers): locate the
    end-of-central-directory record, walk the central headers, and
    resolve each member's compressed payload range past its local
    header. Returns ``[{name, method, offset, csize, usize, crc32}]``.
    Methods: 0 = stored, 8 = deflate (inflate with ``zlib`` wbits=-15);
    others are rejected at extraction."""
    import struct

    eocd = blob.rfind(b"PK\x05\x06")
    if eocd < 0:
        raise ValueError("no end-of-central-directory record")
    n_this, n_total = struct.unpack_from("<HH", blob, eocd + 8)
    cd_size, cd_off = struct.unpack_from("<II", blob, eocd + 12)
    out: list[dict] = []
    pos = cd_off
    for _ in range(n_total):
        if blob[pos : pos + 4] != b"PK\x01\x02":
            raise ValueError(f"bad central header at {pos}")
        method = struct.unpack_from("<H", blob, pos + 10)[0]
        crc, csize, usize = struct.unpack_from("<III", blob, pos + 16)
        nlen, elen, clen = struct.unpack_from("<HHH", blob, pos + 28)
        (lho,) = struct.unpack_from("<I", blob, pos + 42)
        name = blob[pos + 46 : pos + 46 + nlen].decode("utf-8")
        # payload starts after the member's LOCAL header (its own
        # name/extra lengths may differ from the central ones)
        if blob[lho : lho + 4] != b"PK\x03\x04":
            raise ValueError(f"bad local header for {name!r} at {lho}")
        lnlen, lelen = struct.unpack_from("<HH", blob, lho + 26)
        data_off = lho + 30 + lnlen + lelen
        out.append(
            {
                "name": name,
                "method": method,
                "offset": data_off,
                "csize": csize,
                "usize": usize,
                "crc32": crc,
            }
        )
        pos += 46 + nlen + elen + clen
    return out


def read_zip_member(blob: bytes, member: dict) -> bytes:
    """Extract + verify one member: stored or deflate, CRC-checked."""
    import zlib

    raw = blob[member["offset"] : member["offset"] + member["csize"]]
    if member["method"] == 0:
        data = raw
    elif member["method"] == 8:
        data = zlib.decompress(raw, wbits=-15)
    else:
        raise NotImplementedError(
            f"zip compression method {member['method']} (only stored/deflate)"
        )
    if len(data) != member["usize"] or (
        zlib.crc32(data) & 0xFFFFFFFF
    ) != member["crc32"]:
        raise ValueError(f"zip member {member['name']!r} failed CRC/size check")
    return data


def webdataset_samples(members: list[dict]) -> dict[str, dict[str, dict]]:
    """Group tar members into WebDataset samples: the key is the member
    basename up to the FIRST dot, the modality is everything after it
    (``0007.cls.txt`` -> key ``0007``, modality ``cls.txt``)."""
    samples: dict[str, dict[str, dict]] = {}
    for m in members:
        base = m["name"].rsplit("/", 1)[-1]
        if "." in base:
            key, modality = base.split(".", 1)
        else:
            key, modality = base, ""
        samples.setdefault(key, {})[modality] = m
    return samples
