"""OSM PBF source + sink — the planet's native format, implemented
from the PUBLISHED specification (wiki.openstreetmap.org/wiki/
PBF_Format + the protobuf wire format), with no protobuf library:

- File framing: repeated [int32 BE BlobHeader length][BlobHeader]
  [Blob]; BlobHeader carries type ("OSMHeader"/"OSMData") and
  datasize; Blob carries raw or zlib_data(+raw_size).
- PrimitiveBlock: stringtable, primitivegroups, granularity (default
  100), lat/lon offsets (default 0); coordinate = 1e-9 *
  (offset + granularity * value).
- DenseNodes: delta-coded packed sint64 ids/lats/lons and the
  interleaved keys_vals (0 terminates a node's tags).
- Way: packed uint32 keys/vals, delta-coded packed sint64 refs.
- Relation: packed roles_sid / delta-coded memids / member types
  (0 node, 1 way, 2 relation).

Output tables use the exact XML-source schemas
(sources/osm_xml.py:XML_*_SCHEMA) so every downstream pipeline (cut,
clip, tag filters) is format-agnostic; metadata (version/timestamp/
uid/user/changeset) parses from Info/DenseInfo when present, stays
null when the file was written without it.

The hot loops — packed-varint runs for dense nodes and way refs —
decode VECTORIZED: a numpy scan over the byte buffer splits varints
on continuation bits and reduces each run with shift/or (no
per-varint Python). Message framing (one iteration per field, not
per element) stays in Python.

The writer emits spec-compliant DenseNodes/Way/Relation blocks
(zlib, 8k elements per block) — the round-trip and the byte-level
spec vectors in tests/test_pbf.py pin both directions.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pyarrow as pa

from .osm_xml import XML_NODE_SCHEMA, XML_REL_SCHEMA, XML_WAY_SCHEMA

_NANO = 1e-9


# ------------------------------------------------------- wire helpers

def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    out = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, pos
        shift += 7


def _zigzag(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def _s64(v: int) -> int:
    """Sign-extend a plain (non-zigzag) varint read as unsigned.

    proto int32/int64 fields encode negatives as 10-byte two's
    complement varints; without this, -1e9 decodes as ~1.8e19 and a
    spec-valid negative lat/lon offset silently corrupts coordinates
    (ADVICE r4)."""
    return v - (1 << 64) if v >= (1 << 63) else v


def _fields(buf: bytes):
    """Iterate (field_number, wire_type, value) over one message.
    value is int for varint fields, bytes for length-delimited."""
    pos = 0
    n = len(buf)
    while pos < n:
        key, pos = _read_varint(buf, pos)
        fn, wt = key >> 3, key & 7
        if wt == 0:
            v, pos = _read_varint(buf, pos)
            yield fn, wt, v
        elif wt == 2:
            ln, pos = _read_varint(buf, pos)
            yield fn, wt, buf[pos:pos + ln]
            pos += ln
        elif wt == 5:
            yield fn, wt, struct.unpack_from("<i", buf, pos)[0]
            pos += 4
        elif wt == 1:
            yield fn, wt, struct.unpack_from("<q", buf, pos)[0]
            pos += 8
        else:
            raise NotImplementedError(f"wire type {wt}")


def _packed_varints(buf: bytes, *, zigzag: bool) -> np.ndarray:
    """Vectorized packed-varint decode -> int64 array."""
    b = np.frombuffer(buf, np.uint8)
    if len(b) == 0:
        return np.zeros(0, np.int64)
    ends = np.flatnonzero(b < 0x80)  # last byte of each varint
    starts = np.concatenate(([0], ends[:-1] + 1))
    # accumulate little-endian 7-bit groups; varints here are <= 10B
    out = np.zeros(len(ends), np.uint64)
    payload = (b & np.uint64(0x7F)).astype(np.uint64)
    width = ends - starts + 1
    for k in range(int(width.max())):
        sel = width > k
        out[sel] |= payload[starts[sel] + k] << np.uint64(7 * k)
    v = out.view(np.int64)
    if zigzag:
        v = (v.view(np.uint64) >> np.uint64(1)).view(np.int64) \
            ^ -(v & np.int64(1))
    return v


def _encode_varint(v: int) -> bytes:
    out = bytearray()
    v &= (1 << 64) - 1
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _enc_zigzag(v: int) -> int:
    return (v << 1) ^ (v >> 63)


def _key(fn: int, wt: int) -> bytes:
    return _encode_varint((fn << 3) | wt)


def _len_field(fn: int, payload: bytes) -> bytes:
    return _key(fn, 2) + _encode_varint(len(payload)) + payload


def _packed_field(fn: int, vals, *, zigzag: bool) -> bytes:
    body = b"".join(_encode_varint(
        _enc_zigzag(int(v)) if zigzag else int(v)) for v in vals)
    return _len_field(fn, body)


def _varint_field(fn: int, v: int) -> bytes:
    return _key(fn, 0) + _encode_varint(int(v))


# ------------------------------------------------------------- reader

def _string_table(buf: bytes) -> list[str]:
    return [v.decode("utf-8", "replace")
            for fn, _, v in _fields(buf) if fn == 1]


def _parse_info(buf: bytes, strings: list[str],
                date_gran: int) -> dict:
    meta: dict = {}
    for fn, _, v in _fields(buf):
        if fn == 1:
            meta["version"] = int(v)
        elif fn == 2:
            meta["timestamp"] = _ts(_s64(int(v)) * date_gran)
        elif fn == 3:
            meta["changeset"] = _s64(int(v))
        elif fn == 4:
            meta["uid"] = _s64(int(v))
        elif fn == 5:
            meta["user"] = strings[int(v)]
    return meta


def _ts(millis: int) -> str:
    import datetime
    return datetime.datetime.fromtimestamp(
        millis / 1000.0, datetime.timezone.utc
    ).strftime("%Y-%m-%dT%H:%M:%SZ")


def _ts_vec(millis: np.ndarray) -> np.ndarray:
    """Vectorized `_ts`: ISO "...Z" strings (object array). strftime
    drops the fractional second, i.e. floor(millis/1000) — pinned ==
    `_ts` element-wise (incl. negatives) in tests/test_pbf.py."""
    secs = np.floor_divide(millis.astype(np.int64), 1000)
    out = np.datetime_as_string(secs.astype("datetime64[s]"),
                                unit="s")
    return np.char.add(out, "Z").astype(object)


def _dense_tags_loop(kv: np.ndarray, strings: list[str],
                     n: int) -> list[list[tuple[str, str]]]:
    """Reference scan of the delimiter-0 kv stream (the spec's
    per-node `while kv[i] != 0: take (k, v) pairs` walk) — the
    fallback when a 0 appears at a VALUE position (spec-reserved,
    never emitted by real encoders) where the vectorized split's
    even-segment precondition fails."""
    out: list[list[tuple[str, str]]] = []
    kvi = 0
    for _ in range(n):
        tags: list[tuple[str, str]] = []
        while kvi < len(kv) and kv[kvi] != 0:
            tags.append((strings[int(kv[kvi])],
                         strings[int(kv[kvi + 1])]))
            kvi += 2
        kvi += 1  # the 0 separator (absent entirely when no node
        # in the block has tags — kvi then stays past the end)
        out.append(tags)
    return out


def _parse_dense(buf: bytes, strings: list[str], gran: int,
                 lat_off: int, lon_off: int,
                 date_gran: int) -> pa.Table | None:
    """One DenseNodes message -> a COLUMNAR node table (schema
    XML_NODE_SCHEMA). The kv tag stream splits vectorized on the 0
    delimiters: segment starts/ends from one flatnonzero, keys at
    even offsets / values at odd via a repeat+cumcount index build,
    one fancy-index into the string table (r4 verdict #3 — the old
    per-node dict loop was the PBF ingest hot spot). Sound because
    every true node segment has even length; any 0 at a value
    position makes an apparent segment odd, detected, and routed to
    the exact reference scan."""
    ids = lats = lons = kv = None
    dense_info: bytes | None = None
    for fn, _, v in _fields(buf):
        if fn == 1:
            ids = np.cumsum(_packed_varints(v, zigzag=True))
        elif fn == 5:
            dense_info = v
        elif fn == 8:
            lats = np.cumsum(_packed_varints(v, zigzag=True))
        elif fn == 9:
            lons = np.cumsum(_packed_varints(v, zigzag=True))
        elif fn == 10:
            kv = _packed_varints(v, zigzag=False)
    if ids is None:
        return None
    n = len(ids)
    lat = _NANO * (lat_off + np.int64(gran) * lats)
    lon = _NANO * (lon_off + np.int64(gran) * lons)

    # ---- meta columns (arrays may cover a prefix of the nodes;
    # the remainder is null, matching the old per-row dict merge)
    di: dict[int, np.ndarray] = {}
    if dense_info is not None:
        for fn, _, v in _fields(dense_info):
            vals = _packed_varints(v, zigzag=fn in (2, 3, 4, 5))
            di[fn] = np.cumsum(vals) if fn in (2, 3, 4, 5) else vals

    def int_col(f: int) -> pa.Array:
        vals = di.get(f)
        if vals is None:
            return pa.nulls(n, pa.int64())
        m = min(len(vals), n)
        out = np.zeros(n, np.int64)
        out[:m] = vals[:m]
        mask = np.ones(n, bool)
        mask[:m] = False
        return pa.array(out, pa.int64(), mask=mask)

    def str_col(values_obj: np.ndarray | None) -> pa.Array:
        if values_obj is None:
            return pa.nulls(n, pa.large_string())
        m = min(len(values_obj), n)
        out = np.full(n, None, object)
        out[:m] = values_obj[:m]
        return pa.array(out, pa.large_string())

    np_str = np.asarray(strings, dtype=object)
    user = str_col(np_str[di[5].astype(np.int64)]
                   if 5 in di else None)
    tsv = str_col(_ts_vec(di[2] * np.int64(date_gran))
                  if 2 in di else None)

    # ---- tags: vectorized delimiter-0 split of the kv stream
    kv = kv if kv is not None else np.zeros(0, np.int64)
    z = np.flatnonzero(kv == 0)
    starts = np.concatenate(([0], z + 1))
    ends = np.concatenate((z, [len(kv)]))
    m = min(n, len(starts))
    lens = ends[:m] - starts[:m]
    if np.any(lens & 1):
        tags = pa.array(_dense_tags_loop(kv, strings, n),
                        pa.map_(pa.large_string(),
                                pa.large_string()))
    else:
        c = lens // 2
        tot = int(c.sum())
        ksel = np.repeat(starts[:m], c) + 2 * (
            np.arange(tot, dtype=np.int64)
            - np.repeat(np.cumsum(c) - c, c))
        offsets = np.zeros(n + 1, np.int32)
        np.cumsum(c, out=offsets[1:m + 1])
        offsets[m + 1:] = offsets[m]
        tags = pa.MapArray.from_arrays(
            pa.array(offsets, pa.int32()),
            pa.array(np_str[kv[ksel]], pa.large_string()),
            pa.array(np_str[kv[ksel + 1]], pa.large_string()))

    tbl = pa.table({
        "id": pa.array(ids.astype(np.int64)),
        "lon": pa.array(lon.astype(np.float64)),
        "lat": pa.array(lat.astype(np.float64)),
        "version": int_col(1), "changeset": int_col(3),
        "uid": int_col(4), "user": user, "timestamp": tsv,
        "tags": tags})
    return tbl.cast(XML_NODE_SCHEMA)


def _parse_way(buf: bytes, strings: list[str],
               date_gran: int) -> dict:
    row: dict = {"id": 0, "node_ids": [], "tags": []}
    keys = vals = None
    for fn, _, v in _fields(buf):
        if fn == 1:
            row["id"] = _s64(int(v))
        elif fn == 2:
            keys = _packed_varints(v, zigzag=False)
        elif fn == 3:
            vals = _packed_varints(v, zigzag=False)
        elif fn == 4:
            row.update(_parse_info(v, strings, date_gran))
        elif fn == 8:
            row["node_ids"] = np.cumsum(
                _packed_varints(v, zigzag=True)).tolist()
    if keys is not None and vals is not None:
        row["tags"] = [(strings[int(k)], strings[int(x)])
                       for k, x in zip(keys, vals)]
    return row


_MEMBER_TYPES = ("node", "way", "relation")


def _parse_relation(buf: bytes, strings: list[str],
                    date_gran: int) -> dict:
    row: dict = {"id": 0, "members": [], "tags": []}
    keys = vals = roles = memids = types = None
    for fn, _, v in _fields(buf):
        if fn == 1:
            row["id"] = _s64(int(v))
        elif fn == 2:
            keys = _packed_varints(v, zigzag=False)
        elif fn == 3:
            vals = _packed_varints(v, zigzag=False)
        elif fn == 4:
            row.update(_parse_info(v, strings, date_gran))
        elif fn == 8:
            roles = _packed_varints(v, zigzag=False)
        elif fn == 9:
            memids = np.cumsum(_packed_varints(v, zigzag=True))
        elif fn == 10:
            types = _packed_varints(v, zigzag=False)
    if keys is not None and vals is not None:
        row["tags"] = [(strings[int(k)], strings[int(x)])
                       for k, x in zip(keys, vals)]
    if memids is not None:
        row["members"] = [
            {"type": _MEMBER_TYPES[int(types[i])],
             "ref": int(memids[i]),
             "role": strings[int(roles[i])]}
            for i in range(len(memids))]
    return row


def _blob_payload(blob: bytes) -> bytes:
    raw = zdata = None
    for fn, _, v in _fields(blob):
        if fn == 1:
            raw = v
        elif fn == 3:
            zdata = v
    if raw is not None:
        return raw
    if zdata is not None:
        return zlib.decompress(zdata)
    raise NotImplementedError("Blob without raw/zlib_data "
                              "(lzma/lz4 not supported)")


def iter_pbf_blocks(path: str):
    """Yield ("OSMHeader"|"OSMData", payload bytes) per blob."""
    with open(path, "rb") as f:
        while True:
            head = f.read(4)
            if len(head) < 4:
                return
            (hlen,) = struct.unpack(">i", head)
            bh = f.read(hlen)
            btype, dsize = "", 0
            for fn, _, v in _fields(bh):
                if fn == 1:
                    btype = v.decode()
                elif fn == 3:
                    dsize = int(v)
            yield btype, _blob_payload(f.read(dsize))


def parse_osm_pbf(path: str):
    """Yield ("node"|"way"|"relation", pa.Table) batches (one table
    per primitive group), schemas identical to the XML source."""
    schemas = {"node": XML_NODE_SCHEMA, "way": XML_WAY_SCHEMA,
               "relation": XML_REL_SCHEMA}
    for btype, payload in iter_pbf_blocks(path):
        if btype != "OSMData":
            continue
        strings: list[str] = []
        groups: list[bytes] = []
        gran, lat_off, lon_off, date_gran = 100, 0, 0, 1000
        for fn, _, v in _fields(payload):
            if fn == 1:
                strings = _string_table(v)
            elif fn == 2:
                groups.append(v)
            elif fn == 17:
                gran = int(v)
            elif fn == 18:
                date_gran = int(v)
            elif fn == 19:
                lat_off = _s64(int(v))
            elif fn == 20:
                lon_off = _s64(int(v))
        for grp in groups:
            node_tbls: list[pa.Table] = []
            ways: list[dict] = []
            rels: list[dict] = []
            for fn, _, v in _fields(grp):
                if fn == 1:
                    raise NotImplementedError(
                        "non-dense Node groups are not emitted by "
                        "current tools; convert with osmium first")
                elif fn == 2:
                    t = _parse_dense(v, strings, gran, lat_off,
                                     lon_off, date_gran)
                    if t is not None and t.num_rows:
                        node_tbls.append(t)
                elif fn == 3:
                    ways.append(_parse_way(v, strings, date_gran))
                elif fn == 4:
                    rels.append(_parse_relation(v, strings,
                                                date_gran))
            if node_tbls:
                yield "node", pa.concat_tables(node_tbls)
            for kind, rows in (("way", ways), ("relation", rels)):
                if rows:
                    yield kind, pa.Table.from_pylist(
                        rows, schema=schemas[kind])


def pbf_to_parquet(pbf_path: str, out_dir: str) -> dict[str, str]:
    """PBF -> the same partitioned parquet layout as
    `osm_xml_to_parquet` (one part per primitive group, resumable
    downstream reads)."""
    import os

    import pyarrow.parquet as pq
    dirs = {k: os.path.join(out_dir, f"{k}s")
            for k in ("node", "way", "relation")}
    for d in dirs.values():
        os.makedirs(d, exist_ok=True)
    counts = {k: 0 for k in dirs}
    for kind, tbl in parse_osm_pbf(pbf_path):
        part = os.path.join(dirs[kind],
                            f"part-{counts[kind]:05d}.parquet")
        tmp = part + ".tmp"
        pq.write_table(tbl, tmp)
        os.replace(tmp, part)
        counts[kind] += 1
    schemas = {"node": XML_NODE_SCHEMA, "way": XML_WAY_SCHEMA,
               "relation": XML_REL_SCHEMA}
    for kind, d in dirs.items():
        if counts[kind] == 0:
            pq.write_table(schemas[kind].empty_table(),
                           os.path.join(d, "part-00000.parquet"))
    return dirs


def load_osm_pbf(pbf_path: str, work_dir: str):
    """PBF -> (nodes, ways, relations) Ray Datasets via parquet."""
    import ray.data as rd
    dirs = pbf_to_parquet(pbf_path, work_dir)
    return (rd.read_parquet(dirs["node"]),
            rd.read_parquet(dirs["way"]),
            rd.read_parquet(dirs["relation"]))


# ------------------------------------------------------------- writer

def _st_index(strings: dict[str, int], s: str) -> int:
    i = strings.get(s)
    if i is None:
        i = len(strings)
        strings[s] = i
    return i


def _ts_inv(ts: str) -> int:
    """ISO timestamp string -> epoch millis (inverse of `_ts`)."""
    import datetime
    return int(datetime.datetime.strptime(
        ts, "%Y-%m-%dT%H:%M:%SZ").replace(
        tzinfo=datetime.timezone.utc).timestamp() * 1000)


def _info_bytes(row: dict, strings: dict[str, int]) -> bytes:
    """Per-element Info message (absolute values); empty when the row
    carries no metadata."""
    out = b""
    if row.get("version") is not None:
        out += _varint_field(1, int(row["version"]))
    if row.get("timestamp") is not None:
        out += _varint_field(2, _ts_inv(row["timestamp"]) // 1000)
    if row.get("changeset") is not None:
        out += _varint_field(3, int(row["changeset"]))
    if row.get("uid") is not None:
        out += _varint_field(4, int(row["uid"]))
    if row.get("user") is not None:
        out += _varint_field(5, _st_index(strings, str(row["user"])))
    return out


def _dense_info_bytes(rows: list[dict],
                      strings: dict[str, int]) -> bytes:
    """DenseInfo parallel arrays; a field is emitted only when EVERY
    row carries it (the arrays must cover all nodes)."""
    out = b""
    if all(r.get("version") is not None for r in rows):
        out += _packed_field(1, [int(r["version"]) for r in rows],
                             zigzag=False)
    if all(r.get("timestamp") is not None for r in rows):
        out += _packed_field(2, _delta(
            [_ts_inv(r["timestamp"]) // 1000 for r in rows]),
            zigzag=True)
    if all(r.get("changeset") is not None for r in rows):
        out += _packed_field(3, _delta(
            [int(r["changeset"]) for r in rows]), zigzag=True)
    if all(r.get("uid") is not None for r in rows):
        out += _packed_field(4, _delta(
            [int(r["uid"]) for r in rows]), zigzag=True)
    if all(r.get("user") is not None for r in rows):
        out += _packed_field(5, _delta(
            [_st_index(strings, str(r["user"])) for r in rows]),
            zigzag=True)
    return out


def _blob(btype: str, payload: bytes) -> bytes:
    z = zlib.compress(payload, 6)
    blob = _varint_field(2, len(payload)) + _len_field(3, z)
    bh = _len_field(1, btype.encode()) + _varint_field(3, len(blob))
    return struct.pack(">i", len(bh)) + bh + blob


def _header_blob() -> bytes:
    hb = _len_field(4, b"OsmSchema-V0.6") \
        + _len_field(4, b"DenseNodes") \
        + _len_field(16, b"osm_cut_ray")
    return _blob("OSMHeader", hb)


def write_osm_pbf(out_path: str, nodes_iter, ways_iter, rels_iter,
                  block_elements: int = 8000) -> int:
    """Serialize dict rows (Dataset.iter_rows shape) to a
    spec-compliant .osm.pbf (DenseNodes + Way + Relation groups,
    zlib blobs). Returns elements written."""
    total = 0

    def flush(fh, make_group):
        strings: dict[str, int] = {"": 0}
        grp = make_group(strings)
        st = sorted(strings, key=strings.get)
        stable = b"".join(_len_field(1, s.encode()) for s in st)
        block = _len_field(1, stable) + _len_field(2, grp) \
            + _varint_field(17, 100) + _varint_field(18, 1000)
        fh.write(_blob("OSMData", block))

    with open(out_path, "wb") as fh:
        fh.write(_header_blob())
        for chunk in _chunks(nodes_iter, block_elements):
            def dense(strings, rows=chunk):
                ids = [int(r["id"]) for r in rows]
                lat = [int(round(float(r["lat"]) / _NANO / 100))
                       for r in rows]
                lon = [int(round(float(r["lon"]) / _NANO / 100))
                       for r in rows]
                kv: list[int] = []
                for r in rows:
                    for k, v in (r.get("tags") or []):
                        kv.append(_st_index(strings, str(k)))
                        kv.append(_st_index(strings, str(v)))
                    kv.append(0)
                dense_msg = _packed_field(1, _delta(ids), zigzag=True)
                dinfo = _dense_info_bytes(rows, strings)
                if dinfo:
                    dense_msg += _len_field(5, dinfo)
                dense_msg += _packed_field(8, _delta(lat), zigzag=True) \
                    + _packed_field(9, _delta(lon), zigzag=True) \
                    + _packed_field(10, kv, zigzag=False)
                return _len_field(2, dense_msg)
            flush(fh, dense)
            total += len(chunk)
        for chunk in _chunks(ways_iter, block_elements):
            def wgrp(strings, rows=chunk):
                out = b""
                for r in rows:
                    keys = [_st_index(strings, str(k))
                            for k, _ in (r.get("tags") or [])]
                    vals = [_st_index(strings, str(v))
                            for _, v in (r.get("tags") or [])]
                    msg = _varint_field(1, int(r["id"])) \
                        + _packed_field(2, keys, zigzag=False) \
                        + _packed_field(3, vals, zigzag=False)
                    info = _info_bytes(r, strings)
                    if info:
                        msg += _len_field(4, info)
                    msg += _packed_field(
                        8, _delta([int(x) for x in
                                   (r.get("node_ids") or [])]),
                        zigzag=True)
                    out += _len_field(3, msg)
                return out
            flush(fh, wgrp)
            total += len(chunk)
        for chunk in _chunks(rels_iter, block_elements):
            def rgrp(strings, rows=chunk):
                out = b""
                for r in rows:
                    keys = [_st_index(strings, str(k))
                            for k, _ in (r.get("tags") or [])]
                    vals = [_st_index(strings, str(v))
                            for _, v in (r.get("tags") or [])]
                    mem = r.get("members") or []
                    roles = [_st_index(strings, m.get("role") or "")
                             for m in mem]
                    mids = _delta([int(m["ref"]) for m in mem])
                    mtys = [_MEMBER_TYPES.index(m["type"])
                            for m in mem]
                    msg = _varint_field(1, int(r["id"])) \
                        + _packed_field(2, keys, zigzag=False) \
                        + _packed_field(3, vals, zigzag=False)
                    info = _info_bytes(r, strings)
                    if info:
                        msg += _len_field(4, info)
                    msg += _packed_field(8, roles, zigzag=False) \
                        + _packed_field(9, mids, zigzag=True) \
                        + _packed_field(10, mtys, zigzag=False)
                    out += _len_field(4, msg)
                return out
            flush(fh, rgrp)
            total += len(chunk)
    return total


def _delta(vals: list[int]) -> list[int]:
    out = []
    prev = 0
    for v in vals:
        out.append(v - prev)
        prev = v
    return out


def _chunks(it, n: int):
    chunk: list = []
    for row in it:
        chunk.append(row)
        if len(chunk) >= n:
            yield chunk
            chunk = []
    if chunk:
        yield chunk
