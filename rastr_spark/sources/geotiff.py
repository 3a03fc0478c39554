"""Pure-numpy GeoTIFF reader/writer — no GDAL/rasterio.

Implements exactly the subset the reference exercises through rasterio
(reference src/rastr/io_.py:28-74 read, 138-187 write; golden asset
tests/rastr/test_io.py:35-54 ``pga_g_clipped.tif``): classic (non-Big) TIFF,
single image, single band, Compression=1 (none) or 8/32946 (Deflate — stdlib
zlib, the dominant real-world GDAL compression) with Predictor 1/2
(horizontal differencing) / 3 (floating-point), strip OR tile layout, IEEE
float 16/32/64 and integer samples, GeoTIFF georeferencing via
ModelPixelScale+ModelTiepoint (or ModelTransformation), EPSG code from the
GeoKeyDirectory, GDAL_NODATA masking.

Reference semantics replicated:
- integer rasters are cast to float16 so nodata can become NaN (io_.py:64-67)
- ``nodata`` cells read back as NaN (io_.py:69-70); the writer emits
  GDAL_NODATA="nan" for float data (io_.py:161-180 defaults nodata=np.nan)

Struct layout per the public TIFF 6.0 + OGC GeoTIFF 1.1 specifications.
"""

from __future__ import annotations

import struct
import zlib
from pathlib import Path

import numpy as np

# TIFF tag ids
T_WIDTH, T_HEIGHT, T_BITS, T_COMPRESSION, T_PHOTOMETRIC = 256, 257, 258, 259, 262
T_STRIP_OFFSETS, T_SAMPLES_PER_PIXEL, T_ROWS_PER_STRIP, T_STRIP_COUNTS = 273, 277, 278, 279
T_PLANAR, T_PREDICTOR = 284, 317
T_TILE_W, T_TILE_H, T_TILE_OFFSETS, T_TILE_COUNTS = 322, 323, 324, 325
T_SAMPLE_FORMAT = 339
T_MODEL_PIXEL_SCALE, T_MODEL_TIEPOINT, T_MODEL_TRANSFORM = 33550, 33922, 34264
T_GEO_KEYS, T_GEO_DOUBLES, T_GEO_ASCII = 34735, 34736, 34737
T_GDAL_NODATA = 42113

# geokey ids
GK_MODEL_TYPE, GK_RASTER_TYPE, GK_GEOGRAPHIC_CS, GK_PROJECTED_CS = 1024, 1025, 2048, 3072

_FIELD_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8, 11: 4, 12: 8}
_FIELD_FMT = {1: "B", 2: "c", 3: "H", 4: "I", 6: "b", 8: "h", 9: "i", 11: "f", 12: "d"}


class GeoTiffFormatError(ValueError):
    pass


# ---------------------------------------------------------------------------
# TIFF-LZW codec (TIFF 6.0 §13): MSB-first bit packing, ClearCode 256, EOI 257,
# 9→12-bit codes with the TIFF "early change" (width bumps one entry early).
# Pure Python — a driver-side interchange path for modest rasters, like the
# rest of this codec (the distributed format is the parquet tile store).
# ---------------------------------------------------------------------------

_LZW_CLEAR, _LZW_EOI = 256, 257


def _lzw_decode(data: bytes) -> bytes:
    out = bytearray()
    table: list[bytes] = []
    width = 9

    def reset() -> None:
        nonlocal table, width
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9

    reset()
    prev: bytes | None = None
    acc = nbits = i = 0
    n = len(data)
    while True:
        while nbits < width:
            if i >= n:
                return bytes(out)  # stream may omit the trailing EOI
            acc = (acc << 8) | data[i]
            i += 1
            nbits += 8
        code = (acc >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        if code == _LZW_CLEAR:
            reset()
            prev = None
            continue
        if code == _LZW_EOI:
            return bytes(out)
        if prev is None:
            if code >= len(table):
                raise GeoTiffFormatError("corrupt LZW stream (first code out of range)")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise GeoTiffFormatError("corrupt LZW stream (code beyond table)")
        out += entry
        prev = entry
        # early change (TIFF 6.0 §13): the decoder's table lags the encoder's
        # by one entry, so it widens at 510/1022/2046 — one entry before the
        # encoder's 511/1023/2047 switch points
        if len(table) >= (1 << width) - 2 and width < 12:
            width += 1


def _lzw_encode(data: bytes) -> bytes:
    res = bytearray()
    acc = nbits = 0
    width = 9

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            res.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8

    def fresh() -> dict[bytes, int]:
        return {bytes([i]): i for i in range(256)}

    d = fresh()
    next_code = 258
    emit(_LZW_CLEAR)
    w = b""
    for b in data:
        wc = w + bytes([b])
        if wc in d:
            w = wc
            continue
        emit(d[w])
        d[wc] = next_code
        next_code += 1
        if next_code == (1 << width) - 1 and width < 12:
            width += 1  # early change, mirrored by the decoder
        elif next_code == 4094:  # table nearly full → clear and restart
            emit(_LZW_CLEAR)
            d = fresh()
            next_code = 258
            width = 9
        w = bytes([b])
    if w:
        emit(d[w])
        # the decoder adds a table entry for this final code too, and widens
        # BEFORE reading the next symbol when its table hits the early-change
        # boundary — so the width check must run once more or the EOI is
        # written one bit narrower than the decoder reads it (libtiff's
        # LZWPostEncode increments free_ent after the flushed code for the
        # same reason; found by the 8002×2-byte hypothesis example, where the
        # stream ends exactly at the 510-entry boundary)
        next_code += 1
        if next_code == (1 << width) - 1 and width < 12:
            width += 1
    emit(_LZW_EOI)
    if nbits:
        res.append((acc << (8 - nbits)) & 0xFF)
    return bytes(res)


def _read_entries(buf: bytes, bo: str, off: int) -> dict[int, list]:
    (n,) = struct.unpack_from(bo + "H", buf, off)
    tags: dict[int, list] = {}
    for k in range(n):
        e = off + 2 + 12 * k
        tag, typ, cnt = struct.unpack_from(bo + "HHI", buf, e)
        size = _FIELD_SIZE.get(typ, 1) * cnt
        voff = e + 8 if size <= 4 else struct.unpack_from(bo + "I", buf, e + 8)[0]
        if typ == 2:  # ASCII
            tags[tag] = [buf[voff : voff + cnt].split(b"\x00")[0].decode("ascii", "replace")]
        elif typ == 5:  # RATIONAL
            vals = struct.unpack_from(bo + "I" * (2 * cnt), buf, voff)
            tags[tag] = [vals[2 * i] / max(vals[2 * i + 1], 1) for i in range(cnt)]
        else:
            fmt = _FIELD_FMT.get(typ)
            if fmt is None:
                continue
            tags[tag] = list(struct.unpack_from(bo + fmt * cnt, buf, voff))
    return tags


def read_geotiff(path: str | Path) -> tuple[np.ndarray, "object", int | None, float | None]:
    """→ (array[H, W] with nodata→NaN, Affine transform, epsg or None, nodata).

    Integer rasters are cast to float16 (reference io_.py:64-67).
    """
    from ..meta import Affine

    buf = Path(path).read_bytes()
    if buf[:2] == b"II":
        bo = "<"
    elif buf[:2] == b"MM":
        bo = ">"
    else:
        raise GeoTiffFormatError("not a TIFF (bad byte-order mark)")
    magic, ifd_off = struct.unpack_from(bo + "HI", buf, 2)
    if magic == 43:
        raise GeoTiffFormatError("BigTIFF is not supported by the pure-numpy codec")
    if magic != 42:
        raise GeoTiffFormatError(f"bad TIFF magic {magic}")
    tags = _read_entries(buf, bo, ifd_off)

    width = int(tags[T_WIDTH][0])
    height = int(tags[T_HEIGHT][0])
    comp = int(tags.get(T_COMPRESSION, [1])[0])
    if comp not in (1, 5, 8, 32946):  # none / LZW / Adobe Deflate / legacy Deflate
        raise GeoTiffFormatError(
            f"compression {comp} unsupported (pure-numpy codec reads none/lzw/deflate)"
        )
    predictor = int(tags.get(T_PREDICTOR, [1])[0])
    if predictor not in (1, 2, 3) or (predictor != 1 and comp == 1):
        raise GeoTiffFormatError(f"predictor {predictor} unsupported with compression {comp}")
    spp = int(tags.get(T_SAMPLES_PER_PIXEL, [1])[0])
    if spp != 1:
        raise GeoTiffFormatError(f"{spp} samples/pixel unsupported (single-band only)")
    bits = int(tags[T_BITS][0])
    sfmt = int(tags.get(T_SAMPLE_FORMAT, [1])[0])
    kind = {1: "u", 2: "i", 3: "f"}.get(sfmt)
    if kind is None or bits % 8:
        raise GeoTiffFormatError(f"sample format {sfmt}/{bits} bits unsupported")
    # TIFF 6.0 + TechNote 3: predictor 2 (horizontal differencing) is defined
    # for integer samples only, predictor 3 (byte-plane delta) for floating
    # point only — a mismatched file would otherwise decode to silent garbage
    # (the int path truncates floats via astype(int64))
    if predictor == 2 and kind == "f":
        raise GeoTiffFormatError("predictor 2 is invalid for floating-point samples")
    if predictor == 3 and kind != "f":
        raise GeoTiffFormatError("predictor 3 is invalid for integer samples")
    dt = np.dtype(f"{bo}{kind}{bits // 8}")

    def decode_segment(off: int, nbytes: int, seg_h: int, seg_w: int) -> np.ndarray:
        """One strip/tile → (seg_h, seg_w) array: inflate, then undo predictor."""
        if comp == 1:
            return np.frombuffer(buf, dtype=dt, count=seg_h * seg_w, offset=off).reshape(
                seg_h, seg_w
            )
        if comp == 5:
            raw = _lzw_decode(buf[off : off + nbytes])
        else:
            raw = zlib.decompress(buf[off : off + nbytes])
        if predictor == 2:
            # horizontal differencing on sample values: each row is cumsum'd back
            # (modular arithmetic in the native width — matches libtiff's wraparound)
            vals = np.frombuffer(raw, dtype=dt).reshape(seg_h, seg_w)
            return np.cumsum(vals.astype(np.int64), axis=1).astype(dt)
        if predictor == 3:
            # TIFF floating-point predictor: per row, bytes were split into
            # big-endian byte planes (all MSBs first) then delta-encoded;
            # decode = cumsum bytes, de-interleave planes, read as big-endian
            s = dt.itemsize
            rows = np.frombuffer(raw, dtype=np.uint8).reshape(seg_h, seg_w * s)
            acc = np.cumsum(rows.astype(np.int64), axis=1).astype(np.uint8)
            planes = acc.reshape(seg_h, s, seg_w)
            be = np.ascontiguousarray(planes.transpose(0, 2, 1))
            return (
                np.frombuffer(be.tobytes(), dtype=np.dtype(f">f{s}"))
                .reshape(seg_h, seg_w)
                .astype(dt)
            )
        return np.frombuffer(raw, dtype=dt, count=seg_h * seg_w).reshape(seg_h, seg_w)

    arr = np.empty((height, width), dtype=dt)
    if T_TILE_OFFSETS in tags:
        tw, th_ = int(tags[T_TILE_W][0]), int(tags[T_TILE_H][0])
        offs, cnts = tags[T_TILE_OFFSETS], tags[T_TILE_COUNTS]
        tiles_across = (width + tw - 1) // tw
        for ti, (o, c) in enumerate(zip(offs, cnts)):
            tile = decode_segment(int(o), int(c), th_, tw)
            r0 = (ti // tiles_across) * th_
            c0 = (ti % tiles_across) * tw
            h = min(th_, height - r0)
            w = min(tw, width - c0)
            arr[r0 : r0 + h, c0 : c0 + w] = tile[:h, :w]
    else:
        rps = int(tags.get(T_ROWS_PER_STRIP, [height])[0])
        offs, cnts = tags[T_STRIP_OFFSETS], tags[T_STRIP_COUNTS]
        row = 0
        for o, c in zip(offs, cnts):
            h = min(rps, height - row)
            arr[row : row + h, :] = decode_segment(int(o), int(c), h, width)
            row += h

    arr = arr.astype(arr.dtype.newbyteorder("="))
    nodata = None
    if T_GDAL_NODATA in tags:
        txt = tags[T_GDAL_NODATA][0].strip()
        nodata = float("nan") if txt.lower() == "nan" else float(txt)
    if np.issubdtype(arr.dtype, np.integer):
        raw = arr
        arr = arr.astype(np.float16)  # reference io_.py:64-67
        if nodata is not None and not np.isnan(nodata):
            arr[raw == raw.dtype.type(nodata)] = np.nan
    elif nodata is not None and not np.isnan(nodata):
        arr = arr.copy()
        arr[arr == nodata] = np.nan

    if T_MODEL_TRANSFORM in tags:
        m = tags[T_MODEL_TRANSFORM]
        transform = Affine(m[0], m[1], m[3], m[4], m[5], m[7])
    elif T_MODEL_PIXEL_SCALE in tags and T_MODEL_TIEPOINT in tags:
        sx, sy = tags[T_MODEL_PIXEL_SCALE][0], tags[T_MODEL_PIXEL_SCALE][1]
        tp = tags[T_MODEL_TIEPOINT]
        i, j, x, y = tp[0], tp[1], tp[3], tp[4]
        # raster (i, j) maps to world (x, y): north-up, y decreasing with row
        transform = Affine(sx, 0.0, x - i * sx, 0.0, -sy, y + j * sy)
    else:
        raise GeoTiffFormatError("no GeoTIFF georeferencing tags")

    epsg = None
    if T_GEO_KEYS in tags:
        keys = tags[T_GEO_KEYS]
        # directory: (version, rev, minor, n_keys) then 4-short entries
        n_keys = int(keys[3])
        kv = {}
        for k in range(n_keys):
            key_id, loc, cnt, val = keys[4 + 4 * k : 8 + 4 * k]
            if loc == 0:
                kv[int(key_id)] = int(val)
        epsg = kv.get(GK_PROJECTED_CS) or kv.get(GK_GEOGRAPHIC_CS)
        if epsg in (32767, 0):
            epsg = None
    return arr, transform, epsg, nodata


def _entry(bo, tag, typ, values, extra, extra_base):
    """Serialize one IFD entry; out-of-line payloads append to ``extra``."""
    fmt = _FIELD_FMT[typ]
    if typ == 2:
        payload = values  # already bytes, NUL-terminated
        cnt = len(payload)
    else:
        cnt = len(values)
        payload = struct.pack(bo + fmt * cnt, *values)
    if len(payload) <= 4:
        return struct.pack(bo + "HHI", tag, typ, cnt) + payload.ljust(4, b"\x00")
    off = extra_base + len(extra)
    if off % 2:  # TIFF offsets must be word-aligned
        extra.extend(b"\x00")
        off += 1
    extra.extend(payload)
    return struct.pack(bo + "HHI", tag, typ, cnt) + struct.pack(bo + "I", off)


def write_geotiff(
    path: str | Path,
    arr: np.ndarray,
    transform,
    crs: str,
    *,
    nodata: float | None = None,
    compression: str = "none",
    predictor: int = 1,
) -> None:
    """Write a single-band little-endian GeoTIFF.

    ``transform`` must be axis-aligned (b == d == 0) — ModelPixelScale+Tiepoint
    cannot express rotation. Float data: NaN is the nodata convention
    (GDAL_NODATA="nan", reference write default io_.py:167); pass ``nodata``
    to substitute a sentinel first (io_.py:162-165).

    ``compression``: "none" (default) or "deflate" (zlib, tag 8 — the dominant
    real-world GDAL setting). ``predictor``: 1 (none) or 3 (floating-point
    byte-plane differencing; deflate only) — predictor 3 typically halves
    deflate output on smooth float rasters.
    """
    arr = np.asarray(arr)
    if arr.ndim != 2:
        raise GeoTiffFormatError("single-band 2-D arrays only")
    if transform.b != 0 or transform.d != 0:
        raise GeoTiffFormatError("rotated transforms cannot be written as GeoTIFF scale/tiepoint")
    if not np.issubdtype(arr.dtype, np.floating):
        raise GeoTiffFormatError("writer emits float rasters (cast first)")
    if nodata is not None:
        arr = np.where(np.isnan(arr), arr.dtype.type(nodata), arr)
    crs_s = str(crs).upper()
    if not crs_s.startswith("EPSG:"):
        raise GeoTiffFormatError(f"only EPSG CRS strings are writable (got {crs!r})")
    epsg = int(crs_s.split(":")[1])

    if compression not in ("none", "deflate", "lzw"):
        raise GeoTiffFormatError(f"compression {compression!r} unsupported (none/deflate/lzw)")
    if predictor not in (1, 3) or (predictor == 3 and compression == "none"):
        raise GeoTiffFormatError("predictor must be 1, or 3 with deflate/lzw")

    bo = "<"
    h, w = arr.shape
    le = np.ascontiguousarray(arr, dtype=arr.dtype.newbyteorder("<"))
    if predictor == 3:
        # fp predictor encode (inverse of the reader): per row, big-endian byte
        # planes (MSB plane first), then horizontal byte differencing
        s = arr.dtype.itemsize
        be = np.ascontiguousarray(le, dtype=arr.dtype.newbyteorder(">"))
        planes = (
            np.frombuffer(be.tobytes(), dtype=np.uint8)
            .reshape(h, w, s)
            .transpose(0, 2, 1)
            .reshape(h, w * s)
        )
        diffed = planes.astype(np.int16)
        diffed[:, 1:] -= planes[:, :-1].astype(np.int16)
        data = diffed.astype(np.uint8).tobytes()
    else:
        data = le.tobytes()
    if compression == "deflate":
        data = zlib.compress(data, 6)
    elif compression == "lzw":
        data = _lzw_encode(data)
    bits = arr.dtype.itemsize * 8
    # geographic CRS codes live in 4000-4999 (EPSG geodetic range); everything
    # else is written as a projected CS — both keys are honored by the reader
    geographic = 4000 <= epsg <= 4999
    geo_keys = [
        1, 1, 0, 3,
        GK_MODEL_TYPE, 0, 1, (2 if geographic else 1),
        GK_RASTER_TYPE, 0, 1, 1,  # RasterPixelIsArea
        (GK_GEOGRAPHIC_CS if geographic else GK_PROJECTED_CS), 0, 1, epsg,
    ]
    t = transform
    tags = [
        # width/height as LONG: SHORT caps at 65535 and large rasters overflow
        (T_WIDTH, 4, [w]),
        (T_HEIGHT, 4, [h]),
        (T_BITS, 3, [bits]),
        (T_COMPRESSION, 3, [{"none": 1, "lzw": 5, "deflate": 8}[compression]]),
        (T_PHOTOMETRIC, 3, [1]),  # BlackIsZero
        (T_STRIP_OFFSETS, 4, None),  # patched below
        (T_SAMPLES_PER_PIXEL, 3, [1]),
        # LONG (type 4), value = full height: ONE strip stays self-consistent at
        # any raster height (a SHORT tag capped at 65535 would silently truncate
        # the read-back of taller rasters to the first 65535 rows)
        (T_ROWS_PER_STRIP, 4, [h]),
        (T_STRIP_COUNTS, 4, [len(data)]),
        (T_PLANAR, 3, [1]),
        (T_SAMPLE_FORMAT, 3, [3]),
        (T_MODEL_PIXEL_SCALE, 12, [abs(t.a), abs(t.e), 0.0]),
        (T_MODEL_TIEPOINT, 12, [0.0, 0.0, 0.0, t.c, t.f, 0.0]),
        (T_GEO_KEYS, 3, geo_keys),
        (T_GDAL_NODATA, 2, (f"{nodata}" if nodata is not None else "nan").encode() + b"\x00"),
    ]
    if predictor != 1:
        tags.append((T_PREDICTOR, 3, [predictor]))
    tags.sort(key=lambda x: x[0])

    n = len(tags)
    ifd_off = 8
    entries_end = ifd_off + 2 + 12 * n + 4
    extra = bytearray()
    # first pass to size the out-of-line area (strip offset unknown yet → 0)
    placeholder = [
        _entry(bo, tag, typ, ([0] if vals is None else vals), extra, entries_end)
        for tag, typ, vals in tags
    ]
    data_off = entries_end + len(extra)
    if data_off % 2:
        data_off += 1
    # second pass with the real strip offset (extra is rebuilt identically)
    extra = bytearray()
    entries = b"".join(
        _entry(bo, tag, typ, ([data_off] if vals is None else vals), extra, entries_end)
        for tag, typ, vals in tags
    )
    out = bytearray()
    out += struct.pack(bo + "2sHI", b"II", 42, ifd_off)
    out += struct.pack(bo + "H", n) + entries + struct.pack(bo + "I", 0)
    out += bytes(extra)
    out += b"\x00" * (data_off - len(out))
    out += data
    Path(path).write_bytes(bytes(out))
