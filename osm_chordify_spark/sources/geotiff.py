"""GeoTIFF raster sink/source — from-scratch TIFF 6.0 writer/reader.

Interchange for the tiled raster model (operators/raster.py) without
GDAL/rasterio: a single-band float64 TILED GeoTIFF whose TIFF tiles map
1:1 onto the engine's Spark tiles — the on-disk layout IS the
distribution layout.  Uncompressed, little-endian, with the two GeoTIFF
georeferencing tags every reader honors (ModelPixelScale +
ModelTiepoint) and a minimal GeoKeyDirectory.

Wire layout (public TIFF 6.0 spec + GeoTIFF 1.1):

    header  "II" 42, IFD offset
    IFD     n × 12-byte entries (tag, type, count, value/offset)
    tags    256/257 size, 258 BitsPerSample=64, 259 Compression=1,
            262 Photometric=1, 277 SamplesPerPixel=1, 322/323 tile size,
            324 TileOffsets, 325 TileByteCounts, 339 SampleFormat=3,
            33550 ModelPixelScale, 33922 ModelTiepoint,
            34735 GeoKeyDirectory

Spark-first shape (the PBF sink's pattern): tile payloads are encoded
DISTRIBUTED (one mapInPandas pass flips + serializes each tile's
float64 block), the driver streams them to the file in deterministic
order while recording offsets, then writes the IFD.  Absent tiles all
share the offset of ONE zero tile — TIFF permits duplicate tile
offsets, so sparse rasters stay sparse on disk.  Reading mirrors PBF:
the tiny IFD parses driver-side, tile (offset, count) pairs distribute,
and executors seek-read + decode their tiles in parallel (tiled TIFF is
splittable per tile, which is the whole point of writing tiled)."""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from osm_chordify_spark.operators.raster import (
    TILE_SCHEMA_FIELDS,
    GridSpec,
)

_II = b"II"
_MAGIC = 42
_MAGIC_BIG = 43  # BigTIFF: 64-bit offsets, 20-byte IFD entries
_TAG_TYPES = {"SHORT": 3, "LONG": 4, "DOUBLE": 12, "LONG8": 16}


def _entry(tag: int, typ: str, count: int, value_or_off: int) -> bytes:
    return struct.pack("<HHII", tag, _TAG_TYPES[typ], count, value_or_off)


def _entry8(tag: int, typ: str, count: int, value_or_off: int) -> bytes:
    return struct.pack("<HHQQ", tag, _TAG_TYPES[typ], count, value_or_off)


def save_geotiff(
    tiles: DataFrame, grid: GridSpec, path: str, bigtiff: bool | None = None
) -> str:
    """Write the raster as a tiled single-band float64 GeoTIFF.

    The image extent is the bounding box of present tiles; absent tiles
    inside it are zero (they share one zero tile's offset on disk).
    TIFF rows run top-down, so tile rows and in-tile rows are flipped
    from the grid's bottom-up cy axis.

    ``bigtiff`` None (default) auto-selects: classic TIFF below the
    4 GiB uint32-offset ceiling, BigTIFF (magic 43, 64-bit offsets)
    above it — so lake-scale rasters export without a guard."""
    # one materialization: the key collect AND the payload iteration both
    # read the persisted tiles instead of re-running the upstream lineage
    from pyspark import StorageLevel

    tiles = tiles.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        return _save_geotiff_persisted(tiles, grid, path, bigtiff)
    finally:
        tiles.unpersist()


def _save_geotiff_persisted(
    tiles: DataFrame, grid: GridSpec, path: str, bigtiff: bool | None
) -> str:
    T = grid.tile
    idx = [
        (int(r.tile_x), int(r.tile_y))
        for r in tiles.select("tile_x", "tile_y").collect()
    ]
    if not idx:
        raise ValueError("empty raster: nothing to write")
    txs = [t[0] for t in idx]
    tys = [t[1] for t in idx]
    tx0, tx1 = min(txs), max(txs)
    ty0, ty1 = min(tys), max(tys)
    ntx = tx1 - tx0 + 1
    nty = ty1 - ty0 + 1
    width, height = ntx * T, nty * T
    tile_bytes = T * T * 8
    est = (len(idx) + 1) * tile_bytes + (ntx * nty) * 16 + 4096
    big = bool(bigtiff) if bigtiff is not None else est >= (1 << 32) - (1 << 20)
    if not big and est >= (1 << 32):
        raise ValueError(
            f"raster needs ~{est / 2**30:.1f} GiB — beyond classic TIFF's "
            "4 GiB uint32 offsets; pass bigtiff=True (or leave it None)"
        )

    def encode(batches):
        for pdf in batches:
            rows = []
            for tx, ty, data in zip(pdf["tile_x"], pdf["tile_y"], pdf["data"]):
                a = np.asarray(data, dtype="<f8").reshape(T, T)
                # grid cy increases upward; TIFF rows run top-down
                rows.append((int(tx), int(ty), a[::-1, :].tobytes()))
            if rows:
                yield pd.DataFrame(rows, columns=["tile_x", "tile_y", "payload"])

    payloads = tiles.mapInPandas(
        encode, schema="tile_x long, tile_y long, payload binary"
    )

    # --- stream payloads, recording offsets --------------------------------
    offsets = {}
    zero_off = None
    with open(path, "wb") as fh:
        if big:
            fh.write(_II + struct.pack("<H", _MAGIC_BIG)
                     + struct.pack("<HH", 8, 0) + struct.pack("<Q", 0))
        else:
            fh.write(_II + struct.pack("<H", _MAGIC) + struct.pack("<I", 0))
        zero_off = fh.tell()
        fh.write(b"\x00" * tile_bytes)  # the shared empty tile
        for row in payloads.toLocalIterator():
            offsets[(int(row.tile_x), int(row.tile_y))] = fh.tell()
            fh.write(bytes(row.payload))

        # tile order: row-major from the TOP-left tile
        tile_offsets = []
        for tr in range(nty):  # TIFF tile row 0 = highest ty
            ty = ty1 - tr
            for tx in range(tx0, tx1 + 1):
                tile_offsets.append(offsets.get((tx, ty), zero_off))
        n_tiles = len(tile_offsets)

        # --- out-of-line arrays -------------------------------------------
        ofmt = "Q" if big else "I"
        off_tileoffs = fh.tell()
        fh.write(struct.pack(f"<{n_tiles}{ofmt}", *tile_offsets))
        off_counts = fh.tell()
        fh.write(struct.pack(f"<{n_tiles}{ofmt}", *([tile_bytes] * n_tiles)))
        # georeferencing: pixel scale + tiepoint at the image's TOP-left
        off_scale = fh.tell()
        fh.write(struct.pack("<3d", grid.dx, grid.dy, 0.0))
        off_tie = fh.tell()
        top_left_x = grid.x0 + tx0 * T * grid.dx
        top_left_y = grid.y0 + (ty1 + 1) * T * grid.dy
        fh.write(struct.pack("<6d", 0.0, 0.0, 0.0, top_left_x, top_left_y, 0.0))
        off_geokeys = fh.tell()
        # minimal GeoKeyDirectory: version 1.1.0, 1 key:
        # GTModelTypeGeoKey(1024) = 2 (geographic lat/lon)
        fh.write(struct.pack("<8H", 1, 1, 0, 1, 1024, 0, 1, 2))

        # --- IFD ----------------------------------------------------------
        # TIFF: a value fitting the entry's value field (4 bytes classic,
        # 8 BigTIFF) is stored INLINE, never as an offset — for
        # n_tiles == 1 the tile offset / byte count themselves go inline
        ifd_off = fh.tell()
        mk = _entry8 if big else _entry
        otyp = "LONG8" if big else "LONG"
        entries = [
            mk(256, "LONG", 1, width),
            mk(257, "LONG", 1, height),
            mk(258, "SHORT", 1, 64),
            mk(259, "SHORT", 1, 1),       # no compression
            mk(262, "SHORT", 1, 1),       # BlackIsZero
            mk(277, "SHORT", 1, 1),
            mk(322, "LONG", 1, T),
            mk(323, "LONG", 1, T),
            mk(324, otyp, n_tiles,
               tile_offsets[0] if n_tiles == 1 else off_tileoffs),
            mk(325, otyp, n_tiles,
               tile_bytes if n_tiles == 1 else off_counts),
            mk(339, "SHORT", 1, 3),       # IEEE float samples
            mk(33550, "DOUBLE", 3, off_scale),
            mk(33922, "DOUBLE", 6, off_tie),
            mk(34735, "SHORT", 8, off_geokeys),
        ]
        if big:
            fh.write(struct.pack("<Q", len(entries)))
            fh.write(b"".join(entries))
            fh.write(struct.pack("<Q", 0))
            fh.seek(8)
            fh.write(struct.pack("<Q", ifd_off))
        else:
            fh.write(struct.pack("<H", len(entries)))
            fh.write(b"".join(entries))
            fh.write(struct.pack("<I", 0))
            fh.seek(4)
            fh.write(struct.pack("<I", ifd_off))
    return str(path)


def _parse_ifd(path: str) -> dict:
    with open(path, "rb") as fh:
        head = fh.read(16)
        if head[:2] != _II:
            raise ValueError("not a little-endian TIFF")
        magic = struct.unpack("<H", head[2:4])[0]
        if magic == _MAGIC:
            big = False
            (ifd_off,) = struct.unpack("<I", head[4:8])
        elif magic == _MAGIC_BIG:
            big = True
            (ifd_off,) = struct.unpack("<Q", head[8:16])
        else:
            raise ValueError(f"unknown TIFF magic {magic}")
        fh.seek(ifd_off)
        if big:
            (n,) = struct.unpack("<Q", fh.read(8))
        else:
            (n,) = struct.unpack("<H", fh.read(2))
        tags = {}
        for _ in range(n):
            if big:
                tag, typ, count, val = struct.unpack("<HHQQ", fh.read(20))
            else:
                tag, typ, count, val = struct.unpack("<HHII", fh.read(12))
            tags[tag] = (typ, count, val)
        inline_cap = 8 if big else 4

        def arr(tag, fmt, size):
            typ, count, val = tags[tag]
            if typ == _TAG_TYPES["LONG8"]:
                fmt, size = "Q", 8
            if count * size <= inline_cap:
                return [val]
            fh.seek(val)
            return list(struct.unpack(f"<{count}{fmt}", fh.read(count * size)))

        out = {
            "width": tags[256][2],
            "height": tags[257][2],
            "tile_w": tags[322][2],
            "tile_h": tags[323][2],
            "offsets": arr(324, "I", 4),
            "counts": arr(325, "I", 4),
            "scale": arr(33550, "d", 8),
            "tiepoint": arr(33922, "d", 8),
        }
        if tags[258][2] != 64 or tags[339][2] != 3 or tags[259][2] != 1:
            raise ValueError("only uncompressed float64 single-band supported")
        return out


def read_geotiff(spark: SparkSession, path: str, drop_empty: bool = True):
    """GeoTIFF → (tiles DataFrame, GridSpec).  The IFD parses
    driver-side; tile decoding distributes (each task seeks into the
    shared file), mirroring the PBF reader."""
    meta = _parse_ifd(path)
    T = meta["tile_w"]
    if meta["tile_h"] != T:
        raise ValueError("non-square tiles unsupported")
    if meta["width"] % T or meta["height"] % T:
        # TIFF permits partial edge tiles (tile count is ceil-based);
        # this reader's tile grid is floor-based, so such a file would
        # be silently misindexed — refuse loudly instead
        raise ValueError(
            f"unsupported: image dims {meta['width']}x{meta['height']} are "
            f"not a multiple of the tile size {T} (partial edge tiles)"
        )
    dx, dy = meta["scale"][0], meta["scale"][1]
    tlx, tly = meta["tiepoint"][3], meta["tiepoint"][4]
    ntx = meta["width"] // T
    nty = meta["height"] // T
    # reconstruct a grid anchored so the file's top-left tile is (0, nty-1)
    grid = GridSpec(x0=tlx, y0=tly - nty * T * dy, dx=dx, dy=dy, tile=T)

    items = [
        (i, int(off), int(cnt))
        for i, (off, cnt) in enumerate(zip(meta["offsets"], meta["counts"]))
    ]
    bdf = spark.createDataFrame(
        pd.DataFrame(items, columns=["i", "off", "cnt"])
    ).repartition(min(len(items), 64))

    out_schema = StructType(TILE_SCHEMA_FIELDS)

    def decode(batches):
        with open(path, "rb") as fh:
            for pdf in batches:
                rows = []
                for i, off, cnt in zip(pdf["i"], pdf["off"], pdf["cnt"]):
                    fh.seek(int(off))
                    a = np.frombuffer(fh.read(int(cnt)), dtype="<f8").reshape(T, T)
                    if drop_empty and not a.any():
                        continue
                    tr, tc = divmod(int(i), ntx)
                    rows.append((tc, (nty - 1) - tr, a[::-1, :].ravel()))
                if rows:
                    yield pd.DataFrame(rows, columns=["tile_x", "tile_y", "data"])

    return bdf.mapInPandas(decode, schema=out_schema), grid
