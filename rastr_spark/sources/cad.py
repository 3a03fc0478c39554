"""Minimal pure-Python DXF (CAD) reader — no geopandas/GDAL.

Clean-room implementation of the subset the reference exposes through
``geopandas.read_file`` (reference src/rastr/io_.py:190-249 ``read_cad_gdf``):
parse the ENTITIES section of an ASCII DXF into the engine's GeoDataFrame
equivalent — a pandas DataFrame with a ``geometry`` column of
:class:`rastr_spark.geometry.Geometry` objects, a per-vertex ``z`` array
column (CAD surfaces are 3-D; ``rasterize_z_gdf`` consumes the z's), and the
source ``layer``. CRS handling mirrors the reference exactly: DXF carries no
CRS, so one must be provided or a ValueError is raised with the same message
shape (io_.py:236-241).

Entity support (the surface/linework subset a raster pipeline consumes):
- POINT         → point            (codes 10/20/30)
- LINE          → linestring       (10/20/30 → 11/21/31)
- LWPOLYLINE    → linestring, or polygon when the closed flag (70 & 1) is set;
                  constant elevation from code 38
- POLYLINE/VERTEX/SEQEND → 3-D polyline (per-vertex z), closed via 70 & 1
- 3DFACE        → polygon over corner codes 10..13 / 20..23 / 30..33

DXF is a sequence of (group-code, value) line pairs — the format is public
(Autodesk DXF reference); only the ASCII variant is supported.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pandas as pd

from ..geometry import Geometry


def _pairs(text: str):
    lines = text.splitlines()
    for i in range(0, len(lines) - 1, 2):
        try:
            code = int(lines[i].strip())
        except ValueError as e:
            raise ValueError(f"malformed DXF at line {i + 1}: {lines[i]!r}") from e
        yield code, lines[i + 1].strip()


def _ring_and_zs(xy: list, zs: list) -> tuple[list, list]:
    """Close a ring, duplicating the first z when the closing vertex is added."""
    if xy[0] != xy[-1]:
        return xy + [xy[0]], zs + [zs[0]]
    return xy, zs


class _Entity(dict):
    pass


def read_cad_gdf(path: str | Path, crs: str | None = None) -> pd.DataFrame:
    """DXF → DataFrame(geometry: Geometry, z: array, layer: str); ``.attrs['crs']``.

    Raises ValueError when no CRS is provided (DXF files carry none), matching
    the reference's contract (io_.py:236-241).

    Limitation (documented, deliberate): the reference can RE-project a CAD
    layer to a different CRS via geopandas/pyproj ``to_crs`` (io_.py:236-249);
    no pyproj exists in this environment, so the ``crs`` argument here only
    LABELS the coordinates — callers must supply geometry already expressed in
    that CRS. Reprojection would require a full datum/projection library and
    is out of scope for the clean-room reader.
    """
    path = Path(path)
    if crs is None:
        raise ValueError(
            f"No CRS found in CAD file {path} and no CRS provided. "
            "Please provide a CRS parameter."
        )
    rows: list[tuple] = []

    def flush(e: _Entity | None) -> None:
        if not e:
            return
        kind = e["type"]
        layer = e.get("layer", "0")
        if kind == "POINT" and "x" in e:
            rows.append(
                (Geometry.point(e["x"], e.get("y", 0.0)), np.array([e.get("z", 0.0)]), layer)
            )
        elif kind == "LINE" and "x" in e and "x2" in e:
            g = Geometry.linestring([(e["x"], e.get("y", 0.0)), (e["x2"], e.get("y2", 0.0))])
            rows.append((g, np.array([e.get("z", 0.0), e.get("z2", 0.0)]), layer))
        elif kind in ("LWPOLYLINE", "POLYLINE") and len(e.get("verts", [])) >= 2:
            xy = [(vx, vy) for vx, vy, _ in e["verts"]]
            zs = [vz for _, _, vz in e["verts"]]
            if kind == "LWPOLYLINE" and "elevation" in e:
                zs = [e["elevation"]] * len(xy)
            if int(e.get("flags", 0)) & 1 and len(xy) >= 3:
                ring, rzs = _ring_and_zs(xy, zs)
                rows.append((Geometry.polygon(ring), np.asarray(rzs, dtype=np.float64), layer))
            else:
                rows.append((Geometry.linestring(xy), np.asarray(zs, dtype=np.float64), layer))
        elif kind == "3DFACE" and all(k in e for k in ("x", "x2", "x3")):
            xy = [(e["x"], e.get("y", 0.0)), (e["x2"], e.get("y2", 0.0)), (e["x3"], e.get("y3", 0.0))]
            zs = [e.get("z", 0.0), e.get("z2", 0.0), e.get("z3", 0.0)]
            if "x4" in e and (e["x4"], e.get("y4", 0.0)) != xy[2]:
                xy.append((e["x4"], e.get("y4", 0.0)))
                zs.append(e.get("z4", 0.0))
            ring, rzs = _ring_and_zs(xy, zs)
            rows.append((Geometry.polygon(ring), np.asarray(rzs, dtype=np.float64), layer))

    def commit_vertex(v: _Entity | None, parent: _Entity | None) -> None:
        if v is not None and v.get("type") == "VERTEX" and "x" in v and parent is not None:
            parent["verts"].append((v["x"], v.get("y", 0.0), v.get("z", 0.0)))

    in_entities = False
    ent: _Entity | None = None
    poly_parent: _Entity | None = None  # open POLYLINE collecting VERTEX children

    # (group code → entity key) for simple scalar coordinates
    scalar = {
        10: "x", 20: "y", 30: "z",
        11: "x2", 21: "y2", 31: "z2",
        12: "x3", 22: "y3", 32: "z3",
        13: "x4", 23: "y4", 33: "z4",
    }

    for code, val in _pairs(path.read_text()):
        if code == 2 and val == "ENTITIES":
            in_entities = True
            continue
        if not in_entities:
            continue
        if code == 0:
            if val == "VERTEX" and poly_parent is not None:
                commit_vertex(ent, poly_parent)
                ent = _Entity(type="VERTEX")
            elif val == "SEQEND" and poly_parent is not None:
                commit_vertex(ent, poly_parent)
                flush(poly_parent)
                ent, poly_parent = None, None
            else:
                if poly_parent is not None:  # POLYLINE without SEQEND (lenient)
                    commit_vertex(ent, poly_parent)
                    flush(poly_parent)
                    poly_parent = None
                elif ent is not None:
                    flush(ent)
                ent = None
                if val == "ENDSEC":
                    in_entities = False
                    continue
                ent = _Entity(type=val)
                if val == "POLYLINE":
                    ent["verts"] = []
                    poly_parent = ent
            continue
        if ent is None:
            continue
        if code == 8:
            ent["layer"] = val
        elif code == 70:
            ent["flags"] = int(float(val))
        elif code == 38:
            ent["elevation"] = float(val)
        elif code == 10 and ent["type"] == "LWPOLYLINE":
            ent.setdefault("verts", []).append((float(val), 0.0, 0.0))
        elif code == 20 and ent["type"] == "LWPOLYLINE" and ent.get("verts"):
            v = ent["verts"][-1]
            ent["verts"][-1] = (v[0], float(val), v[2])
        elif code in scalar:
            ent[scalar[code]] = float(val)

    gdf = pd.DataFrame(
        {
            "geometry": [r[0] for r in rows],
            "z": [r[1] for r in rows],
            "layer": [r[2] for r in rows],
        }
    )
    gdf.attrs["crs"] = crs
    return gdf
