"""DXF reader tests (sources/cad.py) — hand-written ASCII DXF fixtures, the
reference's CRS contract (io_.py:236-241), and end-to-end rasterize_z_gdf."""

import numpy as np
import pytest

from rastr_spark.sources.cad import read_cad_gdf

DXF = """0
SECTION
2
HEADER
0
ENDSEC
0
SECTION
2
ENTITIES
0
LINE
8
roads
10
0.0
20
0.0
30
1.0
11
5.0
21
5.0
31
2.0
0
LWPOLYLINE
8
parcels
90
3
70
1
38
4.0
10
0.0
20
0.0
10
10.0
20
0.0
10
10.0
20
10.0
0
LWPOLYLINE
8
contours
90
2
10
1.0
20
1.0
10
2.0
20
3.0
0
POLYLINE
8
surface
70
1
0
VERTEX
10
0.0
20
0.0
30
10.0
0
VERTEX
10
4.0
20
0.0
30
20.0
0
VERTEX
10
0.0
20
4.0
30
30.0
0
SEQEND
0
POINT
8
spot
10
1.5
20
2.5
30
7.0
0
3DFACE
8
tin
10
0.0
20
0.0
30
1.0
11
2.0
21
0.0
31
2.0
12
0.0
22
2.0
32
3.0
13
0.0
23
2.0
33
3.0
0
ENDSEC
0
EOF
"""


@pytest.fixture()
def dxf_path(tmp_path):
    p = tmp_path / "site.dxf"
    p.write_text(DXF)
    return p


class TestReadCadGdf:
    def test_missing_crs_raises_reference_contract(self, dxf_path):
        with pytest.raises(ValueError, match="No CRS found in CAD file"):
            read_cad_gdf(dxf_path)

    def test_entities_parsed(self, dxf_path):
        gdf = read_cad_gdf(dxf_path, crs="EPSG:2193")
        assert gdf.attrs["crs"] == "EPSG:2193"
        assert list(gdf.columns) == ["geometry", "z", "layer"]
        by_layer = {r.layer: r for r in gdf.itertuples()}
        assert set(by_layer) == {"roads", "parcels", "contours", "surface", "spot", "tin"}

        line = by_layer["roads"]
        assert line.geometry.kind == "linestring"
        np.testing.assert_array_equal(line.geometry.xy, [[0, 0], [5, 5]])
        np.testing.assert_array_equal(line.z, [1.0, 2.0])

        closed = by_layer["parcels"].geometry
        assert closed.kind == "polygon"
        np.testing.assert_array_equal(by_layer["parcels"].z, [4.0] * 4)

        open_pl = by_layer["contours"].geometry
        assert open_pl.kind == "linestring"
        np.testing.assert_array_equal(open_pl.xy, [[1, 1], [2, 3]])

        surf = by_layer["surface"]
        assert surf.geometry.kind == "polygon"
        np.testing.assert_array_equal(surf.z, [10.0, 20.0, 30.0, 10.0])

        pt = by_layer["spot"]
        assert pt.geometry.kind == "point"
        np.testing.assert_array_equal(pt.z, [7.0])

        tin = by_layer["tin"]
        assert tin.geometry.kind == "polygon"
        np.testing.assert_array_equal(tin.z, [1.0, 2.0, 3.0, 1.0])  # tri face closed

    def test_point_in_parsed_polygon(self, dxf_path):
        from rastr_spark.geometry import points_in_geometry

        gdf = read_cad_gdf(dxf_path, crs="EPSG:2193")
        parcels = next(r for r in gdf.itertuples() if r.layer == "parcels").geometry
        inside = points_in_geometry(np.array([5.0, -1.0]), np.array([2.0, -1.0]), parcels)
        assert inside.tolist() == [True, False]

    def test_rasterize_z_end_to_end(self, spark, dxf_path):
        # the reference's stated use: CAD surface → rasterize_z_gdf
        from rastr_spark.operators.rasterize import rasterize_z_gdf

        gdf = read_cad_gdf(dxf_path, crs="EPSG:2193")
        surf = next(r for r in gdf.itertuples() if r.layer == "surface")
        rf = rasterize_z_gdf(
            spark, [surf.geometry], [surf.z], cell_size=1.0, crs="EPSG:2193",
            agg="mean", tile_size=8,
        )
        arr = rf.to_numpy()
        finite = arr[np.isfinite(arr)]
        assert finite.size > 0
        assert finite.min() >= 10.0 - 1e-9 and finite.max() <= 30.0 + 1e-9

    def test_malformed_raises(self, tmp_path):
        p = tmp_path / "bad.dxf"
        p.write_text("not\na\ndxf\nfile\nzzz\n")
        with pytest.raises(ValueError, match="malformed DXF"):
            read_cad_gdf(p, crs="EPSG:2193")
