"""Core data-model tests: tile round-trip, morton index, meta/affine, geometry kernels."""

import numpy as np
import pytest

from rastr_spark.geometry import Geometry, catmull_rom_smooth, distance_to_geometry, points_in_geometry, segmentize_line
from rastr_spark.grid import k_ring, morton_decode, morton_encode, point_grid, point_grid_shape
from rastr_spark.meta import Affine, Bounds, RasterMeta
from rastr_spark.tiles import RasterFrame


class TestAffine:
    def test_forward_inverse_roundtrip(self):
        t = Affine(10, 0, 5, 0, -10, 100)
        cols = np.array([0.5, 1.5, 3.0])
        rows = np.array([0.5, 2.5, 1.0])
        x, y = t.forward(cols, rows)
        c2, r2 = t.inverse(x, y)
        np.testing.assert_allclose(c2, cols)
        np.testing.assert_allclose(r2, rows)

    def test_mul_identity(self):
        t = Affine(2, 0, 3, 0, -2, 7)
        i = Affine(1, 0, 0, 0, 1, 0)
        assert t * i == t

    def test_bounds_neg_e(self):
        # reference bounds ≡ rasterio array_bounds (src/rastr/raster.py:549-553)
        meta = RasterMeta(10.0, "EPSG:2193", Affine(10, 0, 0, 0, -10, 100), 4, 4, tile_size=2)
        assert meta.bounds() == Bounds(0.0, 60.0, 40.0, 100.0)

    def test_cell_centres(self):
        meta = RasterMeta(2.0, "EPSG:2193", Affine(2, 0, 0, 0, 2, 0), 2, 2, tile_size=2)
        x, y = meta.cell_centres(np.array([0]), np.array([0]))
        assert (x[0], y[0]) == (1.0, 1.0)


class TestMorton:
    def test_roundtrip(self):
        r = np.array([0, 1, 5, 1000, 12345])
        c = np.array([0, 2, 5, 999, 54321])
        z = morton_encode(r, c)
        r2, c2 = morton_decode(z)
        np.testing.assert_array_equal(r, r2)
        np.testing.assert_array_equal(c, c2)

    def test_locality(self):
        # adjacent cells share high bits at coarse levels
        z1 = morton_encode(np.array([4]), np.array([4]))[0]
        z2 = morton_encode(np.array([5]), np.array([5]))[0]
        assert z1 >> 4 == z2 >> 4

    def test_k_ring(self):
        center = int(morton_encode(np.array([3]), np.array([3]))[0])
        ring = set(k_ring(center, 1).tolist())
        assert len(ring) == 9
        assert center in ring


class TestTilesRoundtrip:
    @pytest.mark.parametrize("shape,tsz", [((2, 2), 2), ((3, 3), 2), ((5, 7), 3), ((1, 9), 4)])
    def test_from_to_numpy(self, spark, shape, tsz):
        rng = np.random.RandomState(7)
        arr = rng.rand(*shape)
        arr[0, 0] = np.nan
        meta = RasterMeta(1.0, "EPSG:2193", Affine(1, 0, 0, 0, -1, shape[0]), *shape, tile_size=tsz)
        rf = RasterFrame.from_numpy(spark, arr, meta)
        np.testing.assert_array_equal(rf.to_numpy(), arr)

    def test_cells_explode(self, spark):
        arr = np.array([[1.0, 2.0], [3.0, np.nan]])
        meta = RasterMeta(1.0, "EPSG:2193", Affine(1, 0, 0, 0, -1, 2), 2, 2, tile_size=2)
        rf = RasterFrame.from_numpy(spark, arr, meta)
        rows = {(r["row"], r["col"]): r["value"] for r in rf.cells().collect()}
        assert rows[(0, 0)] == 1.0 and rows[(1, 0)] == 3.0
        assert np.isnan(rows[(1, 1)])
        assert len(rf.cells(drop_nan=True).collect()) == 3

    def test_from_cells_dense(self, spark):
        meta = RasterMeta(1.0, "EPSG:2193", Affine(1, 0, 0, 0, -1, 4), 4, 4, tile_size=2)
        cells = spark.createDataFrame([(0, 0, 5.0), (3, 3, 7.0)], "row int, col int, value double")
        rf = RasterFrame.from_cells(cells, meta)
        out = rf.to_numpy()
        assert out[0, 0] == 5.0 and out[3, 3] == 7.0
        assert np.isnan(out).sum() == 14

    def test_full_and_example(self, spark):
        meta = RasterMeta(2.0, "EPSG:2193", Affine(2, 0, 0, 0, 2, 0), 5, 5, tile_size=2)
        rf = RasterFrame.full(spark, meta, 3.5)
        out = rf.to_numpy()
        assert out.shape == (5, 5) and (out == 3.5).all()
        ex = RasterFrame.example(spark)
        assert ex.meta.shape == (256, 256)
        # peaks formula spot value at centre-ish
        arr = ex.to_numpy()
        x = np.linspace(-3, 3, 256)
        xx, yy = np.meshgrid(x, x)
        expected = (np.exp(-(xx**2) - yy**2) * np.sin(3 * np.sqrt(xx**2 + yy**2))).astype(np.float32)
        np.testing.assert_array_equal(arr, expected)

    def test_alignment_precondition(self, spark, example_raster, small_raster):
        with pytest.raises(ValueError):
            example_raster.check_aligned(small_raster)

    def test_set_crs(self, example_raster):
        with pytest.raises(ValueError):
            example_raster.set_crs("EPSG:4326")
        rf = example_raster.set_crs("EPSG:4326", allow_override=True)
        assert rf.meta.crs == "EPSG:4326"


class TestGeometry:
    def test_encode_decode(self):
        g = Geometry.polygon([(0, 0), (4, 0), (4, 4), (0, 4)], holes=[[(1, 1), (2, 1), (2, 2), (1, 2)]])
        g2 = Geometry.decode(g.encode())
        assert g2.kind == "polygon"
        np.testing.assert_array_equal(g.coords, g2.coords)
        np.testing.assert_array_equal(g.ring_offsets, g2.ring_offsets)

    def test_pip_square_with_hole(self):
        g = Geometry.polygon([(0, 0), (4, 0), (4, 4), (0, 4)], holes=[[(1, 1), (3, 1), (3, 3), (1, 3)]])
        px = np.array([0.5, 2.0, 3.5, 5.0])
        py = np.array([0.5, 2.0, 3.5, 5.0])
        np.testing.assert_array_equal(points_in_geometry(px, py, g), [True, False, True, False])

    def test_pip_concave(self):
        # horseshoe
        g = Geometry.polygon([(0, 0), (6, 0), (6, 6), (4, 6), (4, 2), (2, 2), (2, 6), (0, 6)])
        assert points_in_geometry(np.array([1.0]), np.array([5.0]), g)[0]
        assert not points_in_geometry(np.array([3.0]), np.array([5.0]), g)[0]
        assert points_in_geometry(np.array([3.0]), np.array([1.0]), g)[0]

    def test_multipolygon(self):
        g = Geometry.multipolygon([Geometry.box(0, 0, 1, 1), Geometry.box(2, 2, 3, 3)])
        got = points_in_geometry(np.array([0.5, 2.5, 1.5]), np.array([0.5, 2.5, 1.5]), g)
        np.testing.assert_array_equal(got, [True, True, False])

    def test_distance(self):
        g = Geometry.box(0, 0, 2, 2)
        d = distance_to_geometry(np.array([1.0, 3.0, 1.0]), np.array([1.0, 1.0, -2.0]), g)
        np.testing.assert_allclose(d, [0.0, 1.0, 2.0])

    def test_segmentize(self):
        out = segmentize_line(np.array([[0.0, 0.0], [0.0, 10.0]]), 3.0)
        assert len(out) == 5  # 4 equal parts of 2.5
        np.testing.assert_allclose(np.diff(out[:, 1]), 2.5)

    def test_catmull_rom_preserves_endpoints(self):
        xy = np.array([[0.0, 0.0], [1.0, 2.0], [3.0, 1.0], [4.0, 4.0]])
        sm = catmull_rom_smooth(xy, 8)
        np.testing.assert_allclose(sm[0], xy[0])
        np.testing.assert_allclose(sm[-1], xy[-1])
        assert len(sm) > len(xy)

    def test_catmull_rom_closed_ring_stays_closed(self):
        # reference contract (tests/rastr/gis/test_smooth.py:21-29): smoothing a
        # closed line must keep first == last
        xy = np.array([[0.0, 0.0], [1.0, 2.0], [2.0, 0.0], [0.0, 0.0]])
        sm = catmull_rom_smooth(xy, 8)
        np.testing.assert_allclose(sm[0], sm[-1])
        assert len(sm) > len(xy)


class TestFishnet:
    def test_point_grid_shape_isclose_guard(self):
        # fishnet.py:49-57 round-vs-ceil
        assert point_grid_shape((0, 0, 10, 10), 2.0) == (5, 5)
        assert point_grid_shape((0, 0, 10.0000000001, 10), 2.0) == (5, 5)
        assert point_grid_shape((0, 0, 10.1, 10), 2.0) == (5, 6)

    def test_point_grid_half_cell_offsets(self):
        gx, gy = point_grid((0, 0, 4, 2), 2.0)
        assert set(zip(gx.tolist(), gy.tolist())) == {(1.0, 1.0), (3.0, 1.0)}
