"""Morton range-set coverage: the bbox → cell_id-range predicate used for
file-level pruning of the partitioned tile store (grid.morton_range_set)."""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from rastr_spark.grid import morton_encode, morton_range_set


def covered(ranges: list[tuple[int, int]]) -> set[int]:
    s: set[int] = set()
    for lo, hi in ranges:
        s.update(range(lo, hi + 1))
    return s


def enumerate_rect(tr0, tr1, tc0, tc1) -> set[int]:
    rr, cc = np.meshgrid(np.arange(tr0, tr1 + 1), np.arange(tc0, tc1 + 1), indexing="ij")
    return set(morton_encode(rr.ravel(), cc.ravel()).tolist())


class TestMortonRangeSet:
    @pytest.mark.parametrize(
        "rect",
        [
            (0, 0, 0, 0),
            (0, 3, 0, 3),
            (1, 2, 1, 2),
            (3, 9, 2, 5),
            (5, 5, 0, 31),
            (7, 21, 13, 14),
            (0, 63, 0, 63),
        ],
    )
    def test_exact_cover(self, rect):
        # uncapped decomposition covers EXACTLY the rectangle's Morton codes
        rs = morton_range_set(*rect, max_ranges=10**9)
        assert covered(rs) == enumerate_rect(*rect)
        # ranges are sorted, disjoint, non-adjacent (fully coalesced)
        for (lo1, hi1), (lo2, hi2) in zip(rs, rs[1:]):
            assert hi1 + 1 < lo2

    def test_max_ranges_cap_is_superset(self):
        full = morton_range_set(3, 9, 2, 5, max_ranges=10**9)
        capped = morton_range_set(3, 9, 2, 5, max_ranges=2)
        assert len(capped) <= 2
        assert covered(full) <= covered(capped)  # still a valid pruning predicate

    def test_huge_rect_no_enumeration(self):
        # ~10¹² tiles: must stay O(perimeter·log), never enumerate
        rs = morton_range_set(0, 10**6, 0, 10**6)
        assert 1 <= len(rs) <= 64

    def test_aligned_quad_single_range(self):
        (r,) = morton_range_set(0, 7, 0, 7)
        assert r == (0, 63)

    def test_empty_and_negative_raise(self):
        with pytest.raises(ValueError):
            morton_range_set(2, 1, 0, 0)
        with pytest.raises(ValueError):
            morton_range_set(-1, 1, 0, 0)


class TestMortonColParity:
    def test_jvm_morton_matches_numpy_encoder_beyond_16_bits(self, spark):
        # the stored cell_id (tiles._morton_col, JVM) and the pruning ranges
        # (grid.morton_encode, numpy) MUST agree at every index — a narrower
        # JVM width would alias tile indices >= 2^16 outside the computed
        # ranges and silently drop tiles from pruned reads
        from pyspark.sql import functions as F

        from rastr_spark.tiles import _morton_col

        idx = [(0, 0), (1, 2), (65535, 65535), (65536, 0), (0, 65536),
               (65537, 70000), (1 << 20, (1 << 20) + 3), ((1 << 26) - 1, (1 << 26) - 1)]
        df = spark.createDataFrame(idx, "r long, c long")
        got = [
            r["m"]
            for r in df.select(_morton_col(F.col("r"), F.col("c")).alias("m"))
            .orderBy("m").collect()
        ]
        want = sorted(
            int(morton_encode(np.array([r]), np.array([c]))[0]) for r, c in idx
        )
        assert got == want


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    HAVE_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    HAVE_HYPOTHESIS = False

if HAVE_HYPOTHESIS:

    class TestMortonRangeSetProperties:
        @given(
            tr0=st.integers(0, 40), h=st.integers(0, 25),
            tc0=st.integers(0, 40), w=st.integers(0, 25),
        )
        @settings(max_examples=150, deadline=None)
        def test_uncapped_cover_is_exact(self, tr0, h, tc0, w):
            rs = morton_range_set(tr0, tr0 + h, tc0, tc0 + w, max_ranges=10**9)
            assert covered(rs) == enumerate_rect(tr0, tr0 + h, tc0, tc0 + w)

        @given(
            tr0=st.integers(0, 40), h=st.integers(0, 25),
            tc0=st.integers(0, 40), w=st.integers(0, 25),
            cap=st.integers(1, 8),
        )
        @settings(max_examples=100, deadline=None)
        def test_capped_cover_is_superset_within_cap(self, tr0, h, tc0, w, cap):
            rs = morton_range_set(tr0, tr0 + h, tc0, tc0 + w, max_ranges=cap)
            assert len(rs) <= cap
            assert enumerate_rect(tr0, tr0 + h, tc0, tc0 + w) <= covered(rs)
