import pytest
import numpy as np

from oar_ocr_tpu.processors.sorting import (SortDirection, sort_by_xycut,
                                            sort_quad_boxes,
                                            sort_quad_boxes_indices)


pytestmark = pytest.mark.fast


def _quad(x0, y0, x1, y1):
    return np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1]], np.float32)


def test_sort_quad_reading_order():
    boxes = [_quad(100, 0, 150, 10),   # top right
             _quad(0, 2, 50, 12),      # top left (same line, Δy < 10)
             _quad(0, 50, 50, 60)]     # bottom
    order = sort_quad_boxes_indices(boxes)
    assert order == [1, 0, 2]


def test_sort_quad_distinct_lines():
    boxes = [_quad(0, 40, 50, 50),
             _quad(0, 0, 50, 10)]
    out = sort_quad_boxes(boxes)
    assert out[0][0, 1] == 0


def test_sort_quad_empty():
    assert sort_quad_boxes([]) == []


def test_xycut_two_columns():
    # two columns: left column (2 rows), right column (2 rows); Y-first cut
    # finds no full-width gap, X cut splits columns.
    boxes = [
        np.array([60, 0, 100, 100], np.float32),   # right col full height
        np.array([0, 0, 40, 45], np.float32),      # left top
        np.array([0, 55, 40, 100], np.float32),    # left bottom
    ]
    order = sort_by_xycut(boxes, SortDirection.VERTICAL, 1)
    assert order == [1, 2, 0]


def test_xycut_uncuttable_bucket_is_x_ordered():
    """A row bucket whose x-projections overlap (no x gap) must come out
    in x_min order (recursive_yx_cut emits x_sorted_indices,
    sorting.rs:363-367) — NOT (y, x) order, which put a slightly-higher
    right block before the left one."""
    boxes = [
        np.array([150, 96, 400, 128], np.float32),   # right, 4px higher
        np.array([0, 100, 200, 130], np.float32),    # left (x-overlap)
    ]
    order = sort_by_xycut(boxes, SortDirection.VERTICAL, 1)
    assert order == [1, 0]


def test_xycut_rows():
    boxes = [
        np.array([0, 60, 100, 90], np.float32),
        np.array([0, 0, 100, 30], np.float32),
    ]
    order = sort_by_xycut(boxes, SortDirection.VERTICAL, 1)
    assert order == [1, 0]
