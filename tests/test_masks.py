"""Mask utilities: paste, IoU, and boundary-trace polygon extraction."""
import numpy as np

from podtpu.infer.masks import mask_to_polygons, paste_mask


class TestMaskToPolygons:
    def test_square_blob(self):
        grid = np.zeros((10, 10), np.float32)
        grid[2:7, 3:8] = 1.0
        polys = mask_to_polygons(grid)
        assert len(polys) == 1
        xs, ys = polys[0][:, 0], polys[0][:, 1]
        assert xs.min() == 3 and xs.max() == 7
        assert ys.min() == 2 and ys.max() == 6

    def test_two_components_largest_first(self):
        grid = np.zeros((12, 12), np.float32)
        grid[1:3, 1:3] = 1.0     # area 4
        grid[5:11, 5:11] = 1.0   # area 36
        polys = mask_to_polygons(grid)
        assert len(polys) == 2
        assert polys[0][:, 0].min() == 5  # largest first

    def test_one_pixel_wide_L_not_truncated(self):
        """Jacob's stopping criterion regression: a 1-px-wide L whose corner
        is the topmost-leftmost pixel.  The Moore walk re-enters the corner
        after the horizontal arm; a plain `back at start` stop would drop
        the whole vertical arm from the polygon."""
        grid = np.zeros((8, 8), np.float32)
        grid[0, 0:5] = 1.0   # horizontal arm from the corner
        grid[0:5, 0] = 1.0   # vertical arm from the same corner
        polys = mask_to_polygons(grid, min_area=4.0)
        assert len(polys) == 1
        xs, ys = polys[0][:, 0], polys[0][:, 1]
        assert xs.max() == 4, "horizontal arm missing"
        assert ys.max() == 4, "vertical arm missing (truncated trace)"

    def test_min_area_filters(self):
        grid = np.zeros((6, 6), np.float32)
        grid[1, 1] = 1.0
        assert mask_to_polygons(grid, min_area=4.0) == []


class TestPasteMask:
    def test_box_region_filled(self):
        m = np.ones((4, 4), np.float32)
        out = paste_mask(m, np.array([2.0, 3.0, 6.0, 7.0]), 10, 10)
        assert out[4, 4] > 0.5      # inside the box
        assert out[0, 0] == 0.0     # outside
        assert out[8, 8] == 0.0
