"""Tests for the cell/topology package and point processes."""

import numpy as np
import pytest

from pyphysim_tpu.cell import (Cell, Cell3Sec, CellBase, CellSquare,
                               CellWrap, Circle, Cluster, Coordinate, Grid,
                               Hexagon, Node, Rectangle, Shape)
from pyphysim_tpu.pointprocess import (generate_random_points_in_circle,
                                       generate_random_points_in_rectangle)


class TestCoordinate:
    def test_distance_and_moves(self):
        a = Coordinate(3 + 4j)
        b = Coordinate(0j)
        assert a.calc_dist(b) == 5.0
        a.move_by_relative_coordinate(1 + 1j)
        assert a.pos == 4 + 5j
        a.move_by_relative_polar_coordinate(2.0, 0.0)
        assert np.isclose(a.pos.real, 6.0)


class TestShapes:
    def test_hexagon(self):
        h = Hexagon(0j, 1.0)
        assert len(h.vertices) == 6
        assert np.allclose(np.abs(h.vertices), 1.0)
        assert np.isclose(h.height, np.sqrt(3) / 2)
        assert h.is_point_inside_shape(0.1 + 0.1j)
        assert not h.is_point_inside_shape(2 + 0j)
        # reference orientation (shapes.py:582-604): vertices on the
        # x-axis, flat top/bottom edges
        bp = h.get_border_point(0.0, 1.0)
        assert np.isclose(abs(bp), 1.0, atol=1e-9)  # 0 deg hits a vertex
        bp90 = h.get_border_point(90.0, 1.0)
        assert np.isclose(abs(bp90), h.height, atol=1e-9)  # edge middle
        # ratio scales linearly
        assert np.isclose(abs(h.get_border_point(0.0, 0.5)),
                          abs(bp) / 2)

    def test_hexagon_translation_rotation(self):
        h = Hexagon(5 + 5j, 2.0, rotation=30.0)
        assert np.allclose(np.abs(h.vertices - h.pos), 2.0)
        assert h.is_point_inside_shape(5 + 5j)

    def test_rectangle(self):
        r = Rectangle(0j, 4 + 2j)
        assert r.pos == 2 + 1j
        assert r.width == 4
        assert r.height == 2
        assert r.is_point_inside_shape(1 + 1j)
        assert not r.is_point_inside_shape(5 + 1j)

    def test_circle(self):
        c = Circle(1 + 1j, 2.0)
        assert c.is_point_inside_shape(1 + 2.5j)
        assert not c.is_point_inside_shape(4 + 1j)
        bp = c.get_border_point(90.0, 1.0)
        assert np.isclose(bp, 1 + 3j)


class TestCells:
    def test_cell_users(self):
        cell = Cell(0j, 1.0, cell_id=1)
        cell.add_user(Node(0.3 + 0.2j))  # relative
        assert cell.num_users == 1
        assert cell.users[0].cell_id == 1
        with pytest.raises(ValueError):
            cell.add_user(Node(5 + 5j), relative_pos_bool=False)
        cell.add_border_user([0.0, 60.0], ratio=0.9)
        assert cell.num_users == 3
        cell.delete_all_users()
        assert cell.num_users == 0

    def test_random_users(self):
        np.random.seed(0)
        cell = Cell(2 + 2j, 1.5, cell_id=2)
        cell.add_random_users(50, min_dist_ratio=0.3)
        assert cell.num_users == 50
        for u in cell.users:
            assert cell.is_point_inside_shape(u.pos)
            assert abs(u.pos - cell.pos) >= 0.3 * 1.5 - 1e-9

    def test_cell3sec(self):
        cell = Cell3Sec(0j, 1.0, cell_id=3)
        assert np.isclose(cell.secradius, np.sqrt(3) / 3)
        np.random.seed(1)
        cell.add_random_users_in_sector(5, 0)
        assert cell.num_users == 5
        # moving the cell moves its sectors
        cell.pos = 1 + 1j
        assert np.isclose(cell._sectors[2].pos,
                          1 + 1j + 1j * cell.secradius)

    def test_cell_square(self):
        cell = CellSquare(0j, 2.0, cell_id=4)
        cell.add_user(Node(0.5 + 0.5j))
        assert cell.num_users == 1
        assert cell.is_point_inside_shape(0.9 + 0.9j)
        assert not cell.is_point_inside_shape(1.1 + 0j)

    def test_cell_wrap(self):
        orig = Cell(0j, 1.0, cell_id=7)
        orig.add_user(Node(0.2 + 0.2j))
        wrap = CellWrap(10 + 0j, orig, include_users_bool=True)
        assert wrap.radius == 1.0
        assert wrap.num_users == 1
        assert np.isclose(wrap.users[0].pos, 10 + 0.2 + 0.2j)
        wrap2 = CellWrap(10 + 0j, orig, include_users_bool=False)
        assert wrap2.num_users == 0


class TestCluster:
    def test_cell_id_fontsize_propagates(self):
        # cell.py:1504-1534: plot styling propagated to every cell
        from pyphysim_tpu.cell import Cluster
        cluster = Cluster(cell_radius=1.0, num_cells=7)
        assert cluster.cell_id_fontsize is None
        cluster.cell_id_fontsize = 12
        assert cluster.cell_id_fontsize == 12
        assert all(c.id_fontsize == 12 for c in cluster)

    def test_layouts(self):
        for n in (1, 3, 7, 13, 19):
            cl = Cluster(cell_radius=1.0, num_cells=n)
            assert cl.num_cells == n
            # cells don't overlap: pairwise distance >= cell height * 2 - eps
            d = cl.calc_dists_between_cells()
            off = d[~np.eye(n, dtype=bool)]
            if n > 1:
                assert off.min() >= np.sqrt(3) - 1e-6  # 2*height for r=1

    def test_cluster_users_and_distances(self):
        np.random.seed(2)
        cl = Cluster(cell_radius=1.0, num_cells=3)
        cl.add_random_users(num_users=4)
        assert cl.num_users == 12
        assert len(cl.get_all_users()) == 12
        dists = cl.calc_dist_all_users_to_each_cell_no_wrap_around()
        assert dists.shape == (12, 3)
        # each user is closest to (or inside) some cell
        assert np.all(dists.min(axis=1) <= 2.0)

    def test_cluster_wrap_around_reduces_distances(self):
        np.random.seed(3)
        cl = Cluster(cell_radius=1.0, num_cells=7)
        cl.add_random_users(num_users=2)
        no_wrap = cl.calc_dist_all_users_to_each_cell_no_wrap_around()
        cl.create_wrap_around_cells(include_users_bool=False)
        with_wrap = cl.calc_dist_all_users_to_each_cell()
        assert np.all(with_wrap <= no_wrap + 1e-9)

    def test_get_cell_by_id_and_iter(self):
        cl = Cluster(cell_radius=2.0, num_cells=7)
        assert cl.get_cell_by_id(1).id == 1
        assert len(list(cl)) == 7
        assert cl.cell_radius == 2.0
        assert np.isclose(cl.cell_height, np.sqrt(3))

    def test_3sec_cluster(self):
        cl = Cluster(cell_radius=1.0, num_cells=3, cell_type="3sec")
        assert all(isinstance(c, Cell3Sec) for c in cl)

    def test_invalid_type(self):
        with pytest.raises(RuntimeError):
            Cluster(cell_radius=1.0, num_cells=3, cell_type="bogus")


class TestGrid:
    def test_create_clusters(self):
        g = Grid()
        g.create_clusters(7, 7, 1.0)
        assert g.num_clusters == 7
        # clusters must not overlap: centers at least 2*(radius - eps)
        centers = [c.pos for c in g]
        for i in range(7):
            for j in range(i + 1, 7):
                d = abs(centers[i] - centers[j])
                assert d > 1.5 * g.get_cluster_from_index(0).radius

    def test_invalid_cells_number(self):
        g = Grid()
        with pytest.raises(ValueError):
            g.create_clusters(2, 5, 1.0)
        g.create_clusters(2, 2, 1.0)
        with pytest.raises(ValueError):
            g.create_clusters(3, 2, 1.0)


class TestPointProcess:
    def test_circle(self):
        np.random.seed(0)
        pts = generate_random_points_in_circle(5000, 2.0, 1.0)
        r = np.abs(pts)
        assert np.all(r <= 2.0)
        assert np.all(r >= 1.0)
        # uniform area density: mean r^2 = (min^2+max^2)/2 = 2.5
        assert np.isclose(np.mean(r ** 2), 2.5, rtol=0.05)

    def test_rectangle(self):
        np.random.seed(1)
        pts = generate_random_points_in_rectangle(5000, 4.0, 2.0)
        assert np.all(np.abs(pts.real) <= 2.0)
        assert np.all(np.abs(pts.imag) <= 1.0)
        assert abs(np.mean(pts)) < 0.1


class TestPlotting:
    """Smoke tests for the matplotlib plotting surface (Agg backend)."""

    def test_accesspoint_plot_and_cluster_border(self):
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        from pyphysim_tpu.cell.cell import AccessPoint

        _, ax = plt.subplots()
        ap = AccessPoint(1 + 2j, ap_id=3)
        ap.add_user(Node(1.5 + 2j))
        ap.plot(ax)

        cl = Cluster(cell_radius=1.0, num_cells=7)
        n_patches = len(ax.patches)
        cl.plot_border(ax)
        assert len(ax.patches) == n_patches + 1
        plt.close("all")
