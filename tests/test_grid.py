"""Exact deterministic Grid tests mirroring `mesh_to_sdf/src/grid.rs:179-297`."""
import numpy as np

from mesh_to_sdf_tpu import Grid


def test_new():
    g = Grid.new([0.1, 0.2, 0.3], [1.1, 1.2, 1.3], [11, 12, 13])
    assert np.allclose(np.asarray(g.first_cell), [0.1, 0.2, 0.3])
    assert np.allclose(np.asarray(g.cell_size), [1.1, 1.2, 1.3])
    assert g.cell_count == (11, 12, 13)


def test_first_last_cells():
    g = Grid.new([0.0, 1.0, 2.0], [1.0, 2.0, 3.0], [10, 20, 30])
    assert np.allclose(np.asarray(g.last_cell()), [10.0, 41.0, 92.0])


def test_from_bounding_box():
    g = Grid.from_bounding_box([-1.0, 0.0, 1.0], [0.0, 2.0, 5.0], [2, 2, 2])
    assert np.allclose(np.asarray(g.first_cell), [-0.75, 0.5, 2.0])
    assert np.allclose(np.asarray(g.cell_size), [0.5, 1.0, 2.0])
    bmin, bmax = g.bounding_box()
    assert np.allclose(np.asarray(bmin), [-1.0, 0.0, 1.0])
    assert np.allclose(np.asarray(bmax), [0.0, 2.0, 5.0])


def test_snap_point_to_grid():
    g = Grid.from_bounding_box([0.0, 0.0, 0.0], [1.0, 1.0, 1.0], [2, 2, 2])

    cell, inside = g.snap_point([0.4, 0.8, 0.1])
    assert list(np.asarray(cell)) == [0, 1, 0] and bool(inside)

    cell, inside = g.snap_point([-0.5, 0.8, 0.8])
    assert list(np.asarray(cell)) == [0, 1, 1] and not bool(inside)

    cell, inside = g.snap_point([0.8, 0.8, 0.8])
    assert list(np.asarray(cell)) == [1, 1, 1] and bool(inside)

    cell, inside = g.snap_point([0.8, 1.5, 0.8])
    assert list(np.asarray(cell)) == [1, 1, 1] and not bool(inside)


def test_cell_idx():
    g = Grid.from_bounding_box([0.0] * 3, [1.0] * 3, [2, 3, 4])
    expected = {
        (0, 0, 0): 0, (0, 0, 1): 1, (0, 1, 0): 4, (0, 1, 1): 5,
        (1, 0, 0): 12, (1, 0, 1): 13, (1, 1, 0): 16, (1, 1, 1): 17,
    }
    for cell, idx in expected.items():
        assert int(g.cell_index(np.array(cell))) == idx


def test_cell_coordinates_roundtrip():
    g = Grid.from_bounding_box([0.0] * 3, [1.0] * 3, [5, 10, 15])
    idx = np.arange(g.total_cell_count)
    cells = np.asarray(g.cell_coordinates(idx))
    back = np.asarray(g.cell_index(cells))
    assert np.array_equal(back, idx)


def test_cell_center():
    g = Grid.from_bounding_box([0.0] * 3, [1.0] * 3, [2, 2, 2])
    assert np.allclose(np.asarray(g.cell_center([0, 0, 0])), [0.25, 0.25, 0.25])
    assert np.allclose(np.asarray(g.cell_center([1, 0, 1])), [0.75, 0.25, 0.75])
    assert np.allclose(np.asarray(g.cell_center([1, 1, 1])), [0.75, 0.75, 0.75])


def test_all_cell_centers_layout():
    """C-order flattening of all_cell_centers == reference flat index layout."""
    g = Grid.from_bounding_box([0.0] * 3, [1.0] * 3, [3, 4, 5])
    centers = np.asarray(g.all_cell_centers()).reshape(-1, 3)
    for idx in [0, 1, 7, 19, 23, 59]:
        cell = np.asarray(g.cell_coordinates(idx))
        assert np.allclose(centers[idx], np.asarray(g.cell_center(cell)))
