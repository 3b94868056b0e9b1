import pytest

from bootstrapper_tpu.core.geometry import Coordinate, Roi


def test_coordinate_arithmetic():
    a = Coordinate(1, 2, 3)
    b = Coordinate(10, 20, 30)
    assert a + b == Coordinate(11, 22, 33)
    assert b - a == Coordinate(9, 18, 27)
    assert a * 2 == Coordinate(2, 4, 6)
    assert b / a == Coordinate(10, 10, 10)
    assert Coordinate(7, 7, 7) / Coordinate(2, 3, 4) == Coordinate(3, 2, 1)
    assert -a == Coordinate(-1, -2, -3)
    assert abs(Coordinate(-1, 2, -3)) == Coordinate(1, 2, 3)


def test_coordinate_none_propagation():
    a = Coordinate(None, 2, 3)
    b = a + Coordinate(1, 1, 1)
    assert b == Coordinate(None, 3, 4)


def test_coordinate_floor_division_negative():
    # world-unit floor division must round toward -inf (funlib semantics)
    assert Coordinate(-5) / Coordinate(2) == Coordinate(-3)
    assert Coordinate(-5).ceil_div(Coordinate(2)) == Coordinate(-2)


def test_roi_basics():
    roi = Roi((0, 0, 0), (40, 400, 400))
    assert roi.end == Coordinate(40, 400, 400)
    assert roi.size == 40 * 400 * 400
    assert roi.center == Coordinate(20, 200, 200)
    assert not roi.empty


def test_roi_grow_shrink():
    roi = Roi((10, 10), (100, 100))
    g = roi.grow((5, 5), (5, 5))
    assert g == Roi((5, 5), (110, 110))
    s = g.grow(Coordinate(-5, -5), Coordinate(-5, -5))
    assert s == roi
    g2 = roi.grow(amount_pos=(4, 4))
    assert g2 == Roi((10, 10), (104, 104))


def test_roi_intersect_union():
    a = Roi((0, 0), (100, 100))
    b = Roi((50, 50), (100, 100))
    assert a.intersect(b) == Roi((50, 50), (50, 50))
    assert a.union(b) == Roi((0, 0), (150, 150))
    c = Roi((200, 200), (10, 10))
    assert a.intersect(c).empty
    assert not a.intersects(c)
    assert a.intersects(b)


def test_roi_contains():
    a = Roi((0, 0), (100, 100))
    assert a.contains((0, 0))
    assert a.contains((99, 99))
    assert not a.contains((100, 0))
    assert a.contains(Roi((10, 10), (90, 90)))
    assert not a.contains(Roi((10, 10), (91, 90)))


def test_roi_snap_to_grid():
    roi = Roi((3, 5), (10, 10))
    vs = (4, 4)
    g = roi.snap_to_grid(vs, mode="grow")
    assert g == Roi((0, 4), (16, 12))
    s = roi.snap_to_grid(vs, mode="shrink")
    assert s == Roi((4, 8), (8, 4))


def test_roi_to_slices():
    roi = Roi((40, 8, 8), (80, 16, 16))
    sl = roi.to_slices(voxel_size=(40, 4, 4), offset=(0, 0, 0))
    assert sl == (slice(1, 3), slice(2, 6), slice(2, 6))


def test_roi_context_algebra():
    # the central pattern of the framework: read_roi = write_roi.grow(context)
    input_size = Coordinate(32, 196, 196) * Coordinate(40, 4, 4)
    output_size = Coordinate(4, 104, 104) * Coordinate(40, 4, 4)
    context = (input_size - output_size) / 2
    assert context == Coordinate(560, 184, 184)
    write = Roi((0, 0, 0), output_size)
    read = write.grow(context, context)
    assert read.shape == input_size


def test_roi_unbounded():
    roi = Roi((None, 0, 0), (None, 100, 100))
    assert roi.unbounded
    sl = roi.to_slices()
    assert sl[0] == slice(None)
