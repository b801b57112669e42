"""Serialization tests — mirrors the reference serde suite (`serde.rs:226-374`):
in-memory roundtrip, file roundtrip, golden-file backward compat, error cases.
"""
import numpy as np
import pytest

from mesh_to_sdf_tpu import Grid
from mesh_to_sdf_tpu.io import serde

GOLDEN_DIR = __file__.rsplit("/", 1)[0] + "/golden"


def _grid_sdf():
    g = Grid.from_bounding_box([-1, -1, -1], [1, 1, 1], [3, 4, 5])
    d = np.linspace(-1, 1, 60).astype(np.float32)
    return serde.GridSdf(grid=g, distances=d)


def _generic_sdf(rng):
    q = rng.uniform(-1, 1, (17, 3)).astype(np.float32)
    d = rng.standard_normal(17).astype(np.float32)
    return serde.GenericSdf(query_points=q, distances=d)


def test_grid_roundtrip_memory(rng):
    sdf = _grid_sdf()
    back = serde.loads(serde.dumps(sdf))
    assert isinstance(back, serde.GridSdf)
    np.testing.assert_array_equal(back.distances, sdf.distances)
    assert back.grid.cell_count == (3, 4, 5)
    np.testing.assert_allclose(
        np.asarray(back.grid.first_cell), np.asarray(sdf.grid.first_cell)
    )


def test_generic_roundtrip_file(rng, tmp_path):
    sdf = _generic_sdf(rng)
    path = tmp_path / "generic.sdf"
    serde.save_to_file(path, sdf)
    back = serde.read_from_file(path)
    assert isinstance(back, serde.GenericSdf)
    np.testing.assert_array_equal(back.query_points, sdf.query_points)
    np.testing.assert_array_equal(back.distances, sdf.distances)


def test_golden_v1_grid():
    """Backward compat against a committed v1 file (`serde.rs:315-374`)."""
    back = serde.read_from_file(GOLDEN_DIR + "/sdf_grid_v1.bin")
    assert isinstance(back, serde.GridSdf)
    assert back.grid.cell_count == (3, 4, 5)
    assert back.distances.shape == (60,)
    np.testing.assert_allclose(
        back.distances, np.linspace(-1, 1, 60).astype(np.float32)
    )


def test_golden_v1_generic():
    back = serde.read_from_file(GOLDEN_DIR + "/sdf_generic_v1.bin")
    assert isinstance(back, serde.GenericSdf)
    assert back.query_points.shape == (17, 3)
    assert back.distances.shape == (17,)


def test_bad_magic():
    with pytest.raises(serde.SerdeError):
        serde.loads(b"\x81\xa5magic\xa3bad")


def test_unknown_version():
    import msgpack

    buf = msgpack.packb(
        {"magic": "mesh_to_sdf_tpu", "version": 99, "sdf": {}}, use_bin_type=True
    )
    with pytest.raises(serde.SerdeError, match="version"):
        serde.loads(buf)


def test_truncated():
    sdf = _grid_sdf()
    buf = serde.dumps(sdf)
    with pytest.raises(serde.SerdeError):
        serde.loads(buf[: len(buf) // 2])


def test_size_mismatch_raises():
    g = Grid.from_bounding_box([-1, -1, -1], [1, 1, 1], [3, 4, 5])
    with pytest.raises(serde.SerdeError):
        serde.dumps(serde.GridSdf(grid=g, distances=np.zeros(10, np.float32)))


def test_native_pack_byte_identical(rng):
    """The C++ codec must produce byte-identical containers (framing parity)."""
    from mesh_to_sdf_tpu import native

    if not native.available():
        pytest.skip("native library not built")
    sdf = _grid_sdf()
    py = serde.dumps(sdf)
    nat = native.pack_grid_sdf(
        np.asarray(sdf.grid.first_cell),
        np.asarray(sdf.grid.cell_size),
        np.asarray(sdf.grid.cell_count, np.uint32),
        sdf.distances,
    )
    assert py == nat

    gsdf = _generic_sdf(rng)
    py2 = serde.dumps(gsdf)
    nat2 = native.pack_generic_sdf(gsdf.query_points, gsdf.distances)
    assert py2 == nat2


# ---------------------------------------------------------------------------
# Reference-crate rmp-serde V1 interop (`serde.rs:77-155,315-374`)
# ---------------------------------------------------------------------------
REF_TESTS = "/root/reference/mesh_to_sdf/tests"

needs_ref = pytest.mark.skipif(
    not __import__("os").path.isdir(REF_TESTS),
    reason="reference checkout not mounted",
)


@needs_ref
def test_reference_golden_generic_v1():
    """Read the Rust crate's own committed golden file
    (`tests/sdf_generic_v1.bin`, written by `serde.rs:315-345`)."""
    back = serde.read_from_file(REF_TESTS + "/sdf_generic_v1.bin")
    assert isinstance(back, serde.GenericSdf)
    np.testing.assert_array_equal(
        back.query_points,
        np.array([[1, 2, 3], [6, 5, 4]], np.float32),
    )
    np.testing.assert_array_equal(back.distances, np.array([1, 3], np.float32))


@needs_ref
def test_reference_golden_grid_v1():
    """`tests/sdf_grid_v1.bin` (`serde.rs:347-374`): Grid::new([1,2,3],
    [4,5,6], [7,8,9]) with distances 0..503."""
    back = serde.read_from_file(REF_TESTS + "/sdf_grid_v1.bin")
    assert isinstance(back, serde.GridSdf)
    assert back.grid.cell_count == (7, 8, 9)
    np.testing.assert_array_equal(
        np.asarray(back.grid.first_cell), np.array([1, 2, 3], np.float32)
    )
    np.testing.assert_array_equal(
        np.asarray(back.grid.cell_size), np.array([4, 5, 6], np.float32)
    )
    np.testing.assert_array_equal(
        back.distances, np.arange(504, dtype=np.float32)
    )


@needs_ref
def test_reference_write_byte_identical():
    """dumps_reference reproduces the crate's rmp-serde bytes exactly."""
    gen = serde.GenericSdf(
        query_points=np.array([[1, 2, 3], [6, 5, 4]], np.float32),
        distances=np.array([1, 3], np.float32),
    )
    with open(REF_TESTS + "/sdf_generic_v1.bin", "rb") as f:
        assert serde.dumps_reference(gen) == f.read()

    grid = Grid.new([1, 2, 3], [4, 5, 6], [7, 8, 9])
    gsdf = serde.GridSdf(grid=grid, distances=np.arange(504, dtype=np.float32))
    with open(REF_TESTS + "/sdf_grid_v1.bin", "rb") as f:
        assert serde.dumps_reference(gsdf) == f.read()


def test_reference_roundtrip(rng, tmp_path):
    """Write reference format, auto-detect on read."""
    sdf = _generic_sdf(rng)
    path = tmp_path / "ref.bin"
    serde.save_to_file(path, sdf, format="reference")
    back = serde.read_from_file(path)
    assert isinstance(back, serde.GenericSdf)
    np.testing.assert_array_equal(back.query_points, sdf.query_points)
    np.testing.assert_array_equal(back.distances, sdf.distances)

    gsdf = _grid_sdf()
    serde.save_to_file(path, gsdf, format="reference")
    back = serde.read_from_file(path)
    assert isinstance(back, serde.GridSdf)
    np.testing.assert_array_equal(back.distances, gsdf.distances)
    assert back.grid.cell_count == (3, 4, 5)


def test_reference_malformed():
    import msgpack

    with pytest.raises(serde.SerdeError):
        serde.loads(msgpack.packb({"V1": {"Nope": []}}, use_bin_type=True))
    with pytest.raises(serde.SerdeError):
        serde.loads(msgpack.packb({"V1": {"Grid": [[1, 2], [0.0]]}}))
    with pytest.raises(serde.SerdeError, match="format"):
        serde.save_to_file("/dev/null", _grid_sdf(), format="bogus")
