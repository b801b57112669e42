"""glTF/GLB ingestion tests (≙ reference `gltf/mod.rs` tests incl. the
intentionally-bad-file case `gltf/mod.rs:339-342`)."""
import json
import struct

import numpy as np
import pytest

from baselines import make_icosphere
from mesh_to_sdf_tpu.io import gltf


def test_glb_roundtrip(tmp_path):
    v, f = make_icosphere(subdiv=2)
    p = tmp_path / "ico.glb"
    gltf.save_glb(p, v, f)
    v2, f2 = gltf.load_mesh(p)
    np.testing.assert_allclose(v2, v, rtol=1e-6)
    np.testing.assert_array_equal(f2, f.astype(np.uint32))


def test_gltf_json_with_data_uri(tmp_path):
    """A .gltf JSON with an embedded base64 buffer."""
    import base64

    v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    idx = np.array([0, 1, 2], np.uint16)
    buf = v.tobytes() + idx.tobytes() + b"\x00\x00"
    doc = {
        "asset": {"version": "2.0"},
        "buffers": [
            {
                "byteLength": len(buf),
                "uri": "data:application/octet-stream;base64,"
                + base64.b64encode(buf).decode(),
            }
        ],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 36},
            {"buffer": 0, "byteOffset": 36, "byteLength": 6},
        ],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 3, "type": "VEC3"},
            {"bufferView": 1, "componentType": 5123, "count": 3, "type": "SCALAR"},
        ],
        "meshes": [
            {"primitives": [{"attributes": {"POSITION": 0}, "indices": 1}]}
        ],
        "nodes": [{"mesh": 0}],
        "scenes": [{"nodes": [0]}],
        "scene": 0,
    }
    p = tmp_path / "tri.gltf"
    p.write_text(json.dumps(doc))
    verts, faces = gltf.load_mesh(p)
    np.testing.assert_allclose(verts, v)
    np.testing.assert_array_equal(faces, [[0, 1, 2]])


def test_node_transform_applied(tmp_path):
    v, f = make_icosphere(subdiv=1)
    p = tmp_path / "ico.glb"
    gltf.save_glb(p, v, f)
    scene = gltf.load_scene(p)
    # Re-instance with a translation and make sure merge applies it.
    T = np.eye(4, dtype=np.float32)
    T[:3, 3] = [5.0, 0.0, 0.0]
    scene.instances = [(0, T)]
    verts, _ = scene.merge()
    np.testing.assert_allclose(verts.mean(axis=0)[0], 5.0, atol=1e-2)


def test_trs_matrix():
    node = {"translation": [1, 2, 3], "scale": [2, 2, 2]}
    m = gltf._node_matrix(node)
    p = m @ np.array([1.0, 0.0, 0.0, 1.0])
    np.testing.assert_allclose(p[:3], [3, 2, 3])


def test_strip_and_fan_triangulation():
    strip = gltf._triangulate(np.arange(5, dtype=np.uint32), gltf.MODE_TRIANGLE_STRIP)
    # glTF strip flips odd triangles to keep winding consistent.
    np.testing.assert_array_equal(
        strip, [[0, 1, 2], [2, 1, 3], [2, 3, 4]]
    )
    fan = gltf._triangulate(np.arange(5, dtype=np.uint32), gltf.MODE_TRIANGLE_FAN)
    np.testing.assert_array_equal(fan, [[0, 1, 2], [0, 2, 3], [0, 3, 4]])


def test_malformed_files(tmp_path):
    """Bad files raise GltfError (reference surfaces alerts, `ui.rs:76-97`)."""
    bad = tmp_path / "bad.glb"
    bad.write_bytes(b"glTF" + struct.pack("<II", 2, 999) + b"junkjunk")
    with pytest.raises(gltf.GltfError):
        gltf.load_scene(bad)

    nothere = tmp_path / "missing.glb"
    with pytest.raises(gltf.GltfError):
        gltf.load_scene(nothere)

    notjson = tmp_path / "x.gltf"
    notjson.write_bytes(b"\x00\x01\x02")
    with pytest.raises(gltf.GltfError):
        gltf.load_scene(notjson)


def test_index_out_of_range(tmp_path):
    v = np.zeros((3, 3), np.float32)
    f = np.array([[0, 1, 9]], np.uint32)  # out of range
    p = tmp_path / "oor.glb"
    gltf.save_glb(p, v, f)
    with pytest.raises(gltf.GltfError, match="out of range"):
        gltf.load_mesh(p)


def test_native_glb_framing(tmp_path):
    from mesh_to_sdf_tpu import native

    if not native.available():
        pytest.skip("native library not built")
    v, f = make_icosphere(subdiv=1)
    p = tmp_path / "ico.glb"
    gltf.save_glb(p, v, f)
    raw = p.read_bytes()
    js, bn = native.glb_chunks(raw)
    doc = json.loads(js)
    assert doc["asset"]["version"] == "2.0"
    assert bn is not None and len(bn) >= v.nbytes + f.astype(np.uint32).nbytes
    with pytest.raises(ValueError):
        native.glb_chunks(b"nope")


def test_native_accessor_decode():
    from mesh_to_sdf_tpu import native

    if not native.available():
        pytest.skip("native library not built")
    rng = np.random.default_rng(1)
    data = rng.standard_normal((10, 3)).astype(np.float32)
    out = native.accessor_to_f32(data.tobytes(), 0, 0, 10, 3, 5126)
    np.testing.assert_array_equal(out, data)
    # strided (stride 16 = 12 data bytes + 4 pad)
    padded = np.zeros((10, 4), np.float32)
    padded[:, :3] = data
    out2 = native.accessor_to_f32(padded.tobytes(), 0, 16, 10, 3, 5126)
    np.testing.assert_array_equal(out2, data)
    # u16 indices
    idx = np.arange(12, dtype=np.uint16)
    got = native.accessor_to_u32(idx.tobytes(), 0, 0, 12, 5123)
    np.testing.assert_array_equal(got, idx.astype(np.uint32))
