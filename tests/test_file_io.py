"""Round-trip tests for the point-cloud file formats (bin/pcd/ply/xyz/json) and the
tracking-result line format."""

import io

import numpy as np
import pytest

from ptt_tpu.utils import file_io


@pytest.fixture
def pts(rng):
    return rng.standard_normal((100, 3)).astype(np.float32)


def test_bin_roundtrip(tmp_path, rng):
    pts4 = rng.standard_normal((50, 4)).astype(np.float32)
    p = tmp_path / "scan.bin"
    pts4.tofile(p)
    out = file_io.get_pts_from_bin(p)
    np.testing.assert_array_equal(out, pts4)


@pytest.mark.parametrize("binary", [False, True])
def test_pcd_roundtrip(tmp_path, pts, binary):
    path = file_io.save_pts_as_pcd(pts, tmp_path, "cloud.pcd", binary=binary)
    out = file_io.read_pcd(path)
    np.testing.assert_allclose(out, pts, atol=1e-5)


def test_ply_roundtrip(tmp_path, pts):
    faces = np.array([[0, 1, 2], [2, 3, 4]], np.int32)
    path = file_io.write_ply(tmp_path / "mesh", pts, faces=faces)
    verts, out_faces = file_io.read_ply(path, triangular_mesh=True)
    np.testing.assert_allclose(
        np.stack([verts["x"], verts["y"], verts["z"]], 1), pts, atol=1e-6
    )
    np.testing.assert_array_equal(out_faces, faces)


def test_save_ply_points_only(tmp_path, pts):
    path = file_io.save_ply(tmp_path / "pts.ply", pts)
    verts = file_io.read_ply(path)
    assert len(verts) == 100


def test_xyz_roundtrip(tmp_path, pts):
    file_io.save_xyz_file(pts, tmp_path / "pts.xyz")
    out = file_io.read_xyz_file(tmp_path / "pts.xyz")
    np.testing.assert_allclose(out, pts, atol=1e-5)


def test_json_roundtrip(tmp_path):
    d = {"a": 1, "arr": np.arange(3), "f": np.float32(2.5)}
    file_io.save_dict_as_json(d, tmp_path / "d.json")
    out = file_io.load_json_as_dict(tmp_path / "d.json")
    assert out["a"] == 1 and out["arr"] == [0, 1, 2] and out["f"] == 2.5


def test_track_results_line_format(rng):
    corners = rng.standard_normal((8, 3))
    fp = io.StringIO()
    file_io.save_track_results(fp, [0, 5, 1], corners)
    fields = fp.getvalue().strip().split()
    assert len(fields) == 27  # 3 info + 24 coords
    assert fields[0] == "0" and fields[1] == "5"
    np.testing.assert_allclose(
        np.array(fields[3:], float), corners.reshape(-1), atol=1e-12
    )
