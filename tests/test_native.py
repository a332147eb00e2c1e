"""Native C++ COLMAP reader: parity with the portable Python parser."""

import os

import numpy as np
import pytest

from upnerf.data import colmap

native = pytest.importorskip("upnerf.native")
if not native.available():  # pragma: no cover
    pytest.skip("native library not built (sh native/build.sh)", allow_module_level=True)


@pytest.fixture
def model_dir(tmp_path):
    rng = np.random.RandomState(0)
    pts = {
        i + 1: colmap.Point3D(
            i + 1, rng.randn(3), rng.randint(0, 255, 3), np.array(0.5),
            rng.randint(1, 5, (3,)).astype(np.int32),
            np.arange(3, dtype=np.int32),
        )
        for i in range(200)
    }
    colmap.write_points3d_binary(pts, str(tmp_path / "points3D.bin"))
    ims = {
        i + 1: colmap.Image(
            i + 1, colmap.rotmat2qvec(np.eye(3)), rng.randn(3), i + 1,
            f"im {i}.jpg", rng.randn(4, 2),
            rng.randint(-1, 9, 4).astype(np.int64),
        )
        for i in range(20)
    }
    colmap.write_images_binary(ims, str(tmp_path / "images.bin"))
    cams = {
        i + 1: colmap.Camera(
            i + 1, "PINHOLE", 64, 48, np.array([40.0, 41.0, 32.0, 24.0])
        )
        for i in range(20)
    }
    colmap.write_cameras_binary(cams, str(tmp_path / "cameras.bin"))
    return tmp_path


def test_points_parity(model_dir):
    p = str(model_dir / "points3D.bin")
    np.testing.assert_allclose(
        native.read_points3d_xyz(p), colmap.read_points3d_xyz(p)
    )


def test_points_rgb(model_dir):
    p = str(model_dir / "points3D.bin")
    xyz, rgb = native.read_points3d_xyz(p, with_rgb=True)
    ref = colmap.read_points3d_binary(p)
    np.testing.assert_array_equal(rgb[0], ref[1].rgb)


def test_images_parity(model_dir):
    p = str(model_dir / "images.bin")
    meta = native.read_images_meta(p)
    ref = colmap.read_images_binary(p)
    for i, id_ in enumerate(meta["ids"]):
        r = ref[int(id_)]
        assert meta["names"][i] == r.name
        np.testing.assert_allclose(meta["qvec"][i], r.qvec)
        np.testing.assert_allclose(meta["tvec"][i], r.tvec)
        assert meta["camera_ids"][i] == r.camera_id


def test_cameras_parity(model_dir):
    p = str(model_dir / "cameras.bin")
    meta = native.read_cameras_meta(p)
    ref = colmap.read_cameras_binary(p)
    for i, id_ in enumerate(meta["ids"]):
        r = ref[int(id_)]
        np.testing.assert_allclose(meta["params"][i][: len(r.params)], r.params)
        assert meta["wh"][i].tolist() == [r.width, r.height]


def test_scene_loader_uses_native(tmp_path):
    # end-to-end: phototourism loader gives identical poses either way
    from unittest import mock

    from upnerf.data import scene, synthetic

    d = str(tmp_path / "sc")
    synthetic.generate_scene(
        d, n_train=2, n_test=1, H=16, W=16, feat_hw=4, feat_dim=4,
        phototourism_layout=True,
    )
    name = os.path.basename(d)
    m_native = scene.load_phototourism(d, name, camera_noise=None)
    with mock.patch("upnerf.native.available", return_value=False):
        m_py = scene.load_phototourism(d, name, camera_noise=None)
    for id_ in m_native.img_ids:
        np.testing.assert_allclose(
            m_native.poses_dict[id_], m_py.poses_dict[id_], atol=1e-12
        )
        np.testing.assert_allclose(m_native.Ks[id_], m_py.Ks[id_])
