import json
import os

import numpy as np
import pytest

from upnerf.data import (
    build_arrays,
    cache_dir_for,
    colmap,
    load_cache,
    load_custom,
    load_phototourism,
    load_training_data,
    save_cache,
    synthetic,
)


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("scene") / "toyscene"
    synthetic.generate_scene(
        str(d), n_train=3, n_test=1, H=24, W=32, feat_hw=6, feat_dim=8,
        phototourism_layout=True,
    )
    return str(d)


class TestColmapRoundtrip:
    def test_cameras(self, tmp_path):
        cams = {
            1: colmap.Camera(1, "PINHOLE", 64, 48, np.array([40.0, 40.0, 32.0, 24.0])),
            2: colmap.Camera(2, "SIMPLE_PINHOLE", 10, 10, np.array([5.0, 5.0, 5.0])),
        }
        p = str(tmp_path / "cameras.bin")
        colmap.write_cameras_binary(cams, p)
        out = colmap.read_cameras_binary(p)
        assert out[1].model == "PINHOLE" and out[2].model == "SIMPLE_PINHOLE"
        np.testing.assert_allclose(out[1].params, cams[1].params)

    def test_images(self, tmp_path):
        q = colmap.rotmat2qvec(np.eye(3))
        ims = {
            7: colmap.Image(
                7, q, np.array([1.0, 2.0, 3.0]), 1, "a b.jpg",
                np.array([[1.5, 2.5], [3.5, 4.5]]), np.array([10, -1], np.int64),
            )
        }
        p = str(tmp_path / "images.bin")
        colmap.write_images_binary(ims, p)
        out = colmap.read_images_binary(p)
        assert out[7].name == "a b.jpg"
        np.testing.assert_allclose(out[7].tvec, [1, 2, 3])
        np.testing.assert_allclose(out[7].xys, ims[7].xys)
        np.testing.assert_array_equal(out[7].point3D_ids, [10, -1])

    def test_points(self, tmp_path):
        pts = {
            3: colmap.Point3D(
                3, np.array([0.1, 0.2, 0.3]), np.array([10, 20, 30]),
                np.array(0.7), np.array([1, 2], np.int32), np.array([0, 5], np.int32),
            )
        }
        p = str(tmp_path / "points3D.bin")
        colmap.write_points3d_binary(pts, p)
        out = colmap.read_points3d_binary(p)
        np.testing.assert_allclose(out[3].xyz, [0.1, 0.2, 0.3])
        np.testing.assert_array_equal(out[3].image_ids, [1, 2])
        xyz = colmap.read_points3d_xyz(p)
        np.testing.assert_allclose(xyz, [[0.1, 0.2, 0.3]])

    def test_text_model_roundtrip(self, tmp_path):
        """Text readers (utils/colmap.py:86-110,144-174) against our text
        writers, including a zero-track image (empty second line)."""
        cams = {
            1: colmap.Camera(1, "PINHOLE", 64, 48, np.array([40.0, 40.0, 32.0, 24.0])),
            2: colmap.Camera(2, "RADIAL", 10, 10, np.array([5.0, 5.0, 5.0, 0.1, 0.01])),
        }
        q = colmap.rotmat2qvec(np.eye(3))
        ims = {
            7: colmap.Image(
                7, q, np.array([1.0, 2.0, 3.0]), 1, "x.jpg",
                np.array([[1.5, 2.5], [3.5, 4.5]]), np.array([10, -1], np.int64),
            ),
            8: colmap.Image(
                8, q, np.array([0.0, 0.5, -1.0]), 2, "y.jpg",
                np.zeros((0, 2)), np.zeros(0, np.int64),
            ),
        }
        pts = {
            3: colmap.Point3D(
                3, np.array([0.1, 0.2, 0.3]), np.array([10, 20, 30]),
                np.array(0.7), np.array([7, 8], np.int32), np.array([0, 5], np.int32),
            )
        }
        cp, ip, pp = (str(tmp_path / n) for n in
                      ("cameras.txt", "images.txt", "points3D.txt"))
        colmap.write_cameras_text(cams, cp)
        colmap.write_images_text(ims, ip)
        colmap.write_points3d_text(pts, pp)

        out_c = colmap.read_cameras_text(cp)
        assert out_c[2].model == "RADIAL" and out_c[1].width == 64
        np.testing.assert_allclose(out_c[2].params, cams[2].params)

        out_i = colmap.read_images_text(ip)
        assert out_i[7].name == "x.jpg" and out_i[8].camera_id == 2
        np.testing.assert_allclose(out_i[7].xys, ims[7].xys)
        np.testing.assert_array_equal(out_i[7].point3D_ids, [10, -1])
        assert out_i[8].xys.shape == (0, 2)
        np.testing.assert_allclose(out_i[8].tvec, [0.0, 0.5, -1.0])

        out_p = colmap.read_points3d_text(pp)
        np.testing.assert_allclose(out_p[3].xyz, [0.1, 0.2, 0.3])
        np.testing.assert_array_equal(out_p[3].image_ids, [7, 8])
        np.testing.assert_array_equal(out_p[3].point2D_idxs, [0, 5])
        assert float(out_p[3].error) == 0.7

    def test_qvec_roundtrip(self):
        rng = np.random.RandomState(0)
        w = rng.randn(3) * 0.5
        from upnerf.geometry import se3
        R = np.asarray(se3.so3_to_SO3(w.astype(np.float32)), np.float64)
        q = colmap.rotmat2qvec(R)
        R2 = colmap.qvec2rotmat(q)
        np.testing.assert_allclose(R2, R, atol=1e-5)


class TestCustomScene:
    def test_load_meta(self, scene_dir):
        meta = load_custom(scene_dir, img_downscale=1, camera_noise=-1)
        assert meta.N_images_train == 3 and meta.N_images_test == 1
        assert meta.GT_poses_dict is not None
        # custom scenes train from identity poses (datasets/custom.py:139)
        np.testing.assert_allclose(
            meta.poses_dict[meta.img_ids_train[0]], np.eye(3, 4)
        )

    def test_load_meta_perturbation_mode(self, scene_dir):
        # noise s > 0: train poses = GT composed with persisted se(3) noise;
        # GT_poses_dict must survive untouched (custom-scene extension of
        # the phototourism noise modes, datasets/phototourism.py:187-211).
        meta = load_custom(scene_dir, img_downscale=1, camera_noise=0.1)
        id0 = meta.img_ids_train[0]
        gt0 = np.asarray(meta.GT_poses_dict[id0])
        p0 = np.asarray(meta.poses_dict[id0])
        assert not np.allclose(p0, np.eye(3, 4))  # not identity
        assert not np.allclose(p0, gt0)  # not raw GT
        assert np.abs(p0 - gt0).max() < 0.5  # but a small perturbation of it
        assert os.path.isfile(os.path.join(scene_dir, "noises", "3_0.1.npy"))
        # the persisted noise makes a second load bit-identical
        meta2 = load_custom(scene_dir, img_downscale=1, camera_noise=0.1)
        np.testing.assert_array_equal(p0, np.asarray(meta2.poses_dict[id0]))

    def test_build_arrays(self, scene_dir):
        meta = load_custom(scene_dir, img_downscale=1, camera_noise=-1)
        scene_np, store_np = build_arrays(
            meta, os.path.join(scene_dir, "DINO"), os.path.join(scene_dir, "DPT"),
            near=0.1, far=5.0,
        )
        n_rays = 3 * 24 * 32
        assert store_np["px"].shape == (n_rays,)
        assert store_np["rgb"].dtype == np.uint8
        assert store_np["inv_depth"].dtype == np.float16
        assert scene_np["feat_maps"].shape == (3, 6, 6, 8)
        assert scene_np["ray_offsets"][-1] == n_rays
        np.testing.assert_allclose(scene_np["near_far"], [[0.1, 5.0]] * 3)
        # feature maps are L2-normalized
        norms = np.linalg.norm(scene_np["feat_maps"], axis=-1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-3)
        # inv depth within [1/far, 1/near]
        invd = store_np["inv_depth"].astype(np.float32)
        assert invd.min() >= 1 / 5.0 - 1e-3 and invd.max() <= 1 / 0.1 + 1e-3


class TestPhototourismScene:
    def test_load_meta(self, scene_dir):
        meta = load_phototourism(
            scene_dir, os.path.basename(scene_dir), img_downscale=1, camera_noise=-1
        )
        assert meta.N_images_train == 3 and meta.N_images_test == 1
        # identity pose init, GT kept
        np.testing.assert_allclose(
            meta.poses_dict[meta.img_ids_train[0]], np.eye(3, 4)
        )
        assert meta.GT_poses_dict is not None
        # scene normalized so max far == 5 (datasets/phototourism.py:154-161)
        assert abs(max(meta.fars.values()) - 5.0) < 1e-6

    def test_gt_poses_match_generator(self, scene_dir):
        # COLMAP w2c -> c2w flip must invert the generator's transform up to
        # the global scene rescale.
        meta = load_phototourism(
            scene_dir, os.path.basename(scene_dir), img_downscale=1,
            camera_noise=None,
        )
        with open(os.path.join(scene_dir, "metadata.json")) as f:
            md = json.load(f)
        # rotation part matches exactly; translation only up to scene scale
        gt = np.asarray(md["0"]["c2w"], np.float32)[:3]
        got = np.asarray(meta.poses_dict[meta.img_ids[0]], np.float32)
        np.testing.assert_allclose(got[:, :3], gt[:, :3], atol=1e-4)
        np.testing.assert_allclose(
            got[:, 3] / np.linalg.norm(got[:, 3]),
            gt[:, 3] / np.linalg.norm(gt[:, 3]),
            atol=1e-4,
        )

    def test_cache_roundtrip(self, scene_dir):
        meta = load_phototourism(
            scene_dir, os.path.basename(scene_dir), img_downscale=1,
            camera_noise=None,
        )
        scene_np, store_np = build_arrays(
            meta, os.path.join(scene_dir, "DINO"), os.path.join(scene_dir, "DPT"),
            near=0.1, far=5.0,
        )
        cdir = cache_dir_for(scene_dir, 1)
        save_cache(cdir, meta, scene_np, store_np)
        info, scene2, store2 = load_cache(cdir)
        np.testing.assert_array_equal(store2["rgb"], store_np["rgb"])
        np.testing.assert_allclose(scene2["poses"], scene_np["poses"])
        assert info["img_ids_train"] == [str(i) for i in meta.img_ids_train]

    def test_load_training_data_with_cache(self, scene_dir):
        hp = {
            "dataset_name": "phototourism",
            "root_dir": scene_dir,
            "scene_name": os.path.basename(scene_dir),
            "phototourism.img_downscale": 1,
            "phototourism.use_cache": True,
            "pose.noise": -1,
            "nerf.near": 0.1,
            "nerf.far": 5.0,
            "feat_dir": os.path.join(scene_dir, "DINO"),
            "depth_dir": os.path.join(scene_dir, "DPT"),
        }
        scene_np, store_np, meta = load_training_data(hp)
        # noise -1: poses identity, near/far global
        np.testing.assert_allclose(
            scene_np["poses"], np.broadcast_to(np.eye(3, 4), (3, 3, 4))
        )
        np.testing.assert_allclose(scene_np["near_far"], [[0.1, 5.0]] * 3)
        assert store_np["px"].shape[0] == scene_np["ray_offsets"][-1]
