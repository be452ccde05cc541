"""Tests for 3D track association."""

import numpy as np

from selfpose3d_tpu.eval.tracking import track_sequence


def make_tracks(rng, n_frames=10, n_people=3):
    """People moving on straight lines; per-frame order shuffled."""
    starts = rng.rand(n_people, 15, 3) * 1000
    vels = rng.randn(n_people, 1, 3) * 20
    frames, perms = [], []
    for t in range(n_frames):
        poses = starts + vels * t
        perm = rng.permutation(n_people)
        frames.append(poses[perm])
        perms.append(perm)
    return frames, perms


class TestTracking:
    def test_identity_recovered(self, rng):
        frames, perms = make_tracks(rng)
        orders = track_sequence(frames)
        # track 0's pose in every frame must be the same person
        person_at_track0 = [perms[t][orders[t][0]] for t in range(len(frames))]
        assert len(set(person_at_track0)) == 1
        person_at_track1 = [perms[t][orders[t][1]] for t in range(len(frames))]
        assert len(set(person_at_track1)) == 1

    def test_new_person_appends(self, rng):
        frames, _ = make_tracks(rng, n_frames=3, n_people=2)
        # add a third person in the last frame
        extra = rng.rand(1, 15, 3) * 1000 + 5000
        frames[-1] = np.concatenate([frames[-1], extra])
        orders = track_sequence(frames)
        assert len(orders[-1]) == 3

    def test_empty_frame_resets(self, rng):
        frames, _ = make_tracks(rng, n_frames=4, n_people=2)
        frames[1] = np.zeros((0, 15, 3))
        orders = track_sequence(frames)
        assert len(orders[1]) == 0
        assert len(orders[2]) == 2

    def test_score_threshold_drops(self, rng):
        frames, _ = make_tracks(rng, n_frames=2, n_people=3)
        scores = [np.array([0.9, 0.1, 0.9]), np.array([0.9, 0.9, 0.9])]
        orders = track_sequence(frames, scores, score_threshold=0.2)
        assert len(orders[0]) == 2


class TestSceneRender:
    def test_scene_render_and_cli(self, tmp_path, rng):
        """save_scene_render composites image billboards + skeletons, and
        sp3d-visualize --scene drives it from a predictions dump with
        views_meta (the headless vedo-scene equivalent,
        ref tools/visualize.py:250-268,493-600)."""
        import pickle
        import sys

        import cv2

        from selfpose3d_tpu.utils.vis import save_scene_render

        images = [
            (rng.rand(90, 160, 3) * 255).astype(np.uint8) for _ in range(5)
        ]
        poses = rng.rand(2, 15, 3).astype(np.float32) * 1000.0
        out = tmp_path / "scene.png"
        save_scene_render(images, poses, str(out), azimuth=25.0)
        assert out.exists() and out.stat().st_size > 10000

        # CLI --scene over a fabricated dump
        img_paths = []
        for v in range(3):
            p = tmp_path / f"cam{v}.jpg"
            cv2.imwrite(str(p), images[v])
            img_paths.append(str(p))
        K, J = 3, 15
        recs = []
        for i in range(2):
            pred = np.zeros((K, J, 5), np.float32)
            pred[:2, :, :3] = poses[:, :, :3] + 50.0 * i
            pred[:2, :, 3] = 0.0
            pred[2:, :, 3] = -1.0
            pred[:2, :, 4] = 0.9
            recs.append({
                "key": f"seq_{i}", "preds_3d": pred,
                "views_meta": [{"image": p, "camera": None}
                               for p in img_paths],
            })
        dump = tmp_path / "predictions_dump.pkl"
        pickle.dump(recs, open(dump, "wb"))

        from selfpose3d_tpu.cli import visualize as vis_cli

        out_dir = tmp_path / "render"
        sys_argv = ["sp3d-visualize", "--dump", str(dump),
                    "--out-dir", str(out_dir), "--scene"]
        old = sys.argv
        try:
            sys.argv = sys_argv
            vis_cli.main()
        finally:
            sys.argv = old
        pngs = list(out_dir.glob("*.png"))
        assert len(pngs) == 2

    def test_scene_render_with_smpl_meshes(self, tmp_path, rng):
        """--mesh-dir overlays per-person OBJ meshes in the scene render
        (ref: tools/visualize.py:312,331-335: Mesh().rotateX(180).scale(1000)
        per track); frames without assets cleanly skip."""
        import pickle
        import sys

        from selfpose3d_tpu.utils.vis import load_obj_mesh, save_scene_render

        # tiny tetrahedron OBJ in SMPL convention (meters, y-down)
        obj = (
            "v 0 0 0\nv 0.2 0 0\nv 0 -0.2 0\nv 0 0 -1.7\n"
            "f 1/1 2/2 3/3\nf 1 2 4\nf 1 3 4\nf 2 3 4\n"
        )
        mesh_root = tmp_path / "meshes"
        frame_dir = mesh_root / "seq_0"
        frame_dir.mkdir(parents=True)
        (frame_dir / "p0.obj").write_text(obj)
        (frame_dir / "p1.obj").write_text(obj.replace("0.2", "0.3"))

        v, f = load_obj_mesh(str(frame_dir / "p0.obj"))
        assert v.shape == (4, 3) and f.shape == (4, 3)

        poses = rng.rand(2, 15, 3).astype(np.float32) * 1000.0
        out = tmp_path / "scene_mesh.png"
        save_scene_render(
            [], poses, str(out), azimuth=20.0,
            meshes=[(v * 1000.0, f), (v * 1000.0 + 300.0, f)],
        )
        assert out.exists() and out.stat().st_size > 5000

        # CLI: frame 0 has meshes (key-based dir), frame 1 has none
        K, J = 2, 15
        recs = []
        for i in range(2):
            pred = np.zeros((K, J, 5), np.float32)
            pred[:, :, :3] = poses[:, :, :3] + 40.0 * i
            pred[:, :, 3] = 0.0
            pred[:, :, 4] = 0.9
            recs.append({"key": f"seq_{i}", "preds_3d": pred,
                         "views_meta": []})
        dump = tmp_path / "predictions_dump.pkl"
        pickle.dump(recs, open(dump, "wb"))

        from selfpose3d_tpu.cli import visualize as vis_cli

        out_dir = tmp_path / "render_mesh"
        old = sys.argv
        try:
            sys.argv = ["sp3d-visualize", "--dump", str(dump),
                        "--out-dir", str(out_dir), "--scene",
                        "--mesh-dir", str(mesh_root)]
            vis_cli.main()
        finally:
            sys.argv = old
        pngs = sorted(out_dir.glob("*.png"))
        assert len(pngs) == 2  # mesh frame AND meshless frame both render
