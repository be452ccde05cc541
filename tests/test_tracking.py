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
