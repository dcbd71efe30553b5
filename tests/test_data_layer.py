"""Data-layer tests: R-sequence determinism + native parity, camera paths,
prefetcher, sample-placement tracker, native disc-depth parity."""

import numpy as np
import pytest

from adanerf_tpu.data.camera import (CenteredCamera, PredefinedCamera,
                                     RotatingCamera, TranslatingCamera,
                                     euler2mat)
from adanerf_tpu.data.prefetch import (BatchPrefetcher, epoch_image_indices,
                                       worker_offset)
from adanerf_tpu.data.sampling import RSequence, get_sequence_generator
from adanerf_tpu.utils.sample_placement_tracker import SamplePlacementTracker


class TestRSequence:
    def test_deterministic_and_in_range(self):
        a = RSequence()
        b = RSequence()
        x = a.pixel_indices(5000, 32, 48)
        y = b.pixel_indices(5000, 32, 48)
        np.testing.assert_array_equal(x, y)
        assert (x >= 0).all() and (x < 32 * 48).all()

    def test_offset_changes_sequence(self):
        a = RSequence()
        a.set_offset(1000)
        b = RSequence()
        assert not np.array_equal(a.pixel_indices(100, 32, 48),
                                  b.pixel_indices(100, 32, 48))

    def test_low_discrepancy_coverage(self):
        """R-sequence should cover pixels much more evenly than iid uniform."""
        a = RSequence()
        h = w = 64
        idx = a.pixel_indices(h * w, h, w)
        unique_frac = len(np.unique(idx)) / (h * w)
        assert unique_frac > 0.75  # iid uniform gives ~0.63

    def test_native_matches_numpy(self):
        a = RSequence()
        b = RSequence()
        b._discrete_native = lambda *args: None  # force numpy
        np.testing.assert_array_equal(a.get_discrete_subset(4096, 0, (800, 800)),
                                      b.get_discrete_subset(4096, 0, (800, 800)))

    def test_uniform_generator(self):
        g = get_sequence_generator("PreGeneratedUniformRandomSequenceGenerator",
                                   num_pregeneration=10000)
        x = g.pixel_indices(500, 16, 16)
        assert (x >= 0).all() and (x < 256).all()


class TestCameras:
    def _cfg(self, **kw):
        from types import SimpleNamespace
        base = dict(videoFrames=8, camCenter=[0.0, 0.0, 0.0], camRadius=2.0,
                    camUpAngle=20, camRightAngle=10,
                    movementVector=[1.0, 0.0, 0.0], camPath="cam_path",
                    data="/nonexistent")
        base.update(kw)
        return SimpleNamespace(**base)

    def test_euler2mat_orthonormal(self):
        m = euler2mat(0.3, -0.2, 0.7)
        np.testing.assert_allclose(m @ m.T, np.eye(3), atol=1e-12)
        assert np.isclose(np.linalg.det(m), 1.0)

    def test_centered_and_rotating(self):
        for cls in (CenteredCamera, RotatingCamera):
            t = cls.calc_positions(self._cfg())
            assert t.shape == (8, 4, 4)
            assert np.isfinite(t).all()

    def test_translating(self):
        t = TranslatingCamera.calc_positions(self._cfg())
        # moves along +x between -1 and 1 times movementVector
        assert t[0, 0, 3] < t[-1, 0, 3]

    def test_predefined(self, tmp_path):
        import json
        frames = {"frames": [{"transform_matrix": np.eye(4).tolist()}
                             for _ in range(5)]}
        (tmp_path / "cam_path.json").write_text(json.dumps(frames))
        t = PredefinedCamera.import_camera_path(str(tmp_path), "cam_path", 3)
        assert t.shape == (3, 4, 4)


class TestPrefetch:
    def test_ordering_and_completion(self):
        seen = []
        it = epoch_image_indices(10, 2, 7, seed=0)
        pf = BatchPrefetcher(lambda idx: tuple(idx), it, depth=2)
        for batch in pf:
            seen.append(batch)
        assert len(seen) == 7
        assert all(len(b) == 2 for b in seen)

    def test_worker_offset(self):
        assert worker_offset(800, 800, 8, 3) == int(800 * 800 / 8 * 3)


class TestSamplePlacementTracker:
    def test_roundtrip_and_fixtures(self, tmp_path):
        t = SamplePlacementTracker(2, 8, 8, 128)
        assert t.get_unpacked_image(0).sum() == 8 * 8 * 128
        t.set_2_samples_test()
        assert t.get_unpacked_image(0).sum() == 8 * 8 * 2
        t.set_16_samples_test()
        assert t.get_unpacked_image(1).sum() == 8 * 8 * 16
        t.set_32_samples_test()
        assert t.get_unpacked_image(0).sum() == 8 * 8 * 32

        samples = np.zeros((1, 4, 128), bool)
        samples[0, :, ::4] = True
        t.replace_samples_batch(samples, 8, 0)
        un = t.get_unpacked_image(0).reshape(-1, 128)
        assert un[8:12].sum() == 4 * 32

        p = tmp_path / "t.npy"
        t.save(str(p))
        t2 = SamplePlacementTracker(2, 8, 8, 128)
        t2.load(str(p))
        np.testing.assert_array_equal(t.bit_data, t2.bit_data)
