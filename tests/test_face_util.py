"""face_util: similarity estimation and the crop/paste round trip.

Reference behaviours under test: ``FaceRestorationHelper``
(``NAFNet_base/basicsr/utils/face_util.py:22-223``) — 5-landmark Umeyama
alignment to the FFHQ template, warp-crop, and the eroded+feathered
paste-back. Detection is pluggable here (no dlib in this environment), so
the tests inject landmarks directly. Runs with or without cv2 — the image
ops come from ``utils.imgproc``.
"""

import numpy as np
import pytest

from lowlight_image_enhancement_tpu.utils.face_util import (
    FFHQ_TEMPLATE_1024,
    FaceRestorationHelper,
    estimate_similarity,
)


def _apply(affine, pts):
    return pts @ affine[:, :2].T + affine[:, 2]


class TestEstimateSimilarity:
    def test_recovers_known_transform(self):
        rng = np.random.default_rng(0)
        src = rng.uniform(0, 100, (5, 2))
        theta, scale, t = 0.3, 1.7, np.array([12.0, -5.0])
        rot = np.array([[np.cos(theta), -np.sin(theta)],
                        [np.sin(theta), np.cos(theta)]])
        dst = scale * (src @ rot.T) + t
        est = estimate_similarity(src, dst)
        np.testing.assert_allclose(est[:, :2], scale * rot, atol=1e-9)
        np.testing.assert_allclose(est[:, 2], t, atol=1e-8)

    def test_least_squares_under_noise(self):
        rng = np.random.default_rng(1)
        src = rng.uniform(0, 512, (5, 2))
        affine_true = np.array([[0.9, -0.1, 30.0], [0.1, 0.9, -8.0]])
        dst = _apply(affine_true, src) + rng.normal(0, 0.5, (5, 2))
        est = estimate_similarity(src, dst)
        # residual must be no worse than the generating transform's
        r_est = np.sum((_apply(est, src) - dst) ** 2)
        r_true = np.sum((_apply(affine_true, src) - dst) ** 2)
        assert r_est <= r_true + 1e-9

    def test_shape_validation(self):
        with pytest.raises(ValueError):
            estimate_similarity(np.zeros((5, 2)), np.zeros((4, 2)))


class TestFaceRestorationHelper:
    def _image_with_face(self, affine, size=256):
        """Gradient background + a bright square 'face' placed where the
        template (scaled to 128) lands under ``affine``."""
        img = np.zeros((size, size, 3), np.uint8)
        img[..., 0] = np.linspace(0, 200, size, dtype=np.uint8)[None, :]
        center = _apply(affine, np.array([[64.0, 64.0]]))[0].astype(int)
        img[center[1] - 20:center[1] + 20,
            center[0] - 20:center[0] + 20] = (250, 180, 120)
        return img

    def test_crop_paste_roundtrip_identity_restorer(self):
        face_size = 128
        template = FFHQ_TEMPLATE_1024 / (1024 // face_size)
        # a face sitting at a known similarity transform from the template
        theta = 0.2
        rot = 0.8 * np.array([[np.cos(theta), -np.sin(theta)],
                              [np.sin(theta), np.cos(theta)]])
        affine = np.concatenate([rot, [[110.0], [120.0]]], axis=1)
        landmarks = _apply(affine, template)

        helper = FaceRestorationHelper(upscale_factor=1,
                                       face_size=face_size)
        img = self._image_with_face(affine)
        helper.set_input_image(img)
        assert helper.set_landmarks_5([landmarks]) == 1
        helper.warp_crop_faces()
        assert len(helper.cropped_faces) == 1
        crop = helper.cropped_faces[0]
        assert crop.shape == (face_size, face_size, 3)
        # the cropped face is template-aligned: its center holds the patch
        assert crop[64, 64, 0] > 200

        # identity restorer: paste-back must reproduce the input inside
        # the face region (up to warp interpolation at the mask edge).
        # Restored faces and the composite are RGB.
        helper.add_restored_face(crop)
        out = helper.paste_faces_to_input_image()
        center = _apply(affine, np.array([[64.0, 64.0]]))[0].astype(int)
        region = (slice(center[1] - 10, center[1] + 10),
                  slice(center[0] - 10, center[0] + 10))
        diff = np.abs(out[region].astype(int) - img[region].astype(int))
        assert diff.mean() < 8.0

    def test_upscale_paste_shape(self):
        face_size = 128
        template = FFHQ_TEMPLATE_1024 / (1024 // face_size)
        affine = np.array([[1.0, 0.0, 60.0], [0.0, 1.0, 70.0]])
        helper = FaceRestorationHelper(upscale_factor=2, face_size=face_size)
        img = self._image_with_face(affine)
        helper.set_input_image(img)
        helper.set_landmarks_5([_apply(affine, template)])
        helper.warp_crop_faces()
        helper.add_restored_face(helper.cropped_faces[0])
        out = helper.paste_faces_to_input_image()
        assert out.shape == (512, 512, 3)

    def test_detect_without_detector_raises(self):
        helper = FaceRestorationHelper(1)
        helper.set_input_image(np.zeros((64, 64, 3), np.uint8))
        with pytest.raises(RuntimeError, match="landmark"):
            helper.detect_faces()

    def test_clean_all(self):
        helper = FaceRestorationHelper(1)
        helper.set_landmarks_5([np.zeros((5, 2))])
        helper.clean_all()
        assert helper.all_landmarks_5 == []
