"""Frame-folder -> mp4 writer (utils/video.py, reference
utils/general_utils.py:283-302)."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")


def test_save_video_roundtrip(tmp_path):
    from gaussianavatar_tpu.utils.video import save_video

    frames = tmp_path / "frames"
    frames.mkdir()
    rng = np.random.default_rng(0)
    for i in range(4):
        cv2.imwrite(str(frames / f"{i:04d}.png"),
                    rng.integers(0, 255, size=(32, 48, 3), dtype=np.uint8))

    out = str(tmp_path / "clip.mp4")
    assert save_video(str(frames), out, size=(48, 32), fps=10) == out
    assert os.path.getsize(out) > 500

    cap = cv2.VideoCapture(out)
    n = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        assert frame.shape == (32, 48, 3)
        n += 1
    cap.release()
    assert n == 4
