"""Video ingestion: video -> frames, AVI -> MP4.

Parity with ``/root/reference/video_to_images.py`` (seek to a start time,
crop, save ``frame_%04d.jpg``, test mode with N frames; config at
``configs/video_to_image_config.yaml``) and
``/root/reference/data_processing/convert_avi_to_mp4.py`` (mp4v re-encode).
"""

from __future__ import annotations

import os


def video_to_frames(video_path: str, output_dir: str,
                    start_time: float = 0.0, end_time: float | None = None,
                    crop: dict | None = None, test: bool = False,
                    test_frames: int = 10, every_n: int = 1) -> int:
    """Extract frames; returns the number written.

    crop: {'x', 'y', 'width', 'height'} (clamped to the frame bounds, like
    the reference's slice indexing).
    """
    import cv2

    cap = cv2.VideoCapture(video_path)
    if not cap.isOpened():
        raise FileNotFoundError(f"cannot open video: {video_path}")
    fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
    start_frame = int(start_time * fps)
    end_frame = (int(end_time * fps) if end_time is not None
                 else int(cap.get(cv2.CAP_PROP_FRAME_COUNT)))
    cap.set(cv2.CAP_PROP_POS_FRAMES, start_frame)

    os.makedirs(output_dir, exist_ok=True)
    written = 0
    frame_idx = start_frame
    while frame_idx < end_frame:
        ok, frame = cap.read()
        if not ok:
            break
        if (frame_idx - start_frame) % every_n == 0:
            if crop:
                y0 = max(0, int(crop.get("y", 0)))
                x0 = max(0, int(crop.get("x", 0)))
                y1 = min(frame.shape[0], y0 + int(crop["height"]))
                x1 = min(frame.shape[1], x0 + int(crop["width"]))
                frame = frame[y0:y1, x0:x1]
            cv2.imwrite(os.path.join(output_dir, f"frame_{written:04d}.jpg"),
                        frame)
            written += 1
            if test and written >= test_frames:
                break
        frame_idx += 1
    cap.release()
    return written


def convert_avi_to_mp4(avi_path: str, mp4_path: str | None = None) -> str:
    """Re-encode an AVI container to MP4 (mp4v), frame by frame."""
    import cv2

    if mp4_path is None:
        mp4_path = os.path.splitext(avi_path)[0] + ".mp4"
    cap = cv2.VideoCapture(avi_path)
    if not cap.isOpened():
        raise FileNotFoundError(f"cannot open video: {avi_path}")
    fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
    w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
    h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
    writer = cv2.VideoWriter(mp4_path, cv2.VideoWriter_fourcc(*"mp4v"),
                             fps, (w, h))
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        writer.write(frame)
    cap.release()
    writer.release()
    return mp4_path
