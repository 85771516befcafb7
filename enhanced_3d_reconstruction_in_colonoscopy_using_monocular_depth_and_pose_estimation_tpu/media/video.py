"""Video ingestion: video -> frames, AVI -> MP4.

Parity with ``/root/reference/video_to_images.py`` (seek to a start time,
crop, save ``frame_%04d.jpg``, test mode with N frames; config at
``configs/video_to_image_config.yaml``) and
``/root/reference/data_processing/convert_avi_to_mp4.py`` (mp4v re-encode).

MJPEG streams in AVI/MP4 containers take the fully native path
(``media/native``: C++ RIFF/ISO-BMFF demux + baseline JPEG codec):
frame extraction without crop is a lossless byte copy of the stored JPEG,
and AVI -> MP4 becomes a lossless remux instead of the reference's lossy
mp4v transcode (divergence noted in README). Other codecs (H.264 etc.)
fall back to cv2 — entropy codecs are out of scope, like the README's
media-format note.
"""

from __future__ import annotations

import os


def _native_reader(video_path: str):
    """A native VideoReader if the container parses and carries MJPEG;
    None otherwise (caller falls back to cv2)."""
    try:
        from . import native
        r = native.VideoReader(video_path)
    except Exception:
        return None
    if not r.is_mjpeg or r.num_frames == 0:
        r.close()
        return None
    return r


def _validate_crop(crop: dict | None) -> dict | None:
    """Normalize the crop config once for BOTH decode paths: falsy/empty
    -> None; present but missing width/height -> a loud error (the two
    paths previously disagreed: KeyError on native vs silent no-op on
    cv2, depending on the input codec)."""
    if not crop:
        return None
    if "width" not in crop or "height" not in crop:
        raise ValueError(f"crop needs width and height, got {dict(crop)}")
    return crop


def video_to_frames(video_path: str, output_dir: str,
                    start_time: float = 0.0, end_time: float | None = None,
                    crop: dict | None = None, test: bool = False,
                    test_frames: int = 10, every_n: int = 1) -> int:
    """Extract frames; returns the number written.

    crop: {'x', 'y', 'width', 'height'} (clamped to the frame bounds, like
    the reference's slice indexing).
    """
    if not os.path.exists(video_path):
        raise FileNotFoundError(f"cannot open video: {video_path}")
    if test:
        # Reference isolates test-mode samples in output_path/test
        # (video_to_images.py:150-156) — writing them into output_dir
        # would clobber frames of a prior full extraction.
        output_dir = os.path.join(output_dir, "test")
    crop = _validate_crop(crop)
    reader = _native_reader(video_path)
    if reader is not None:
        with reader:
            return _frames_native(reader, output_dir, start_time, end_time,
                                  crop, test, test_frames, every_n)
    return _frames_cv2(video_path, output_dir, start_time, end_time, crop,
                       test, test_frames, every_n)


def _frames_native(r, output_dir: str, start_time: float,
                   end_time: float | None, crop: dict | None, test: bool,
                   test_frames: int, every_n: int) -> int:
    from . import native

    fps = r.fps or 30.0
    start_frame = int(start_time * fps)
    end_frame = (int(end_time * fps) if end_time is not None
                 else r.num_frames)
    end_frame = min(end_frame, r.num_frames)
    os.makedirs(output_dir, exist_ok=True)
    written = 0
    for idx in range(start_frame, end_frame):
        if (idx - start_frame) % every_n:
            continue
        out = os.path.join(output_dir, f"frame_{written:04d}.jpg")
        if crop is None:
            # Stored sample IS a JPEG: lossless, decode-free copy.
            with open(out, "wb") as f:
                f.write(r.frame_bytes(idx))
        else:
            img = r.frame_rgb(idx)
            y0 = max(0, int(crop.get("y", 0)))
            x0 = max(0, int(crop.get("x", 0)))
            y1 = min(img.shape[0], y0 + int(crop["height"]))
            x1 = min(img.shape[1], x0 + int(crop["width"]))
            with open(out, "wb") as f:
                # quality 95 = cv2.imwrite's default, which the reference uses
                f.write(native.encode_jpeg(img[y0:y1, x0:x1], 95))
        written += 1
        if test and written >= test_frames:
            break
    return written


def _frames_cv2(video_path: str, output_dir: str, start_time: float,
                end_time: float | None, crop: dict | None, test: bool,
                test_frames: int, every_n: int) -> int:
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
            if crop is not None:
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
    """Re-container an AVI as MP4.

    MJPEG input: native lossless remux (JPEG samples are copied bit-exact
    into an ISO-BMFF ``jpeg`` track — faster AND higher fidelity than the
    reference's mp4v re-encode, /root/reference/data_processing/
    convert_avi_to_mp4.py:30-50). Other codecs: cv2 mp4v re-encode,
    matching the reference.
    """
    if mp4_path is None:
        mp4_path = os.path.splitext(avi_path)[0] + ".mp4"
    if not os.path.exists(avi_path):
        raise FileNotFoundError(f"cannot open video: {avi_path}")
    reader = _native_reader(avi_path)
    if reader is not None:
        from . import native
        with reader as r:
            with native.VideoWriter(mp4_path, r.width, r.height,
                                    r.fps or 30.0,  # 0 fps AVI headers
                                    container="mp4") as wr:
                for i in range(r.num_frames):
                    wr.write_jpeg(r.frame_bytes(i))
        return mp4_path
    return _convert_cv2(avi_path, mp4_path)


def _convert_cv2(avi_path: str, mp4_path: str) -> str:
    import cv2

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
