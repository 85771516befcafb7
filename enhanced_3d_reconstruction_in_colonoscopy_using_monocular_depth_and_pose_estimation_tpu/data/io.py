"""Host-side dataset IO: file pairing, decode, blacklists.

Mirrors ``/root/reference/data_processing/utils.py`` and the decode
semantics of ``simcol.py`` / ``c3vd.py``:

- SimCol folders pair ``FrameBuffer_*.png`` (RGB) with ``Depth_*.png``
  (16-bit); ``load_frames`` splits on the Depth_/Frame_ filename markers
  (``utils.py:42-67``).
- Split lists are comma-separated folder names (``simcol.py:41-43``).
- Validation drops 3 known-bad SyntheticColon_I/Frames_S14 frames
  (``utils.py:89-93``). The reference's index bookkeeping in
  ``remove_bad_frames`` pops positions by stale indices; here frames and
  positions are filtered consistently (documented divergence, SURVEY.md
  section 7).
- C3VD pairs ``*_color.png`` / ``[0-9]*_*.png`` with ``{n}_depth.tiff``
  (zero-pad fallback), BGR->RGB, uint16 color downcast
  (``c3vd.py:62-107,188-198``).
"""

from __future__ import annotations

import os

import numpy as np

BAD_VAL_FRAMES = (
    "SyntheticColon_I/Frames_S14/FrameBuffer_0059.png",
    "SyntheticColon_I/Frames_S14/FrameBuffer_0060.png",
    "SyntheticColon_I/Frames_S14/FrameBuffer_0061.png",
)


def read_split_list(path: str) -> list[str]:
    """Comma-separated folder list file -> folder names."""
    with open(path, "r", encoding="utf-8") as f:
        return [x.strip() for x in f.read().strip().split(",") if x.strip()]


def load_frames(directory: str) -> tuple[list[str], list[str]]:
    """Sorted (depth_paths, rgb_paths) for one SimCol-style folder."""
    depth, rgb = [], []
    for name in sorted(os.listdir(directory)):
        if not name.endswith(".png"):
            continue
        full = os.path.join(directory, name)
        if "Depth" in name:
            depth.append(full)
        elif "Frame" in name:
            rgb.append(full)
    return depth, rgb


def remove_bad_frames(root: str, rgb_list: list[str], depth_list: list[str],
                      positions: list | None = None):
    """Drop the blacklisted validation frames, keeping all lists aligned."""
    bad_rgb = {os.path.join(root, f) for f in BAD_VAL_FRAMES}
    keep = [i for i, p in enumerate(rgb_list) if p not in bad_rgb]
    rgb_out = [rgb_list[i] for i in keep]
    depth_out = [depth_list[i] for i in keep]
    pos_out = [positions[i] for i in keep] if positions is not None else None
    return rgb_out, depth_out, pos_out


_NATIVE_PNG = None  # tri-state: None = untried, False = unavailable


def _native_png():
    global _NATIVE_PNG
    if _NATIVE_PNG is None:
        try:
            from . import native as native_png
            native_png.png_info  # touch
            _NATIVE_PNG = native_png
        except Exception:
            _NATIVE_PNG = False
    return _NATIVE_PNG


def process_images(train_vids: list[str], val_vids: list[str],
                   test_vids: list[str], input_path: str):
    """Legacy split assembler (reference ``utils.process_images``
    ``:126-189``): collect depth/rgb frame lists per split folder list and
    drop the validation blacklist. Returns
    (train_depth, train_rgb, val_depth, val_rgb, test_depth, test_rgb)."""
    splits = []
    for vids in (train_vids, val_vids, test_vids):
        depth, rgb = [], []
        for vid in vids:
            d, r = load_frames(vid)
            depth.extend(d)
            rgb.extend(r)
        splits.append((depth, rgb))
    val_depth, val_rgb = splits[1]
    val_rgb, val_depth, _ = remove_bad_frames(input_path, val_rgb, val_depth)
    splits[1] = (val_depth, val_rgb)
    for depth, rgb in splits:
        assert len(depth) == len(rgb), "Mismatch in split data"
    return (splits[0][0], splits[0][1], splits[1][0], splits[1][1],
            splits[2][0], splits[2][1])


def _to_rgb3(arr: np.ndarray) -> np.ndarray:
    """Any decoded PNG layout -> (H, W, 3): gray and gray+alpha replicate
    the luma channel (a (H, W, 2) LA image sliced [:, :, :3] would flow 2
    channels into the 3-channel pipeline), RGBA drops alpha."""
    if arr.ndim == 2:
        return np.stack([arr] * 3, axis=-1)
    if arr.shape[2] == 2:  # gray + alpha
        return np.stack([arr[:, :, 0]] * 3, axis=-1)
    return arr[:, :, :3]


def decode_rgb(path: str) -> np.ndarray:
    """RGB uint8 (H, W, 3). Native C++ PNG/JPEG decoders (data/native,
    media/native) with a PIL fallback; drops alpha."""
    if path.lower().endswith((".jpg", ".jpeg")):
        try:
            from ..media import native as _media_native

            with open(path, "rb") as f:
                arr = _media_native.decode_jpeg(f.read())
            if arr.ndim == 2:
                arr = np.stack([arr] * 3, axis=-1)
            return np.ascontiguousarray(arr)
        except Exception:
            pass  # progressive/exotic JPEG -> PIL
    native = _native_png()
    if native and path.endswith(".png"):
        try:
            arr = native.decode_png_batch([path])[0]
            arr = _to_rgb3(arr)
            if arr.dtype == np.uint16:
                arr = (arr // 256).astype(np.uint8)
            return np.ascontiguousarray(arr)
        except ValueError:
            pass  # unsupported PNG flavor -> PIL
    from PIL import Image

    arr = _to_rgb3(np.asarray(Image.open(path)))
    if arr.dtype == np.uint16:  # same downcast as the native path
        arr = (arr // 256).astype(np.uint8)
    return np.ascontiguousarray(arr)


def decode_depth16_png(path: str) -> np.ndarray:
    """16-bit depth PNG -> uint16 (H, W). Native decoder, PIL fallback."""
    native = _native_png()
    if native and path.endswith(".png"):
        try:
            arr = native.decode_png_batch([path])[0]
            return arr.astype(np.uint16)
        except ValueError:
            pass
    from PIL import Image

    arr = np.asarray(Image.open(path))
    return arr.astype(np.uint16)


def decode_c3vd_color(path: str) -> np.ndarray:
    """C3VD color frame: BGR->RGB, uint16 -> uint8 (ref c3vd.py:188-195)."""
    import cv2

    img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    if img.dtype == np.uint16:
        img = (img / 256).astype(np.uint8)
    return img


def decode_c3vd_depth(path: str) -> np.ndarray:
    """C3VD 16-bit depth tiff -> uint16 (H, W).

    Fast path: native C++ TIFF decoder (data/native/tiffdec.cpp —
    baseline striped none/LZW/PackBits, the formats C3VD ships;
    reference reads via cv2, c3vd.py:188-189). cv2 fallback for
    exotic flavors (tiled, other codecs)."""
    native = _native_png()
    if native:
        try:
            return native.decode_tiff(path).astype(np.uint16, copy=False)
        except ValueError:
            pass
    import cv2

    return cv2.imread(path, cv2.IMREAD_UNCHANGED).astype(np.uint16)


def pair_c3vd_folder(folder_path: str) -> tuple[list[str], list[str]]:
    """Color/depth pairing with zero-pad fallback (c3vd.py:62-107)."""
    import glob as globlib

    color = sorted(globlib.glob(os.path.join(folder_path, "*_color.png")))
    color.extend(sorted(globlib.glob(
        os.path.join(folder_path, "[0-9]*_*.png"))))
    # de-dup while keeping order (both patterns can match the same file)
    seen: set[str] = set()
    color = [c for c in color if not (c in seen or seen.add(c))]

    images, depths = [], []
    for img_path in color:
        base = os.path.basename(img_path).split("_")[0]
        candidates = [f"{base}_depth.tiff"]
        if base.isdigit():
            candidates.append(f"{int(base):04d}_depth.tiff")
        depth_file = None
        for cand in candidates:
            p = os.path.join(os.path.dirname(img_path), cand)
            if os.path.exists(p):
                depth_file = p
                break
        if depth_file is not None:
            images.append(img_path)
            depths.append(depth_file)
    return images, depths


def load_pose_files(data_dir: str, folder: str
                    ) -> tuple[np.ndarray, np.ndarray] | None:
    """SavedPosition_*/SavedRotationQuaternion_* for one procedure folder.

    Reference naming (``pose_estimation.py:51-79``): files live next to the
    Frames_ dir, suffixed with the frame-folder id.
    """
    version = folder.split("/")[0]
    frame_id = folder.split("_")[-1]
    pos_file = os.path.join(data_dir, version, f"SavedPosition_{frame_id}.txt")
    rot_file = os.path.join(data_dir, version,
                            f"SavedRotationQuaternion_{frame_id}.txt")
    if not (os.path.exists(pos_file) and os.path.exists(rot_file)):
        return None
    positions = np.loadtxt(pos_file)
    orientations = np.loadtxt(rot_file)
    if positions.ndim == 1:
        positions = positions.reshape(1, -1)
    if orientations.ndim == 1:
        orientations = orientations.reshape(1, -1)
    if positions.shape[1] != 3 or orientations.shape[1] != 4:
        return None
    return positions.astype(np.float32), orientations.astype(np.float32)
