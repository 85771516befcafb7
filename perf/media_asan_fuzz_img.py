"""ASAN fuzz: native PNG and TIFF decoders on truncated/bitflipped files."""
import ctypes, os, tempfile
import numpy as np

png = ctypes.CDLL("/tmp/png_asan.so")
png.e3d_png_info.argtypes = [ctypes.c_char_p] + [ctypes.POINTER(ctypes.c_int)]*4
png.e3d_png_decode_batch.argtypes = [ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
    ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_void_p, ctypes.c_int]

tiff = ctypes.CDLL("/tmp/tiff_asan.so")
tiff.e3d_tiff_info.argtypes = [ctypes.c_char_p] + [ctypes.POINTER(ctypes.c_int)]*4
tiff.e3d_tiff_decode.argtypes = [ctypes.c_char_p, ctypes.c_void_p, ctypes.c_longlong]

d = tempfile.mkdtemp()

def fuzz(blob, ext, try_fn, step_flip=1, step_trunc=7):
    q = os.path.join(d, f"f.{ext}").encode()
    for cut in range(0, len(blob), step_trunc):
        open(q, 'wb').write(blob[:cut]); try_fn(q)
    for i in range(0, len(blob), step_flip):
        mut = bytearray(blob); mut[i] ^= 0xFF
        open(q, 'wb').write(bytes(mut)); try_fn(q)
        mut2 = bytearray(blob); mut2[i] = 0xFF
        open(q, 'wb').write(bytes(mut2)); try_fn(q)

def try_png(q):
    w = ctypes.c_int(); h = ctypes.c_int(); c = ctypes.c_int(); b = ctypes.c_int()
    if png.e3d_png_info(q, ctypes.byref(w), ctypes.byref(h), ctypes.byref(c), ctypes.byref(b)):
        return
    if not (0 < w.value <= 4096 and 0 < h.value <= 4096 and 1 <= c.value <= 4 and b.value in (8, 16)):
        return
    nb = h.value * w.value * c.value * (b.value // 8)
    buf = ctypes.create_string_buffer(nb)
    arr = (ctypes.c_char_p * 1)(q)
    png.e3d_png_decode_batch(arr, 1, h.value, w.value, c.value, b.value, buf, 1)

def try_tiff(q):
    w = ctypes.c_int(); h = ctypes.c_int(); c = ctypes.c_int(); b = ctypes.c_int()
    if tiff.e3d_tiff_info(q, ctypes.byref(h), ctypes.byref(w), ctypes.byref(c), ctypes.byref(b)):
        return
    if not (0 < w.value <= 4096 and 0 < h.value <= 4096 and 1 <= c.value <= 4 and b.value in (8, 16)):
        return
    nb = h.value * w.value * c.value * (b.value // 8)
    buf = ctypes.create_string_buffer(nb)
    tiff.e3d_tiff_decode(q, buf, nb)

import cv2
rng = np.random.default_rng(0)
img8 = rng.integers(0, 255, (24, 32, 3), dtype=np.uint8)
img16 = rng.integers(0, 65535, (24, 32), dtype=np.uint16)
p8 = os.path.join(d, "a.png"); cv2.imwrite(p8, img8)
p16 = os.path.join(d, "b.png"); cv2.imwrite(p16, img16)
t16 = os.path.join(d, "c.tiff"); cv2.imwrite(t16, img16)
t16lzw = os.path.join(d, "dlzw.tiff")
try:
    from PIL import Image
    Image.fromarray(img16, mode="I;16").save(t16lzw, compression="tiff_lzw")
except Exception:
    t16lzw = None

fuzz(open(p8,'rb').read(), "png", try_png)
print("png8 fuzz done")
fuzz(open(p16,'rb').read(), "png", try_png)
print("png16 fuzz done")
fuzz(open(t16,'rb').read(), "tiff", try_tiff)
print("tiff16 fuzz done")
if t16lzw:
    fuzz(open(t16lzw,'rb').read(), "tiff", try_tiff)
    print("tiff-lzw fuzz done")
print("ALL CLEAN")
