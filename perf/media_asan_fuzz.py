import ctypes, os, sys, tempfile
import numpy as np

lib = ctypes.CDLL("/tmp/jpeg_asan.so")
lib.e3d_jpeg_info.argtypes = [ctypes.c_char_p, ctypes.c_long,
    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
lib.e3d_jpeg_decode.argtypes = [ctypes.c_char_p, ctypes.c_long, ctypes.c_void_p, ctypes.c_long]
lib.e3d_jpeg_encode.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                                ctypes.c_int, ctypes.c_void_p, ctypes.c_long]
lib.e3d_jpeg_encode.restype = ctypes.c_long

rng = np.random.default_rng(0)
img = np.cumsum(rng.standard_normal((48, 64, 3)), 1)
img = np.ascontiguousarray(((img - img.min()) / np.ptp(img) * 255).astype(np.uint8))
cap = img.nbytes + (1 << 16)
out = ctypes.create_string_buffer(cap)
n = lib.e3d_jpeg_encode(img.ctypes.data_as(ctypes.c_void_p), 48, 64, 3, 90, out, cap)
assert n > 0
data = out.raw[:n]

def try_decode(b):
    w = ctypes.c_int(); h = ctypes.c_int(); c = ctypes.c_int()
    rc = lib.e3d_jpeg_info(b, len(b), ctypes.byref(w), ctypes.byref(h), ctypes.byref(c))
    if rc != 0: return
    if not (0 < w.value <= 10000 and 0 < h.value <= 10000): return
    nb = h.value * w.value * (3 if c.value != 1 else 1)
    buf = ctypes.create_string_buffer(nb)
    lib.e3d_jpeg_decode(b, len(b), buf, nb)

for cut in range(2, len(data), 11):
    try_decode(data[:cut])
for i in range(len(data)):
    mut = bytearray(data); mut[i] ^= 0xFF
    try_decode(bytes(mut))
    mut2 = bytearray(data); mut2[i] = 0x00
    try_decode(bytes(mut2))
print("jpeg asan fuzz done")

cont = ctypes.CDLL("/tmp/cont_asan.so")
cont.e3d_video_open.argtypes = [ctypes.c_char_p]
cont.e3d_video_open.restype = ctypes.c_void_p
cont.e3d_video_info.argtypes = [ctypes.c_void_p] + [ctypes.POINTER(ctypes.c_int)]*6 + [ctypes.c_char_p]
cont.e3d_video_frame_size.argtypes = [ctypes.c_void_p, ctypes.c_int]
cont.e3d_video_frame_size.restype = ctypes.c_long
cont.e3d_video_frame.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p, ctypes.c_long]
cont.e3d_video_close.argtypes = [ctypes.c_void_p]
cont.e3d_video_close.restype = None
for pre in ("avi", "mp4"):
    op = getattr(cont, f"e3d_{pre}_writer_open"); op.argtypes = [ctypes.c_char_p] + [ctypes.c_int]*4; op.restype = ctypes.c_void_p
    fr = getattr(cont, f"e3d_{pre}_writer_frame"); fr.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_long]
    cl = getattr(cont, f"e3d_{pre}_writer_close"); cl.argtypes = [ctypes.c_void_p]; cl.restype = ctypes.c_int

d = tempfile.mkdtemp()
for ext in ("avi", "mp4"):
    p = os.path.join(d, f"t.{ext}").encode()
    h = getattr(cont, f"e3d_{ext}_writer_open")(p, 64, 48, 30, 1)
    for _ in range(3):
        getattr(cont, f"e3d_{ext}_writer_frame")(h, data, len(data))
    getattr(cont, f"e3d_{ext}_writer_close")(h)
    blob = open(p, 'rb').read()
    def try_open(b):
        q = os.path.join(d, f"f.{ext}").encode()
        open(q, 'wb').write(b)
        hh = cont.e3d_video_open(q)
        if not hh: return
        vals = [ctypes.c_int() for _ in range(6)]
        fc = ctypes.create_string_buffer(5)
        cont.e3d_video_info(hh, *map(ctypes.byref, vals), fc)
        for i in range(min(vals[2].value, 8)):
            nfs = cont.e3d_video_frame_size(hh, i)
            if 0 < nfs < (1<<24):
                buf = ctypes.create_string_buffer(int(nfs))
                cont.e3d_video_frame(hh, i, buf, nfs)
        cont.e3d_video_close(hh)
    for cut in range(0, len(blob), 7):
        try_open(blob[:cut])
    for i in range(len(blob)):
        mut = bytearray(blob); mut[i] ^= 0xFF
        try_open(bytes(mut))
    print(f"{ext} asan fuzz done ({len(blob)} bytes)")
print("ALL CLEAN")
