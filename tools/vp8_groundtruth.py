#!/usr/bin/env python3
"""Ground-truth fixture for the in-repo VP8 (lossy WebP) decoder.

Driver-side tool (NOT part of the library): uses the system libwebp
via ctypes to (a) ENCODE deterministic test images into real lossy
VP8 bitstreams and (b) DECODE them back to raw Y/U/V planes — the
spec-exact output of VP8 reconstruction + loop filtering, before any
implementation-specific YUV->RGB upsampling. The Scala decoder
(graft.ops.Vp8) must reproduce these planes BYTE-EXACTLY; Vp8Spec
reads the parquet this script writes.

Images are generated from a fixed LCG so the fixture is reproducible;
quality levels are chosen to sweep the quantizer range and exercise
segmentation, both intra 16x16 and B_PRED macroblocks, the token
trees' extra-bit categories and the normal loop filter.

Usage: python3 tools/vp8_groundtruth.py [out.parquet]
"""
import ctypes, sys, os

lw = ctypes.CDLL("libwebp.so.7")
lw.WebPEncodeRGB.restype = ctypes.c_size_t
lw.WebPEncodeRGB.argtypes = [
    ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ctypes.c_float, ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte))]
lw.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_ubyte)
lw.WebPDecodeYUV.argtypes = [
    ctypes.c_char_p, ctypes.c_size_t,
    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte)),
    ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte)),
    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]


class Lcg:
    def __init__(self, seed):
        self.s = seed & 0xFFFFFFFFFFFFFFFF

    def next(self):
        self.s = (self.s * 6364136223846793005 + 1442695040888963407) & 0xFFFFFFFFFFFFFFFF
        return (self.s >> 33) & 0xFF


def image(kind, w, h, seed):
    rgb = bytearray(w * h * 3)
    rng = Lcg(seed)
    for y in range(h):
        for x in range(w):
            i = (y * w + x) * 3
            if kind == "flat":
                r = g = b = 96
            elif kind == "flatcolor":
                r, g, b = 200, 64, 32
            elif kind == "hgrad":
                v = (x * 255) // max(w - 1, 1)
                r = g = b = v
            elif kind == "vgrad":
                v = (y * 255) // max(h - 1, 1)
                r, g, b = v, 255 - v, 128
            elif kind == "diag":
                v = ((x + y) * 255) // max(w + h - 2, 1)
                r = g = b = v
            elif kind == "noise":
                r, g, b = rng.next(), rng.next(), rng.next()
            elif kind == "checker":
                v = 230 if ((x // 8) + (y // 8)) % 2 == 0 else 25
                r = g = b = v
            elif kind == "edge":
                v = 240 if x < w // 2 else 16
                r = g = b = v
            elif kind == "bars":
                bars = [(255, 255, 255), (255, 255, 0), (0, 255, 255),
                        (0, 255, 0), (255, 0, 255), (255, 0, 0), (0, 0, 255)]
                r, g, b = bars[(x * 7) // max(w, 1) % 7]
            elif kind == "sine":
                v = (128 + ((x * x * 3 + y * y * 2) % 255) - 127) & 0xFF
                r = g = b = v
            else:
                raise ValueError(kind)
            rgb[i], rgb[i + 1], rgb[i + 2] = r, g, b
    return bytes(rgb)


def encode(rgb, w, h, q):
    out = ctypes.POINTER(ctypes.c_ubyte)()
    n = lw.WebPEncodeRGB(rgb, w, h, w * 3, ctypes.c_float(q), ctypes.byref(out))
    if n == 0:
        raise RuntimeError("encode failed")
    return bytes(bytearray(out[i] for i in range(n)))


def decode_yuv(webp):
    w = ctypes.c_int(); h = ctypes.c_int()
    u = ctypes.POINTER(ctypes.c_ubyte)(); v = ctypes.POINTER(ctypes.c_ubyte)()
    stride = ctypes.c_int(); uv_stride = ctypes.c_int()
    y = lw.WebPDecodeYUV(webp, len(webp), ctypes.byref(w), ctypes.byref(h),
                         ctypes.byref(u), ctypes.byref(v),
                         ctypes.byref(stride), ctypes.byref(uv_stride))
    if not y:
        raise RuntimeError("decode failed")
    W, H = w.value, h.value
    cw, ch = (W + 1) // 2, (H + 1) // 2
    yp = b"".join(bytes(bytearray(y[r * stride.value + c] for c in range(W)))
                  for r in range(H))
    up = b"".join(bytes(bytearray(u[r * uv_stride.value + c] for c in range(cw)))
                  for r in range(ch))
    vp = b"".join(bytes(bytearray(v[r * uv_stride.value + c] for c in range(cw)))
                  for r in range(ch))
    return W, H, yp, up, vp


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "fixtures/vp8.parquet"
    cases = []
    shapes = [("flat", 16, 16), ("flatcolor", 17, 13), ("hgrad", 64, 48),
              ("vgrad", 33, 32), ("diag", 48, 48), ("noise", 32, 32),
              ("checker", 64, 64), ("edge", 40, 24), ("bars", 56, 16),
              ("sine", 127, 95), ("noise", 160, 120), ("hgrad", 1, 1),
              ("vgrad", 3, 2), ("checker", 16, 17)]
    for (kind, w, h) in shapes:
        for q in (10.0, 50.0, 75.0, 90.0):
            rgb = image(kind, w, h, seed=(w * 1315423911 + h * 2654435761 + int(q)))
            name = f"{kind}_{w}x{h}_q{int(q)}"
            webp = encode(rgb, w, h, q)
            W, H, yp, up, vp = decode_yuv(webp)
            assert (W, H) == (w, h)
            cases.append((name, W, H, webp, yp, up, vp))
    # one REAL third-party-encoded stream: the CPython test-suite
    # python.webp (VP8X + ALPH + VP8); rewrap its lossy VP8 chunk as a
    # plain RIFF/WEBP/VP8 file — the luma/chroma ground truth of an
    # encoder other than this libwebp build's default config.
    for cand in ("/root/.pyenv/versions/3.13.0/lib/python3.13/test/test_email/data/python.webp",):
        if os.path.exists(cand):
            raw = open(cand, "rb").read()
            i = raw.find(b"VP8 ")
            if i > 0:
                size = int.from_bytes(raw[i + 4:i + 8], "little")
                chunk = raw[i:i + 8 + size + (size & 1)]
                body = b"WEBP" + chunk
                plain = b"RIFF" + len(body).to_bytes(4, "little") + body
                W, H, yp, up, vp = decode_yuv(plain)
                cases.append(("python_webp_vp8", W, H, plain, yp, up, vp))
    import pyarrow as pa, pyarrow.parquet as pq
    t = pa.table({
        "name": pa.array([c[0] for c in cases], pa.string()),
        "width": pa.array([c[1] for c in cases], pa.int32()),
        "height": pa.array([c[2] for c in cases], pa.int32()),
        "webp": pa.array([c[3] for c in cases], pa.binary()),
        "y_plane": pa.array([c[4] for c in cases], pa.binary()),
        "u_plane": pa.array([c[5] for c in cases], pa.binary()),
        "v_plane": pa.array([c[6] for c in cases], pa.binary()),
    })
    pq.write_table(t, out_path, compression="zstd")
    print(f"wrote {len(cases)} cases to {out_path}")


if __name__ == "__main__":
    main()
