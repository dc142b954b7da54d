#!/usr/bin/env python3
"""Ground truth for the ALPH (alpha plane) decode of lossy WebP.

Driver-side tool (NOT part of the library): encodes RGBA test images
with the system libwebp (WebPEncodeRGBA -> VP8X+ALPH+VP8 files, the
default config compressing alpha with the headerless-VP8L method and
a per-image filter choice), decodes them back with WebPDecodeRGBA,
and stores the webp bytes + the reference decoder's ALPHA plane.
Alpha survives the lossy pipeline exactly (the plane itself is
losslessly coded), so graft.ops.Vp8.decodeAlpha must match
BYTE-EXACTLY; Vp8AlphaSpec reads the parquet this writes. The
CPython test-suite python.webp (a third-party VP8X+ALPH file) rides
along. Usage: python3 tools/vp8_alpha_groundtruth.py [out.parquet]
"""
import ctypes, sys, os

lw = ctypes.CDLL("libwebp.so.7")
lw.WebPEncodeRGBA.restype = ctypes.c_size_t
lw.WebPEncodeRGBA.argtypes = [
    ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ctypes.c_float, ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte))]
lw.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_ubyte)
lw.WebPDecodeRGBA.argtypes = [
    ctypes.c_char_p, ctypes.c_size_t,
    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]


class Lcg:
    def __init__(self, seed):
        self.s = seed & 0xFFFFFFFFFFFFFFFF

    def next(self):
        self.s = (self.s * 6364136223846793005 + 1442695040888963407) & 0xFFFFFFFFFFFFFFFF
        return (self.s >> 33) & 0xFF


def image(kind, w, h, seed):
    rgba = bytearray(w * h * 4)
    rng = Lcg(seed)
    for y in range(h):
        for x in range(w):
            i = (y * w + x) * 4
            if kind == "agrad":     # smooth alpha ramp (filtered well)
                r, g, b = 200, 64, 32
                a = (x * 255) // max(w - 1, 1)
            elif kind == "avgrad":
                r, g, b = 32, 128, 200
                a = (y * 255) // max(h - 1, 1)
            elif kind == "adiag":
                v = ((x + y) * 255) // max(w + h - 2, 1)
                r = g = b = v
                a = 255 - v
            elif kind == "anoise":  # incompressible alpha
                r, g, b = rng.next(), rng.next(), rng.next()
                a = rng.next()
            elif kind == "amask":   # binary cutout (sticker shape)
                r, g, b = 240, 240, 16
                a = 255 if ((x - w // 2) ** 2 + (y - h // 2) ** 2) * 4 < w * h else 0
            elif kind == "aflat":
                r, g, b = 96, 96, 96
                a = 186
            else:
                raise ValueError(kind)
            rgba[i], rgba[i + 1], rgba[i + 2], rgba[i + 3] = r, g, b, a
    return bytes(rgba)


def encode(rgba, w, h, q):
    out = ctypes.POINTER(ctypes.c_ubyte)()
    n = lw.WebPEncodeRGBA(rgba, w, h, w * 4, ctypes.c_float(q), ctypes.byref(out))
    if n == 0:
        raise RuntimeError("encode failed")
    return bytes(bytearray(out[i] for i in range(n)))


def alpha_of(webp):
    w = ctypes.c_int(); h = ctypes.c_int()
    p = lw.WebPDecodeRGBA(webp, len(webp), ctypes.byref(w), ctypes.byref(h))
    if not p:
        raise RuntimeError("decode failed")
    W, H = w.value, h.value
    return W, H, bytes(bytearray(p[4 * i + 3] for i in range(W * H)))


def alph_header(webp):
    i = webp.find(b"ALPH")
    return webp[i + 8] if i > 0 else None


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "fixtures/vp8alpha.parquet"
    cases = []
    shapes = [("agrad", 48, 32), ("avgrad", 33, 32), ("adiag", 64, 48),
              ("anoise", 32, 32), ("amask", 40, 40), ("aflat", 17, 13)]
    seen_headers = set()
    for (kind, w, h) in shapes:
        for q in (50.0, 90.0):
            rgba = image(kind, w, h, seed=(w * 2246822519 + h * 3266489917 + int(q)))
            webp = encode(rgba, w, h, q)
            W, H, ap = alpha_of(webp)
            assert (W, H) == (w, h)
            hd = alph_header(webp)
            seen_headers.add(hd)
            cases.append((f"{kind}_{w}x{h}_q{int(q)}", W, H, webp, ap))
    print("ALPH header bytes seen (compression/filter coverage):",
          sorted(f"{v:08b}" for v in seen_headers if v is not None))

    # The simple-API encoder picked no filtering above — craft RAW
    # ALPH chunks with each filter method by forward-filtering a known
    # plane and splicing it into an encoded container; libwebp's own
    # unfilter output is then the ground truth for that filter path.
    def forward_filter(plane, w, h, method):
        out = bytearray(w * h)
        def pred(x, y):
            if method == 1:  # horizontal
                if x > 0: return out_v[y * w + x - 1]
                return 0 if y == 0 else out_v[(y - 1) * w]
            if method == 2:  # vertical (first row: horizontal)
                if y > 0: return out_v[(y - 1) * w + x]
                return 0 if x == 0 else out_v[x - 1]
            # gradient (first row: horizontal)
            if y == 0:
                return 0 if x == 0 else out_v[x - 1]
            if x == 0:
                return out_v[(y - 1) * w]
            g = out_v[y * w + x - 1] + out_v[(y - 1) * w + x] - out_v[(y - 1) * w + x - 1]
            return 0 if g < 0 else 255 if g > 255 else g
        out_v = plane  # predictions read the TRUE values (decoder reconstructs them)
        for y in range(h):
            for x in range(w):
                out[y * w + x] = (plane[y * w + x] - pred(x, y)) & 0xFF
        return bytes(out)

    def splice_alph(webp, new_alph_payload):
        chunks = []
        o = 12
        while o + 8 <= len(webp):
            four = webp[o:o + 4]
            sz = int.from_bytes(webp[o + 4:o + 8], "little")
            data = webp[o + 8:o + 8 + sz]
            chunks.append((four, data))
            o += 8 + sz + (sz & 1)
        body = b"WEBP"
        for four, data in chunks:
            if four == b"ALPH":
                data = new_alph_payload
            body += four + len(data).to_bytes(4, "little") + data
            if len(data) & 1:
                body += b"\x00"
        return b"RIFF" + len(body).to_bytes(4, "little") + body

    base_w, base_h = 48, 32
    base_rgba = image("agrad", base_w, base_h, seed=1)
    base_webp = encode(base_rgba, base_w, base_h, 75.0)
    plane = bytes(base_rgba[4 * i + 3] for i in range(base_w * base_h))
    for f in (1, 2, 3):
        payload = bytes([f << 2]) + forward_filter(plane, base_w, base_h, f)
        crafted = splice_alph(base_webp, payload)
        W, H, ap = alpha_of(crafted)
        assert (W, H) == (base_w, base_h)
        assert ap == plane, f"filter {f}: libwebp unfilter != source plane"
        cases.append((f"crafted_filter{f}_{base_w}x{base_h}", W, H, crafted, ap))
    print("crafted raw-ALPH cases cover filters 1..3 (libwebp-confirmed)")
    for cand in ("/root/.pyenv/versions/3.13.0/lib/python3.13/test/test_email/data/python.webp",):
        if os.path.exists(cand):
            raw = open(cand, "rb").read()
            W, H, ap = alpha_of(raw)
            cases.append(("python_webp", W, H, raw, ap))
    import pyarrow as pa, pyarrow.parquet as pq
    t = pa.table({
        "name": pa.array([c[0] for c in cases], pa.string()),
        "width": pa.array([c[1] for c in cases], pa.int32()),
        "height": pa.array([c[2] for c in cases], pa.int32()),
        "webp": pa.array([c[3] for c in cases], pa.binary()),
        "alpha": pa.array([c[4] for c in cases], pa.binary()),
    })
    pq.write_table(t, out_path, compression="zstd")
    print(f"wrote {len(cases)} cases to {out_path}")


if __name__ == "__main__":
    main()
