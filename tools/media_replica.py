#!/usr/bin/env python3
"""Independent replica of the graft Multimodal decode/feature pipeline.

Pure-stdlib (struct + zlib) reimplementation of every pinned multimodal
value: container metadata, payload statistics, dHash perceptual image
hash, audio energy-delta fingerprint, and the fixed-seed
random-projection embedding. The CORRECTNESS oracles for the
multimodal_* gates are VALUES literals copied from this script's
output — the Scala code and this file must never share logic, only the
spec (that's what makes the pin independent).

Also (re)generates the PNG fixtures when run with `gen`:
  5.png — pixel-identical RGB re-encode of 1.bmp (the cross-format
          near-duplicate the perceptual hash must recover),
  6.png — 12x7 grayscale gradient with a diagonal perturbation.
"""
import math
import os
from decimal import Decimal, ROUND_HALF_UP
import struct
import sys
import zlib

DIR = os.path.join(os.path.dirname(__file__), "..", "fixtures", "media")


# ---------- decoders (independent of the Scala implementations) ----------

def bmp_pixels(b):
    """(channels, samples in CANONICAL image order, width, height).

    Canonical = top-down rows, (R,G,B[,A]) per pixel — BMP stores
    bottom-up B,G,R[,A], so rows flip and channels swap; a pixel-equal
    PNG then decodes to the identical sample stream.
    """
    off = struct.unpack_from("<i", b, 10)[0]
    w = struct.unpack_from("<i", b, 18)[0]
    hraw = struct.unpack_from("<i", b, 22)[0]
    h = abs(hraw)
    bpp = struct.unpack_from("<H", b, 28)[0]
    ch = bpp // 8
    stride = ((w * ch + 3) // 4) * 4
    vals = []
    for y in range(h):
        row = (h - 1 - y) if hraw > 0 else y
        base = off + row * stride
        for x in range(w):
            p = base + x * ch
            px = [b[p + 2], b[p + 1], b[p]]  # B,G,R -> R,G,B
            if ch == 4:
                px.append(b[p + 3])
            vals.extend(px)
    return ch, vals, w, h


def wav_samples(b):
    """(channels, interleaved samples, sample_rate, bits)."""
    o = 12
    ch = rate = bits = None
    data = None
    while o + 8 <= len(b):
        cid = b[o:o + 4]
        size = struct.unpack_from("<i", b, o + 4)[0]
        if cid == b"fmt ":
            ch = struct.unpack_from("<H", b, o + 10)[0]
            rate = struct.unpack_from("<i", b, o + 12)[0]
            bits = struct.unpack_from("<H", b, o + 22)[0]
        if cid == b"data":
            data = b[o + 8:o + 8 + min(size, len(b) - o - 8)]
        o += 8 + size + (size & 1)
    if bits == 8:
        vals = list(data)
    else:
        n = len(data) // 2
        vals = [struct.unpack_from("<h", data, 2 * i)[0] for i in range(n)]
    return ch, vals, rate, bits


def png_pixels(b):
    """(channels, samples in file order per pixel, width, height, bitdepth).

    Minimal decoder for non-interlaced 8-bit color types 0/2/4/6 with
    all five filter types — enough for any fixture this repo pins.
    """
    assert b[:8] == bytes([0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A])
    o = 8
    idat = b""
    w = h = depth = ctype = None
    while o < len(b):
        ln = struct.unpack_from(">I", b, o)[0]
        cid = b[o + 4:o + 8]
        body = b[o + 8:o + 8 + ln]
        if cid == b"IHDR":
            w, h, depth, ctype = struct.unpack_from(">IIBB", body, 0)
        elif cid == b"IDAT":
            idat += body
        o += 12 + ln
    ch = {0: 1, 2: 3, 4: 2, 6: 4}[ctype]
    assert depth == 8, "replica handles 8-bit fixtures only"
    raw = zlib.decompress(idat)
    stride = w * ch
    out = []
    prev = [0] * stride
    pos = 0
    for _ in range(h):
        f = raw[pos]
        line = list(raw[pos + 1:pos + 1 + stride])
        pos += 1 + stride
        cur = []
        for i in range(stride):
            a = cur[i - ch] if i >= ch else 0
            bb = prev[i]
            c = prev[i - ch] if i >= ch else 0
            x = line[i]
            if f == 1:
                x = (x + a) & 0xFF
            elif f == 2:
                x = (x + bb) & 0xFF
            elif f == 3:
                x = (x + (a + bb) // 2) & 0xFF
            elif f == 4:
                p = a + bb - c
                pa, pb, pc = abs(p - a), abs(p - bb), abs(p - c)
                pr = a if pa <= pb and pa <= pc else (bb if pb <= pc else c)
                x = (x + pr) & 0xFF
            cur.append(x)
        out.extend(cur)
        prev = cur
    return ch, out, w, h, depth


# ---------- derived values ----------

def stats(ch, vals):
    if not vals:
        return None
    n = len(vals)
    means = []
    for c in range(ch):
        sub = vals[c::ch]
        means.append(sum(sub) / len(sub))
    rms = math.sqrt(sum(v * v for v in vals) / n)
    return n, means, min(vals), max(vals), rms


def dhash(ch, vals, w, h):
    def gray(x, y):
        base = (y * w + x) * ch
        return sum(vals[base:base + ch]) / ch

    def g2(i, j):
        return gray(((2 * j + 1) * w) // 18, ((2 * i + 1) * h) // 16)

    bits = 0
    for i in range(8):
        for j in range(8):
            if g2(i, j) < g2(i, j + 1):
                bits |= 1 << (i * 8 + j)
    return bits - (1 << 64) if bits >= 1 << 63 else bits


def audio_fp(ch, vals):
    nf = len(vals) // ch
    if nf < 65:
        return None
    mono = [sum(vals[f * ch:(f + 1) * ch]) / ch for f in range(nf)]

    def energy(t):
        lo, hi = (t * nf) // 65, ((t + 1) * nf) // 65
        return sum(v * v for v in mono[lo:hi])

    e = [energy(t) for t in range(65)]
    bits = 0
    for t in range(64):
        if e[t] < e[t + 1]:
            bits |= 1 << t
    return bits - (1 << 64) if bits >= 1 << 63 else bits


def r4(x):
    """4-decimal rounding in Spark's mode (HALF_UP, away from zero) —
    %.4f would round half-even and disagree on exact .5 boundaries
    (e.g. 12.03125 from a 64-sample mean)."""
    return Decimal(repr(float(x))).quantize(Decimal("0.0001"), rounding=ROUND_HALF_UP)


MASK = (1 << 64) - 1


def splitmix64(z):
    z = (z + 0x9E3779B97F4A7C15) & MASK
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & MASK
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & MASK
    return z ^ (z >> 31)


def embedding(vals, dim=8):
    """Fixed-seed Rademacher random projection: e[j] = sum_i v[i]*s(i,j)/n,
    s(i,j) = +-1 from the top bit of splitmix64(i*dim + j). Summation is
    sequential in i — bit-identical to any replica looping the same way.
    """
    if not vals:
        return None
    n = len(vals)
    e = [0.0] * dim
    for i, v in enumerate(vals):
        base = i * dim
        for j in range(dim):
            s = 1.0 if splitmix64(base + j) < (1 << 63) else -1.0
            e[j] += v * s
    return [x / n for x in e]


# ---------- PNG writer (fixture generation) ----------

def write_png(path, w, h, ctype, rows):
    def chunk(cid, body):
        c = struct.pack(">I", len(body)) + cid + body
        return c + struct.pack(">I", zlib.crc32(cid + body) & 0xFFFFFFFF)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    raw = b"".join(b"\x00" + bytes(r) for r in rows)
    png = (bytes([0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A])
           + chunk(b"IHDR", ihdr) + chunk(b"IDAT", zlib.compress(raw))
           + chunk(b"IEND", b""))
    with open(path, "wb") as f:
        f.write(png)


def generate():
    # 5.png: pixel-identical RGB re-encode of 1.bmp. BMP stores B,G,R
    # bottom-up; PNG stores R,G,B top-down — true recompression, not a
    # byte copy, yet the decoded image is identical so dHash must match.
    with open(os.path.join(DIR, "1.bmp"), "rb") as f:
        b = f.read()
    ch, vals, w, h = bmp_pixels(b)
    height_raw = struct.unpack_from("<i", b, 22)[0]
    rows = []
    for y in range(h):
        src_row = (h - 1 - y) if height_raw > 0 else y  # bottom-up -> top-down
        r = []
        for x in range(w):
            base = (src_row * w + x) * ch
            bb, gg, rr = vals[base], vals[base + 1], vals[base + 2]
            r.extend([rr, gg, bb])
        rows.append(r)
    write_png(os.path.join(DIR, "5.png"), w, h, 2, rows)
    # 6.png: 12x7 grayscale gradient with a diagonal perturbation.
    rows = [[(13 * x + 29 * y + (40 if x == y else 0)) % 256 for x in range(12)]
            for y in range(7)]
    write_png(os.path.join(DIR, "6.png"), 12, 7, 0, rows)


# ---------- report ----------

def main():
    if len(sys.argv) > 1 and sys.argv[1] == "gen":
        generate()
        print("fixtures written")
        return
    import hashlib
    for name in sorted(os.listdir(DIR)):
        path = os.path.join(DIR, name)
        with open(path, "rb") as f:
            b = f.read()
        mid = int(name.split(".")[0])
        kind = name.split(".")[1]
        print(f"== {name} (media_id {mid}, {len(b)} bytes, "
              f"sha256 {hashlib.sha256(b).hexdigest()})")
        if kind == "bmp":
            ch, vals, w, h = bmp_pixels(b)
            bpp = struct.unpack_from('<H', b, 28)[0]
            print(f"  meta: bmp w={w} h={h} bits={bpp}")
            print(f"  dhash: {dhash(ch, vals, w, h)}")
        elif kind == "wav":
            ch, vals, rate, bits = wav_samples(b)
            print(f"  meta: wav ch={ch} rate={rate} bits={bits}")
            print(f"  audio_fp: {audio_fp(ch, vals)}")
        elif kind == "png":
            ch, vals, w, h, depth = png_pixels(b)
            print(f"  meta: png w={w} h={h} ch={ch} depth={depth}")
            print(f"  dhash: {dhash(ch, vals, w, h)}")
        n, means, mn, mx, rms = stats(ch, vals)
        m = [f"{r4(x)}" for x in means] + ["NULL"] * (3 - len(means[:3]))
        print(f"  stats: ch={ch} n={n} means={m[:3]} min={float(mn)} "
              f"max={float(mx)} rms={r4(rms)}")
        emb = embedding(vals)
        print("  embed: " + ", ".join(f"{r4(x)}" for x in emb))
        # Edited-copy values for the near-dup recovery gates: the same
        # one-byte edits SparkEntry.mediaWithEdits applies.
        if kind == "bmp":
            eb = bytearray(b)
            off = struct.unpack_from("<i", b, 10)[0]
            eb[off] = min(255, eb[off] + 200)
            ch2, vals2, w2, h2 = bmp_pixels(bytes(eb))
            d0, d1 = dhash(ch, vals, w, h), dhash(ch2, vals2, w2, h2)
            print(f"  edited dhash: {d1} (hamming {bin((d0 ^ d1) & MASK).count('1')})")
        elif kind == "wav":
            eb = bytearray(b)
            idx = b.find(b"data", 12)
            off = idx + 8 + 1
            eb[off] = min(255, eb[off] + 60)
            ch2, vals2, _, _ = wav_samples(bytes(eb))
            f0, f1 = audio_fp(ch, vals), audio_fp(ch2, vals2)
            if f0 is not None:
                print(f"  edited audio_fp: {f1} "
                      f"(hamming {bin((f0 ^ f1) & MASK).count('1')})")


if __name__ == "__main__":
    main()
