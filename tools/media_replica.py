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
DIR2 = os.path.join(os.path.dirname(__file__), "..", "fixtures", "media2")


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


# ---------- baseline JPEG codec (grayscale, independent of Scala) ----------
#
# The decoder reproduces libjpeg's default integer IDCT (jidctint.c's
# "islow" Loeffler algorithm, public jpeg-6b source shipped in every
# JDK) bit for bit — that is what makes JPEG pinnable at all: entropy
# decode + dequantization are exactly specified, and matching the
# JDK's IDCT arithmetic integer-for-integer removes the one
# implementation-defined step. The encoder (fixture generation only)
# uses a float FDCT + Annex K tables; its output bytes are the fixture,
# so encoder roundtrip accuracy is irrelevant to the pins.

ZIGZAG = [  # jpeg_natural_order: zigzag index -> natural (row-major) index
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63]

QTBL_LUMA = [  # Annex K luminance base table, natural order
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99]

DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_VALS = list(range(12))
AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA]


def quant_table(quality):
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return [max(1, min(255, (q * scale + 50) // 100)) for q in QTBL_LUMA]


def _huff_codes(bits, vals):
    """Canonical (code, length) per symbol, per spec Annex C."""
    codes, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            codes[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return codes


def _fdct_quant(block, qt):
    """Float DCT-II on the level-shifted 8x8 block, quantized
    half-away-from-zero. Natural-order output."""
    out = [0] * 64
    for u in range(8):
        for v in range(8):
            s = 0.0
            for y in range(8):
                for x in range(8):
                    s += ((block[y * 8 + x] - 128)
                          * math.cos((2 * x + 1) * v * math.pi / 16)
                          * math.cos((2 * y + 1) * u * math.pi / 16))
            cu = 1 / math.sqrt(2) if u == 0 else 1.0
            cv = 1 / math.sqrt(2) if v == 0 else 1.0
            f = 0.25 * cu * cv * s
            q = qt[u * 8 + v]
            out[u * 8 + v] = int(f / q + 0.5) if f >= 0 else -int(-f / q + 0.5)
    return out


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code, length):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)  # byte stuffing
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self):
        if self.n:
            pad = 8 - self.n
            self.put((1 << pad) - 1, pad)  # 1-fill per spec


def write_jpeg_gray(path, w, h, rows, quality=88):
    """Baseline sequential grayscale JFIF with Annex K huffman tables."""
    qt = quant_table(quality)
    dc_codes = _huff_codes(DC_BITS, DC_VALS)
    ac_codes = _huff_codes(AC_BITS, AC_VALS)
    bw = _BitWriter()
    pred = 0
    for by in range(0, (h + 7) // 8 * 8, 8):
        for bx in range(0, (w + 7) // 8 * 8, 8):
            block = [rows[min(by + y, h - 1)][min(bx + x, w - 1)]
                     for y in range(8) for x in range(8)]
            coef = _fdct_quant(block, qt)
            zz = [coef[ZIGZAG[i]] for i in range(64)]
            diff = zz[0] - pred
            pred = zz[0]
            mag, t = abs(diff), 0
            while mag:
                mag >>= 1
                t += 1
            bw.put(*dc_codes[t])
            if t:
                bw.put(diff if diff > 0 else diff + (1 << t) - 1, t)
            run = 0
            last_nz = max((i for i in range(1, 64) if zz[i]), default=0)
            for i in range(1, last_nz + 1):
                if zz[i] == 0:
                    run += 1
                    continue
                while run > 15:
                    bw.put(*ac_codes[0xF0])  # ZRL
                    run -= 16
                v, t = zz[i], 0
                mag = abs(v)
                while mag:
                    mag >>= 1
                    t += 1
                bw.put(*ac_codes[(run << 4) | t])
                bw.put(v if v > 0 else v + (1 << t) - 1, t)
                run = 0
            if last_nz < 63:
                bw.put(*ac_codes[0x00])  # EOB
    bw.flush()

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    zz_qt = bytes(qt[ZIGZAG[i]] for i in range(64))
    out = (bytes([0xFF, 0xD8])
           + seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
           + seg(0xDB, b"\x00" + zz_qt)
           + seg(0xC0, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
           + seg(0xC4, b"\x00" + bytes(DC_BITS) + bytes(DC_VALS))
           + seg(0xC4, b"\x10" + bytes(AC_BITS) + bytes(AC_VALS))
           + seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
           + bytes(bw.buf) + bytes([0xFF, 0xD9]))
    with open(path, "wb") as f:
        f.write(out)


# ---------- MP3 frame headers (metadata-only; no codec) ----------
#
# MPEG-1 Layer III frame headers are pure byte structure: 11-bit sync,
# version/layer bits, bitrate/samplerate indices, channel mode. A
# crawl pipeline reads these to route/filter audio (duration, rate,
# channels) long before any expensive decode; payload decode needs a
# real MDCT codec and stays out of scope on both sides (the JDK has
# no MP3 decoder either), so the pins here are header-only.

MP3_BITRATES_V1L3 = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128,
                     160, 192, 224, 256, 320]  # kbps, index 1..14
MP3_RATES_V1 = [44100, 48000, 32000]


def write_mp3(path, n_frames=5, bitrate_idx=9, rate_idx=0, mono=True):
    """Structurally-valid MPEG-1 Layer III frame sequence with a
    deterministic filler payload (no audio content — header fixture)."""
    rate = MP3_RATES_V1[rate_idx]
    kbps = MP3_BITRATES_V1L3[bitrate_idx]
    frame_len = (144 * kbps * 1000) // rate  # padding bit 0
    out = bytearray()
    for f in range(n_frames):
        hdr = bytes([0xFF, 0xFB, (bitrate_idx << 4) | (rate_idx << 2),
                     0xC0 if mono else 0x00])
        out += hdr
        out += bytes(((f * 131 + i * 7 + 13) & 0xFF)
                     for i in range(frame_len - 4))
    with open(path, "wb") as fh:
        fh.write(bytes(out))


def mp3_meta(b):
    """(channels, sample_rate, n_frames) from the frame-header walk —
    mirrors the Scala parser: >= 2 consecutive valid headers required."""
    o = 0
    if b[:3] == b"ID3":  # skip ID3v2: syncsafe size at 6..9 + 10 hdr
        size = (b[6] << 21) | (b[7] << 14) | (b[8] << 7) | b[9]
        o = 10 + size
    ch = rate = None
    frames = 0
    while o + 4 <= len(b):
        if b[o] != 0xFF or (b[o + 1] & 0xE0) != 0xE0:
            break
        version = (b[o + 1] >> 3) & 3
        layer = (b[o + 1] >> 1) & 3
        if version != 3 or layer != 1:  # MPEG-1 Layer III only
            break
        bi = b[o + 2] >> 4
        ri = (b[o + 2] >> 2) & 3
        pad = (b[o + 2] >> 1) & 1
        if bi in (0, 15) or ri == 3:
            break
        mode = b[o + 3] >> 6
        ch = 1 if mode == 3 else 2
        rate = MP3_RATES_V1[ri]
        frames += 1
        o += (144 * MP3_BITRATES_V1L3[bi] * 1000) // rate + pad
    return (ch, rate, frames) if frames >= 2 else (None, None, 0)


# --- jidctint (jpeg-6b islow) constants ---
_CB, _P1 = 13, 2
_F0_298631336, _F0_390180644 = 2446, 3196
_F0_541196100, _F0_765366865 = 4433, 6270
_F0_899976223, _F1_175875602 = 7373, 9633
_F1_501321110, _F1_847759065 = 12299, 15137
_F1_961570560, _F2_053119869 = 16069, 16819
_F2_562915447, _F3_072711026 = 20995, 25172


def _descale(x, n):
    return (x + (1 << (n - 1))) >> n  # arithmetic shift, like RIGHT_SHIFT


def _idct_islow(coef, qt):
    """jpeg-6b jidctint.c, integer for integer: column pass into a
    workspace at PASS1_BITS precision, row pass to clamped samples
    (+128 level shift folded in, as the range_limit table does)."""
    ws = [0] * 64
    for c in range(8):
        col = [coef[r * 8 + c] * qt[r * 8 + c] for r in range(8)]
        if not any(col[1:]):
            dc = col[0] << _P1
            for r in range(8):
                ws[r * 8 + c] = dc
            continue
        z2, z3 = col[2], col[6]
        z1 = (z2 + z3) * _F0_541196100
        t2 = z1 + z3 * -_F1_847759065
        t3 = z1 + z2 * _F0_765366865
        z2, z3 = col[0], col[4]
        t0 = (z2 + z3) << _CB
        t1 = (z2 - z3) << _CB
        t10, t13, t11, t12 = t0 + t3, t0 - t3, t1 + t2, t1 - t2
        t0, t1, t2, t3 = col[7], col[5], col[3], col[1]
        z1, z2, z3, z4 = t0 + t3, t1 + t2, t0 + t2, t1 + t3
        z5 = (z3 + z4) * _F1_175875602
        t0 *= _F0_298631336
        t1 *= _F2_053119869
        t2 *= _F3_072711026
        t3 *= _F1_501321110
        z1 *= -_F0_899976223
        z2 *= -_F2_562915447
        z3 = z3 * -_F1_961570560 + z5
        z4 = z4 * -_F0_390180644 + z5
        t0 += z1 + z3
        t1 += z2 + z4
        t2 += z2 + z3
        t3 += z1 + z4
        for r, v in ((0, t10 + t3), (7, t10 - t3), (1, t11 + t2), (6, t11 - t2),
                     (2, t12 + t1), (5, t12 - t1), (3, t13 + t0), (4, t13 - t0)):
            ws[r * 8 + c] = _descale(v, _CB - _P1)
    out = [0] * 64
    for r in range(8):
        row = ws[r * 8:r * 8 + 8]
        if not any(row[1:]):
            dc = max(0, min(255, _descale(row[0], _P1 + 3) + 128))
            for c in range(8):
                out[r * 8 + c] = dc
            continue
        z2, z3 = row[2], row[6]
        z1 = (z2 + z3) * _F0_541196100
        t2 = z1 + z3 * -_F1_847759065
        t3 = z1 + z2 * _F0_765366865
        t0 = (row[0] + row[4]) << _CB
        t1 = (row[0] - row[4]) << _CB
        t10, t13, t11, t12 = t0 + t3, t0 - t3, t1 + t2, t1 - t2
        t0, t1, t2, t3 = row[7], row[5], row[3], row[1]
        z1, z2, z3, z4 = t0 + t3, t1 + t2, t0 + t2, t1 + t3
        z5 = (z3 + z4) * _F1_175875602
        t0 *= _F0_298631336
        t1 *= _F2_053119869
        t2 *= _F3_072711026
        t3 *= _F1_501321110
        z1 *= -_F0_899976223
        z2 *= -_F2_562915447
        z3 = z3 * -_F1_961570560 + z5
        z4 = z4 * -_F0_390180644 + z5
        t0 += z1 + z3
        t1 += z2 + z4
        t2 += z2 + z3
        t3 += z1 + z4
        for c, v in ((0, t10 + t3), (7, t10 - t3), (1, t11 + t2), (6, t11 - t2),
                     (2, t12 + t1), (5, t12 - t1), (3, t13 + t0), (4, t13 - t0)):
            out[r * 8 + c] = max(0, min(255,
                _descale(v, _CB + _P1 + 3) + 128))
    return out


class _BitReader:
    def __init__(self, data):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def bit(self):
        if self.n == 0:
            byte = self.data[self.pos]
            self.pos += 1
            if byte == 0xFF:
                assert self.data[self.pos] == 0x00, "marker inside scan"
                self.pos += 1
            self.acc = byte
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k):
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v


def jpeg_pixels(b):
    """(1, samples row-major, width, height) for a baseline grayscale
    JPEG — full huffman + dequant + islow-IDCT decode."""
    assert b[0] == 0xFF and b[1] == 0xD8, "not a JPEG"
    o = 2
    qts, dcs, acs = {}, {}, {}
    w = h = None
    scan_dc = scan_ac = scan_q = None
    while o < len(b):
        assert b[o] == 0xFF
        m = b[o + 1]
        if m == 0xD9:
            break
        ln = struct.unpack_from(">H", b, o + 2)[0]
        body = b[o + 4:o + 2 + ln]
        if m == 0xDB:
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 15
                assert pq == 0, "8-bit tables only"
                t = [0] * 64
                for i in range(64):
                    t[ZIGZAG[i]] = body[p + 1 + i]
                qts[tq] = t
                p += 65
        elif m == 0xC4:
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 15
                bits = list(body[p + 1:p + 17])
                nv = sum(bits)
                vals = list(body[p + 17:p + 17 + nv])
                (dcs if tc == 0 else acs)[th] = _decode_table(bits, vals)
                p += 17 + nv
        elif m in (0xC0, 0xC1):
            prec, h, w, ncomp = struct.unpack_from(">BHHB", body, 0)
            assert prec == 8 and ncomp == 1, "grayscale baseline only"
            scan_q = body[8]  # body: prec h h w w ncomp | id sampling tq
        elif m == 0xDA:
            ns = body[0]
            assert ns == 1
            scan_dc, scan_ac = body[2] >> 4, body[2] & 15
            o = o + 2 + ln
            break
        elif m == 0xC2:
            raise AssertionError("progressive JPEG not supported by replica")
        o += 2 + ln
    br = _BitReader(b[o:])
    qt = qts[scan_q]
    dct, act = dcs[scan_dc], acs[scan_ac]
    bw_, bh_ = (w + 7) // 8, (h + 7) // 8
    img = [[0] * (bw_ * 8) for _ in range(bh_ * 8)]
    pred = 0
    for by in range(bh_):
        for bx in range(bw_):
            zz = [0] * 64
            t = _huff_read(br, dct)
            diff = _extend(br.bits(t), t) if t else 0
            pred += diff
            zz[0] = pred
            k = 1
            while k < 64:
                rs = _huff_read(br, act)
                r, s = rs >> 4, rs & 15
                if s == 0:
                    if r == 15:
                        k += 16
                        continue
                    break  # EOB
                k += r
                zz[k] = _extend(br.bits(s), s)
                k += 1
            coef = [0] * 64
            for i in range(64):
                coef[ZIGZAG[i]] = zz[i]
            block = _idct_islow(coef, qt)
            for y in range(8):
                for x in range(8):
                    img[by * 8 + y][bx * 8 + x] = block[y * 8 + x]
    vals = [img[y][x] for y in range(h) for x in range(w)]
    return 1, vals, w, h


def _decode_table(bits, vals):
    """length -> {code: symbol} lookup, canonical order."""
    table, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            table[(ln, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_read(br, table):
    code, ln = 0, 0
    while ln < 16:
        code = (code << 1) | br.bit()
        ln += 1
        if (ln, code) in table:
            return table[(ln, code)]
    raise AssertionError("bad huffman code")


def _extend(v, t):
    return v - (1 << t) + 1 if v < (1 << (t - 1)) else v


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
    # bmp_pixels already returns CANONICAL top-down R,G,B samples —
    # PNG file order equals canonical order, so rows copy straight out
    # (no second flip/swap: that would mirror the image and break the
    # pixel-identity the 5.png pins rely on).
    ch, vals, w, h = bmp_pixels(b)
    rows = [[vals[(y * w + x) * ch + c] for x in range(w) for c in range(3)]
            for y in range(h)]
    write_png(os.path.join(DIR, "5.png"), w, h, 2, rows)
    # 6.png: 12x7 grayscale gradient with a diagonal perturbation.
    rows6 = [[(13 * x + 29 * y + (40 if x == y else 0)) % 256 for x in range(12)]
             for y in range(7)]
    write_png(os.path.join(DIR, "6.png"), 12, 7, 0, rows6)
    # 7.jpg: LOSSY baseline-JPEG re-encode of 6.png's pixels — the
    # recompressed-crawl-copy shape: decoded samples differ slightly
    # from the PNG original, but the dHash must land within near-dup
    # Hamming range of 6.png's (pinned in MultimodalJpegSpec).
    os.makedirs(DIR2, exist_ok=True)
    write_jpeg_gray(os.path.join(DIR2, "7.jpg"), 12, 7, rows6, quality=88)
    # 8.jpg: 24x16 grayscale, smooth two-axis gradient with a soft
    # bump — distinct content at a multi-block size with real AC
    # coefficients in every block.
    rows8 = [[min(255, 8 * x + 5 * y + (60 if (x - 12) ** 2 + (y - 8) ** 2 < 20 else 0))
              for x in range(24)] for y in range(16)]
    write_jpeg_gray(os.path.join(DIR2, "8.jpg"), 24, 16, rows8, quality=75)
    # 9.mp3: structurally-valid MPEG-1 Layer III frames (44.1 kHz mono
    # 128 kbps) — the header-metadata fixture; no audio payload.
    write_mp3(os.path.join(DIR2, "9.mp3"))


# ---------- report ----------

def main():
    if len(sys.argv) > 1 and sys.argv[1] == "gen":
        generate()
        print("fixtures written")
        return
    import hashlib
    entries = [(DIR, n) for n in sorted(os.listdir(DIR))]
    if os.path.isdir(DIR2):
        entries += [(DIR2, n) for n in sorted(os.listdir(DIR2))]
    for d, name in entries:
        path = os.path.join(d, name)
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
        elif kind == "mp3":
            ch, rate, frames = mp3_meta(b)
            print(f"  meta: mp3 ch={ch} rate={rate} frames={frames} bytes={len(b)}")
            continue
        elif kind == "jpg":
            ch, vals, w, h = jpeg_pixels(b)
            print(f"  meta: jpeg w={w} h={h} ch={ch}")
            print(f"  dhash: {dhash(ch, vals, w, h)}")
            # near-dup recovery pin: Hamming distance to 6.png (7.jpg
            # is its lossy re-encode; 8.jpg is unrelated content)
            with open(os.path.join(DIR, "6.png"), "rb") as f6:
                c6, v6, w6, h6, _ = png_pixels(f6.read())
            hd = bin((dhash(c6, v6, w6, h6) ^ dhash(ch, vals, w, h)) & MASK).count("1")
            print(f"  hamming vs 6.png: {hd}")
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
