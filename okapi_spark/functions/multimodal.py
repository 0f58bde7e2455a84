"""Multimodal column plumbing: image/audio/video as opaque binary.

The container has no codec libraries (PIL/libjpeg/ffmpeg), so decode
support splits honestly by what pure stdlib+NumPy can do: REAL
end-to-end decode for OKPX/OKPA (the repo's raw containers), PNG
(stdlib zlib inflate + scanline unfiltering — 8-bit gray/RGB/GA/RGBA,
non-interlaced), sequential AND progressive JPEG (ITU-T T.81: Huffman
entropy decode incl. Annex G spectral selection / successive
approximation + batched-NumPy dequant/IDCT, integer chroma
subsampling, restart markers), uncompressed 24/32-bit BMP, binary
netpbm (P5/P6), RIFF/WAVE PCM16, and the OKPV raw video container
(with byte-offset frame sampling and pure-NumPy resize); formats that
genuinely require a codec library (arithmetic-coded JPEG, WebP, MP3,
OGG, inter-coded H.264/VP9 video) raise the NotImplementedError stub
where the production codec would slot in.
The Spark-side plumbing is real
and tested either way: typed binary+metadata schema, Arrow-batched
``mapInPandas`` with bounded batch sizes, no driver collect, and a
schema-stable feature-table contract.

OKPX (image): b"OKPX" | u8 version | u16le width | u16le height |
u8 channels | raw uint8 pixels, row-major H*W*C.
OKPA (audio): b"OKPA" | u8 version | u32le sample_rate |
u32le n_samples | raw int16le PCM mono samples.
OKPV (video): b"OKPV" | u8 version | u16le width | u16le height |
u8 channels | u16le n_frames | u8 fps | raw uint8 frames, row-major
N*H*W*C. Fixed frame size means ``sample_frames`` can slice frame k
from the byte buffer WITHOUT decoding the rest — the scale-relevant
property a real container gets from its keyframe index.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
        T.StructField("payload", T.BinaryType(), True),  # opaque bytes
    ]
)

FEATURE_SCHEMA = "media_id long, n_bytes int, sha256 string, feature array<float>"

_IMG_MAGIC = b"OKPX"
_AUD_MAGIC = b"OKPA"
_VID_MAGIC = b"OKPV"


def encode_image(pixels: np.ndarray) -> bytes:
    """Pack an HxWxC (or HxW) uint8 array into the OKPX container."""
    arr = np.ascontiguousarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    return _IMG_MAGIC + struct.pack("<BHHB", 1, w, h, c) + arr.tobytes()


def _decode_png(payload: bytes) -> np.ndarray:
    """Pure stdlib-zlib + NumPy PNG decode (the format is public spec:
    RFC 2083). Supports the bulk of real-world PNGs: 8-bit depth, color
    types 0 (gray), 2 (RGB), 4 (gray+alpha), 6 (RGBA), non-interlaced.
    The DEFLATE stream is stdlib ``zlib``; scanline unfiltering is
    NumPy — fully vectorized for filters None/Up, per-pixel for
    Sub/Average/Paeth (intra-row data dependency). Production clusters
    would swap a libpng/PIL decoder into the same slot; this path makes
    the decode→featurize pipeline REAL for PNG with zero external
    libraries."""
    import zlib

    if len(payload) < 8 + 25:
        raise ValueError(f"PNG truncated: {len(payload)} bytes")
    pos, ihdr, idat = 8, None, []
    while pos + 8 <= len(payload):
        (length,), ctype = struct.unpack_from(">I", payload, pos), payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        if len(data) != length:
            raise ValueError("PNG chunk truncated")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + data + crc
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, color, comp, filt, interlace = ihdr
    channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(color)
    if depth != 8 or channels is None or comp != 0 or filt != 0 or interlace != 0:
        raise NotImplementedError(
            f"PNG variant not supported by the built-in decoder "
            f"(depth={depth}, color={color}, interlace={interlace}); "
            "wire libpng/PIL here for exotic profiles"
        )
    raw = zlib.decompress(b"".join(idat))
    stride = w * channels
    if len(raw) != h * (stride + 1):
        raise ValueError(f"PNG scanline data {len(raw)} != {h}*({stride}+1)")
    raw = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    ftypes, rows = raw[:, 0], raw[:, 1:].astype(np.int16)
    out = np.zeros((h, stride), dtype=np.uint8)
    bpp = channels
    for y in range(h):
        f, cur = int(ftypes[y]), rows[y]
        prev = out[y - 1].astype(np.int16) if y else np.zeros(stride, dtype=np.int16)
        if f == 0:          # None
            line = cur
        elif f == 2:        # Up
            line = cur + prev
        else:               # Sub/Average/Paeth: left-neighbor dependency
            line = np.zeros(stride, dtype=np.int16)
            for x in range(stride):
                # a/b/c are RECONSTRUCTED bytes — mask each sum back to
                # [0,256) immediately, or later left-references see the
                # unreduced int16 accumulation
                a = int(line[x - bpp]) if x >= bpp else 0      # left (recon)
                b = int(prev[x])                               # up
                if f == 1:      # Sub
                    line[x] = (cur[x] + a) & 0xFF
                elif f == 3:    # Average
                    line[x] = (cur[x] + ((a + b) >> 1)) & 0xFF
                elif f == 4:    # Paeth
                    c = int(prev[x - bpp]) if x >= bpp else 0  # up-left
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    line[x] = (cur[x] + pred) & 0xFF
                else:
                    raise ValueError(f"PNG filter type {f} invalid")
        out[y] = (line & 0xFF).astype(np.uint8)
    return out.reshape(h, w, channels)


def _decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24/32-bit BITMAPINFOHEADER BMP -> HxWx3 uint8
    (BGR storage order converted to RGB; bottom-up or top-down rows)."""
    if len(payload) < 54:
        raise ValueError(f"BMP truncated: {len(payload)} bytes")
    data_off, hdr_size = struct.unpack_from("<I", payload, 10)[0], struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        raise NotImplementedError(f"BMP header size {hdr_size} not supported")
    w, h_signed = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if compression != 0 or bpp not in (24, 32):
        raise NotImplementedError(f"BMP bpp={bpp}/compression={compression} not supported")
    h = abs(h_signed)
    nbytes = bpp // 8
    stride = (w * nbytes + 3) & ~3  # rows padded to 4 bytes
    need = data_off + stride * h
    if len(payload) < need:
        raise ValueError(f"BMP pixel data truncated: {len(payload)} < {need}")
    rows = np.frombuffer(payload, dtype=np.uint8, count=stride * h, offset=data_off)
    px = rows.reshape(h, stride)[:, : w * nbytes].reshape(h, w, nbytes)
    if h_signed > 0:
        px = px[::-1]  # bottom-up storage
    return px[:, :, 2::-1].copy()  # BGR(A) -> RGB


def _decode_pnm(payload: bytes) -> np.ndarray:
    """Binary netpbm: P5 (gray) / P6 (RGB), maxval <= 255."""
    parts, pos = [], 2
    while len(parts) < 3 and pos < len(payload):
        while pos < len(payload) and payload[pos:pos + 1].isspace():
            pos += 1
        if payload[pos:pos + 1] == b"#":  # comment to end of line
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        tok = b""
        while pos < len(payload) and not payload[pos:pos + 1].isspace():
            tok += payload[pos:pos + 1]
            pos += 1
        parts.append(tok)
    if len(parts) < 3:
        raise ValueError("PNM header truncated")
    w, h, maxval = int(parts[0]), int(parts[1]), int(parts[2])
    if maxval > 255:
        raise NotImplementedError("16-bit PNM not supported")
    pos += 1  # single whitespace after maxval
    c = 1 if payload[:2] == b"P5" else 3
    body = np.frombuffer(payload, dtype=np.uint8, offset=pos)
    if body.size < h * w * c:
        raise ValueError(f"PNM body truncated: {body.size} < {h}*{w}*{c}")
    return body[: h * w * c].reshape(h, w, c)


# --- JPEG, sequential + progressive (ITU-T T.81, public spec) ----------
# Zigzag scan order generated from the spec's diagonal traversal rather
# than transcribed, so it cannot be mistyped: natural index of the i-th
# zigzag position.
_ZIGZAG = np.array(
    [
        x * 8 + (s - x)
        for s in range(15)
        for x in (
            reversed(range(max(0, s - 7), min(s, 7) + 1))
            if s % 2 == 0
            else range(max(0, s - 7), min(s, 7) + 1)
        )
    ],
    dtype=np.int64,
)

# Orthonormal 8-point DCT-II basis: row k = alpha(k) cos((2n+1)k pi/16).
_DCT_C = np.array(
    [
        [
            (np.sqrt(1 / 8) if k == 0 else np.sqrt(2 / 8))
            * np.cos((2 * n + 1) * k * np.pi / 16)
            for n in range(8)
        ]
        for k in range(8)
    ]
)


def _jpeg_huff_lut(bits: bytes, vals: bytes) -> dict[tuple[int, int], int]:
    """Canonical Huffman (T.81 Annex C): (code_length, code) -> symbol."""
    lut, code, i = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            lut[(length, code)] = vals[i]
            code += 1
            i += 1
        code <<= 1
    return lut


def _jpeg_read_huff(bits: np.ndarray, pos: int, lut: dict) -> tuple[int, int]:
    code = 0
    for length in range(1, 17):
        if pos >= bits.size:
            raise ValueError("JPEG entropy stream truncated mid-code")
        code = (code << 1) | int(bits[pos])
        pos += 1
        sym = lut.get((length, code))
        if sym is not None:
            return sym, pos
    raise ValueError("invalid JPEG Huffman code")


def _jpeg_receive_bits(bits: np.ndarray, pos: int, t: int) -> tuple[int, int]:
    """T.81 F.2.2.1 RECEIVE: t raw bits -> unsigned value."""
    if pos + t > bits.size:
        raise ValueError("JPEG entropy stream truncated mid-magnitude")
    v = 0
    for _ in range(t):
        v = (v << 1) | int(bits[pos])
        pos += 1
    return v, pos


def _jpeg_receive_extend(bits: np.ndarray, pos: int, t: int) -> tuple[int, int]:
    """T.81 F.2.2.1 RECEIVE + EXTEND: t magnitude bits -> signed value."""
    if t == 0:
        return 0, pos
    v, pos = _jpeg_receive_bits(bits, pos, t)
    if v < (1 << (t - 1)):
        v -= (1 << t) - 1
    return v, pos


def _jpeg_split_entropy(payload: bytes, pos: int) -> tuple[list[bytes], int]:
    """Split one scan's entropy-coded bytes into restart intervals,
    unstuffing 0xFF00 as we go (T.81 B.1.1.5). Returns the intervals
    and the offset of the marker that terminated the scan."""
    intervals, cur, i = [], bytearray(), pos
    while i < len(payload):
        b = payload[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        nb = payload[i + 1] if i + 1 < len(payload) else 0xD9
        if nb == 0x00:
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= nb <= 0xD7:
            intervals.append(bytes(cur))
            cur = bytearray()
            i += 2
        elif nb == 0xFF:
            i += 1
        else:  # EOI or next real marker ends the scan
            break
    intervals.append(bytes(cur))
    return intervals, i


def _jpeg_ac_first_block(block, bits, bpos, ac_lut, ss, se, al, eobrun):
    """Progressive AC initial scan, one block (T.81 G.1.2.2): run-length
    coded band [Ss..Se] at approximation Al, with EOB-run coding."""
    if eobrun > 0:
        return bpos, eobrun - 1
    k = ss
    while k <= se:
        rs, bpos = _jpeg_read_huff(bits, bpos, ac_lut)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r < 15:
                eobrun = (1 << r) - 1
                if r:
                    v, bpos = _jpeg_receive_bits(bits, bpos, r)
                    eobrun += v
                break
            k += 16  # ZRL
            continue
        k += r
        if k > se:
            raise ValueError("JPEG progressive AC index overrun")
        v, bpos = _jpeg_receive_extend(bits, bpos, s)
        block[k] = v << al
        k += 1
    return bpos, eobrun


def _jpeg_ac_refine_block(block, bits, bpos, ac_lut, ss, se, al, eobrun):
    """Progressive AC refinement scan, one block (T.81 G.1.2.3): one
    correction bit per already-nonzero coefficient, run-length codes
    for newly-nonzero ones. Python's infinite-two's-complement ``&``
    matches the spec's bit tests on negative coefficients."""
    p1, m1 = 1 << al, -1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs, bpos = _jpeg_read_huff(bits, bpos, ac_lut)
            r, s = rs >> 4, rs & 0xF
            sval = 0
            if s == 0:
                if r < 15:
                    # NOT (1<<r)-1: the current block is the first block
                    # of the EOB run and still consumes its correction
                    # bits below, where the run is decremented
                    eobrun = 1 << r
                    if r:
                        v, bpos = _jpeg_receive_bits(bits, bpos, r)
                        eobrun += v
                    break
                # r == 15: pass over 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError("JPEG AC refinement symbol with s > 1")
                b, bpos = _jpeg_receive_bits(bits, bpos, 1)
                sval = p1 if b else m1
            while k <= se:
                if block[k] != 0:
                    b, bpos = _jpeg_receive_bits(bits, bpos, 1)
                    if b and not (int(block[k]) & p1):
                        block[k] += p1 if block[k] > 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if sval:
                if k > se:
                    raise ValueError("JPEG AC refinement overrun")
                block[k] = sval
            k += 1
    if eobrun > 0:
        # EOB block: still carries correction bits for nonzero history
        while k <= se:
            if block[k] != 0:
                b, bpos = _jpeg_receive_bits(bits, bpos, 1)
                if b and not (int(block[k]) & p1):
                    block[k] += p1 if block[k] > 0 else m1
            k += 1
        eobrun -= 1
    return bpos, eobrun


def _jpeg_progressive_scan(scan, comps, coefs, hmax, vmax, mcus_x, mcus_y, h_img, w_img):
    """Decode one progressive scan (T.81 Annex G) into the per-component
    coefficient arrays. DC scans (Ss=0) may be interleaved; AC scans are
    single-component and walk the component's own block raster."""
    scan_comps, ss, se, ah, al, intervals, huff, dri = scan
    interleaved = len(scan_comps) > 1
    if ss == 0 and se != 0:
        raise ValueError("JPEG progressive DC scan with Se != 0")
    if ss > 0 and interleaved:
        raise ValueError("JPEG progressive AC scan must be single-component")
    if interleaved:
        units = mcus_x * mcus_y
        bw_ = bh_ = 0
    else:
        ci0 = scan_comps[0][0]
        _cid, ch, cv, _tq = comps[ci0]
        bw_ = -(-(-(-w_img * ch // hmax)) // 8)  # ceil(comp_w / 8)
        bh_ = -(-(-(-h_img * cv // vmax)) // 8)
        units = bw_ * bh_
    luts = []
    for ci, td, ta in scan_comps:
        lut = huff.get((0, td)) if ss == 0 else huff.get((1, ta))
        # DC refinement (Ss=0, Ah>0) reads raw bits only — no table needed
        if lut is None and not (ss == 0 and ah > 0):
            raise ValueError("JPEG scan references undefined Huffman table")
        luts.append(lut)
    bits = np.unpackbits(np.frombuffer(intervals[0], np.uint8))
    bpos, iidx = 0, 0
    preds = [0] * len(comps)
    eobrun = 0
    for u in range(units):
        if dri and u and u % dri == 0:
            iidx += 1
            if iidx >= len(intervals):
                raise ValueError("JPEG restart interval data missing")
            bits = np.unpackbits(np.frombuffer(intervals[iidx], np.uint8))
            bpos, preds, eobrun = 0, [0] * len(comps), 0
        if ss == 0:  # DC scan
            if interleaved:
                my, mx = divmod(u, mcus_x)
                targets = []
                for si, (ci, _td, _ta) in enumerate(scan_comps):
                    _cid, ch, cv, _tq = comps[ci]
                    for by in range(cv):
                        for bx in range(ch):
                            targets.append(
                                (si, ci, coefs[ci][my * cv + by, mx * ch + bx])
                            )
            else:
                si, ci = 0, scan_comps[0][0]
                by, bx = divmod(u, bw_)
                targets = [(si, ci, coefs[ci][by, bx])]
            for si, ci, block in targets:
                if ah == 0:
                    t, bpos = _jpeg_read_huff(bits, bpos, luts[si])
                    diff, bpos = _jpeg_receive_extend(bits, bpos, t)
                    preds[ci] += diff
                    block[0] = preds[ci] << al
                else:  # DC refinement: one raw bit
                    b, bpos = _jpeg_receive_bits(bits, bpos, 1)
                    if b:
                        block[0] |= 1 << al
        else:  # AC scan, single component
            by, bx = divmod(u, bw_)
            block = coefs[scan_comps[0][0]][by, bx]
            if ah == 0:
                bpos, eobrun = _jpeg_ac_first_block(
                    block, bits, bpos, luts[0], ss, se, al, eobrun
                )
            else:
                bpos, eobrun = _jpeg_ac_refine_block(
                    block, bits, bpos, luts[0], ss, se, al, eobrun
                )


def _decode_jpeg(payload: bytes) -> np.ndarray:
    """Pure stdlib+NumPy JPEG decode (the format is the public ITU-T
    T.81 spec). Covers the Huffman DCT processes: baseline/extended
    sequential (SOF0/SOF1) and progressive (SOF2, spectral selection
    AND successive approximation, T.81 Annex G) — 8-bit precision,
    tables read from DHT (any conformant table set works, not just
    Annex K), 1- or 3-component scans, integer chroma subsampling
    (4:4:4 / 4:2:2 / 4:2:0 / ...), 8- and 16-bit DQT precision, and
    DRI/RSTn restart intervals. Entropy decoding is per-symbol Python
    (inherent bit serialism); dequantization, de-zigzag, and the 2-D
    IDCT are batched NumPy over ALL blocks at once (einsum on the
    orthonormal DCT basis). Arithmetic coding, 12-bit, lossless, and
    CMYK raise NotImplementedError — libjpeg-turbo slots in here for
    those profiles on a production image."""
    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    sof = None  # (H, W, [(comp_id, h, v, tq), ...])
    progressive = False
    dri = 0
    # (scan_comps, ss, se, ah, al, intervals, huff-snapshot, dri) per
    # SOS; huff/dri are snapshotted because later DHT/DRI segments may
    # redefine them between scans (T.81 B.2.4)
    scans: list[tuple] = []
    pos = 2
    while pos + 2 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"JPEG marker expected at byte {pos}")
        marker = payload[pos + 1]
        if marker == 0xFF:  # fill byte
            pos += 1
            continue
        if marker == 0xD9:  # EOI
            break
        pos += 2
        if 0xD0 <= marker <= 0xD7 or marker == 0x01:  # RST/TEM: no segment body
            continue
        if pos + 2 > len(payload):
            raise ValueError("JPEG segment length truncated")
        seg_len = struct.unpack_from(">H", payload, pos)[0]
        seg = payload[pos + 2 : pos + seg_len]
        if len(seg) != seg_len - 2:
            raise ValueError("JPEG segment body truncated")
        if marker == 0xDB:  # DQT
            off = 0
            while off < len(seg):
                pq, tq = seg[off] >> 4, seg[off] & 0xF
                off += 1
                if pq == 0:
                    tbl = np.frombuffer(seg, np.uint8, 64, off).astype(np.int64)
                    off += 64
                else:
                    tbl = np.frombuffer(seg, ">u2", 64, off).astype(np.int64)
                    off += 128
                qt[tq] = tbl  # zigzag order, as stored
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 sequential, SOF2 progressive
            prec, h_img, w_img, ncomp = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise NotImplementedError(f"JPEG precision {prec} needs libjpeg")
            progressive = marker == 0xC2
            if len(seg) < 6 + 3 * ncomp:
                raise ValueError("JPEG SOF component list truncated")
            comps = []
            for i in range(ncomp):
                cid, hv, tq = struct.unpack_from(">BBB", seg, 6 + 3 * i)
                comps.append((cid, hv >> 4, hv & 0xF, tq))
            sof = (h_img, w_img, comps)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only Huffman sequential (SOF0/SOF1) and progressive (SOF2) "
                "JPEG are built in; arithmetic/lossless/hierarchical "
                "profiles need libjpeg"
            )
        elif marker == 0xC4:  # DHT
            off = 0
            while off < len(seg):
                tc, th = seg[off] >> 4, seg[off] & 0xF
                bits16 = seg[off + 1 : off + 17]
                nvals = sum(bits16)
                vals = seg[off + 17 : off + 17 + nvals]
                if len(bits16) != 16 or len(vals) != nvals:
                    raise ValueError("JPEG DHT truncated")
                huff[(tc, th)] = _jpeg_huff_lut(bits16, vals)
                off += 17 + nvals
        elif marker == 0xDD:  # DRI
            dri = struct.unpack_from(">H", seg, 0)[0]
        elif marker == 0xDA:  # SOS
            if sof is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            comp_ids = [c[0] for c in sof[2]]
            scan_comps = []
            for i in range(ns):
                cs, tdta = seg[1 + 2 * i], seg[2 + 2 * i]
                scan_comps.append((comp_ids.index(cs), tdta >> 4, tdta & 0xF))
            ss, se, ahal = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
            intervals, pos = _jpeg_split_entropy(payload, pos + seg_len)
            scans.append(
                (scan_comps, ss, se, ahal >> 4, ahal & 0xF, intervals, dict(huff), dri)
            )
            continue  # pos already sits on the scan-terminating marker
        pos += seg_len
    if sof is None or not scans:
        raise ValueError("JPEG missing SOF/SOS")
    h_img, w_img, comps = sof
    if len(comps) not in (1, 3):
        raise NotImplementedError(
            f"{len(comps)}-component JPEG (CMYK/unknown) needs libjpeg"
        )
    if not progressive and (len(scans) != 1 or len(scans[0][0]) != len(comps)):
        raise NotImplementedError("multi-scan sequential JPEG needs libjpeg")

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-w_img // (8 * hmax))
    mcus_y = -(-h_img // (8 * vmax))
    n_mcus = mcus_x * mcus_y
    # Raw (still-quantized, zigzag-order) coefficients per component.
    coefs = [
        np.zeros((mcus_y * v, mcus_x * h, 64), dtype=np.int64)
        for (_cid, h, v, _tq) in comps
    ]
    if progressive:
        for scan in scans:
            _jpeg_progressive_scan(
                scan, comps, coefs, hmax, vmax, mcus_x, mcus_y, h_img, w_img
            )
    else:
        scan_comps, _ss, _se, _ah, _al, intervals, shuff, sdri = scans[0]
        bits = np.unpackbits(np.frombuffer(intervals[0], np.uint8))
        bpos, interval_idx = 0, 0
        preds = [0] * len(comps)
        for m in range(n_mcus):
            if sdri and m and m % sdri == 0:
                interval_idx += 1
                if interval_idx >= len(intervals):
                    raise ValueError("JPEG restart interval data missing")
                bits = np.unpackbits(np.frombuffer(intervals[interval_idx], np.uint8))
                bpos, preds = 0, [0] * len(comps)
            my, mx = divmod(m, mcus_x)
            for ci, td, ta in scan_comps:
                _cid, ch, cv, _tq = comps[ci]
                dc_lut, ac_lut = shuff.get((0, td)), shuff.get((1, ta))
                if dc_lut is None or ac_lut is None:
                    raise ValueError("JPEG scan references undefined Huffman table")
                for by in range(cv):
                    for bx in range(ch):
                        block = coefs[ci][my * cv + by, mx * ch + bx]
                        t, bpos = _jpeg_read_huff(bits, bpos, dc_lut)
                        diff, bpos = _jpeg_receive_extend(bits, bpos, t)
                        preds[ci] += diff
                        block[0] = preds[ci]
                        k = 1
                        while k < 64:
                            rs, bpos = _jpeg_read_huff(bits, bpos, ac_lut)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if rs == 0xF0:  # ZRL: 16 zeros
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("JPEG AC index overrun")
                            block[k], bpos = _jpeg_receive_extend(bits, bpos, s)
                            k += 1

    # Dequantize + de-zigzag + batched IDCT per component, then
    # upsample to full resolution.
    planes = []
    for (_cid, ch, cv, tq), zz in zip(comps, coefs):
        if tq not in qt:
            raise ValueError(f"JPEG quant table {tq} undefined")
        if hmax % ch or vmax % cv:
            raise NotImplementedError(
                f"non-integer sampling ratio {ch}x{cv} vs {hmax}x{vmax}"
            )
        rows, cols = zz.shape[0], zz.shape[1]
        deq = (zz.reshape(-1, 64) * qt[tq][None, :]).astype(np.float64)
        nat = np.zeros_like(deq)
        nat[:, _ZIGZAG] = deq
        freq = nat.reshape(-1, 8, 8)
        spatial = np.einsum("ij,bjk,kl->bil", _DCT_C.T, freq, _DCT_C) + 128.0
        plane = (
            spatial.reshape(rows, cols, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(rows * 8, cols * 8)
        )
        comp_h = -(-h_img * cv // vmax)
        comp_w = -(-w_img * ch // hmax)
        plane = plane[:comp_h, :comp_w]
        plane = np.repeat(np.repeat(plane, vmax // cv, axis=0), hmax // ch, axis=1)
        planes.append(plane[:h_img, :w_img])
    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)[:, :, None]
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def decode_image(payload: bytes) -> np.ndarray:
    """bytes -> HxWxC uint8. REAL decode, pure NumPy/stdlib, for: the
    OKPX raw container, PNG (stdlib zlib inflate + scanline
    unfiltering), sequential and progressive Huffman JPEG
    (batched-NumPy IDCT), uncompressed 24/32-bit BMP, and binary
    netpbm (P5/P6). Formats that genuinely require a codec library
    (arithmetic JPEG, WebP, ...) raise the documented stub —
    libjpeg/PIL slots in here on a production image."""
    if payload is not None and payload[:4] == _IMG_MAGIC:
        if len(payload) < 10:  # magic(4) + <BHHB header(6)
            raise ValueError(f"OKPX header truncated: {len(payload)} bytes")
        ver, w, h, c = struct.unpack_from("<BHHB", payload, 4)
        if ver != 1:
            raise ValueError(f"OKPX version {ver} not supported")
        body = np.frombuffer(payload, dtype=np.uint8, offset=10)
        if body.size != h * w * c:
            raise ValueError(f"OKPX payload truncated: {body.size} != {h}*{w}*{c}")
        return body.reshape(h, w, c)
    if payload is not None and payload[:8] == b"\x89PNG\r\n\x1a\n":
        return _decode_png(payload)
    if payload is not None and payload[:2] == b"\xff\xd8":
        return _decode_jpeg(payload)
    if payload is not None and payload[:2] == b"BM":
        return _decode_bmp(payload)
    if payload is not None and payload[:2] in (b"P5", b"P6"):
        return _decode_pnm(payload)
    raise NotImplementedError(
        "image decode for this format requires a codec library (e.g. "
        "libwebp for WebP) on the cluster image; built-in decoders "
        "cover OKPX/PNG/baseline-JPEG/BMP/PNM (signature: bytes -> HxWxC uint8)"
    )


def _decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """RIFF/WAVE PCM16 -> (rate, int16 mono samples); multi-channel
    input averages to mono. Pure struct/NumPy — WAV PCM is an
    uncompressed public container, no codec needed."""
    if len(payload) < 12 or payload[8:12] != b"WAVE":
        raise ValueError("WAV header truncated or not WAVE")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid, clen = payload[pos:pos + 4], struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8:pos + 8 + clen]
        if cid == b"fmt " and len(body) >= 16:
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, n_channels, rate, _byte_rate, _block_align, bits = fmt
    if audio_format != 1 or bits != 16 or n_channels < 1:
        raise NotImplementedError(
            f"WAV format={audio_format}/bits={bits} needs a codec library; "
            "built-in decode covers PCM16"
        )
    usable = len(data) - (len(data) % (2 * n_channels))
    samples = np.frombuffer(data[:usable], dtype="<i2")
    if n_channels > 1:
        samples = samples.reshape(-1, n_channels).mean(axis=1).astype("<i2")
    return rate, samples


def decode_audio(payload: bytes) -> tuple[int, np.ndarray]:
    """bytes -> (sample_rate, int16 mono samples). REAL decode for the
    OKPA raw container and RIFF/WAVE PCM16; compressed audio
    (mp3/ogg/...) raises the codec stub (ffmpeg/libsndfile slot)."""
    if payload is not None and payload[:4] == _AUD_MAGIC:
        if len(payload) < 13:  # magic(4) + <BII header(9)
            raise ValueError(f"OKPA header truncated: {len(payload)} bytes")
        ver, rate, n = struct.unpack_from("<BII", payload, 4)
        if ver != 1:
            raise ValueError(f"OKPA version {ver} not supported")
        body_bytes = len(payload) - 13
        if body_bytes % 2 or body_bytes != 2 * n:
            raise ValueError(f"OKPA payload truncated: {body_bytes} body bytes != 2*{n}")
        samples = np.frombuffer(payload, dtype="<i2", offset=13)
        return rate, samples
    if payload is not None and payload[:4] == b"RIFF":
        return _decode_wav(payload)
    raise NotImplementedError(
        "compressed audio decode requires ffmpeg/libsndfile on the cluster "
        "image; built-in decoders cover OKPA/WAV-PCM16"
    )


def encode_video(frames: np.ndarray, fps: int = 8) -> bytes:
    """Pack an NxHxWxC (or NxHxW) uint8 frame stack into the OKPV
    container."""
    arr = np.ascontiguousarray(frames, dtype=np.uint8)
    if arr.ndim == 3:
        arr = arr[:, :, :, None]
    n, h, w, c = arr.shape
    return _VID_MAGIC + struct.pack("<BHHBHB", 1, w, h, c, n, fps) + arr.tobytes()


def _vid_header(payload: bytes) -> tuple[int, int, int, int, int]:
    """Validated OKPV header -> (w, h, c, n_frames, fps)."""
    if len(payload) < 13:  # magic(4) + <BHHBHB header(9)
        raise ValueError(f"OKPV header truncated: {len(payload)} bytes")
    ver, w, h, c, n, fps = struct.unpack_from("<BHHBHB", payload, 4)
    if ver != 1:
        raise ValueError(f"OKPV version {ver} not supported")
    if len(payload) - 13 != n * h * w * c:
        raise ValueError(
            f"OKPV payload truncated: {len(payload) - 13} body bytes != {n}*{h}*{w}*{c}"
        )
    return w, h, c, n, fps


def decode_video(payload: bytes) -> tuple[int, np.ndarray]:
    """bytes -> (fps, NxHxWxC uint8 frames). REAL decode for the OKPV
    raw container; inter-coded formats (H.264/VP9/AV1) raise the
    codec stub (ffmpeg slots in here on a production image)."""
    if payload is not None and payload[:4] == _VID_MAGIC:
        w, h, c, n, fps = _vid_header(payload)
        body = np.frombuffer(payload, dtype=np.uint8, offset=13)
        return fps, body.reshape(n, h, w, c)
    raise NotImplementedError(
        "compressed video decode requires ffmpeg on the cluster image; "
        "built-in decode covers the OKPV raw container"
    )


def sample_frames(payload: bytes, every: int = 1, limit: int | None = None) -> tuple[int, np.ndarray]:
    """(fps, KxHxWxC uint8) taking every ``every``-th frame, at most
    ``limit``. Only the SAMPLED frames are materialized: fixed frame
    size makes each frame a known byte slice, so a 1000-frame clip
    sampled at every=100 touches 10 frames' bytes — the access
    pattern a production pipeline needs when payloads are large and
    the batch is Arrow-bounded."""
    if payload is None or payload[:4] != _VID_MAGIC:
        raise NotImplementedError(
            "frame sampling for compressed video requires ffmpeg; "
            "built-in support covers the OKPV raw container"
        )
    w, h, c, n, fps = _vid_header(payload)
    if every < 1:
        raise ValueError(f"every must be >= 1, got {every}")
    idx = range(0, n, every) if limit is None else list(range(0, n, every))[:limit]
    fsz = h * w * c
    frames = [
        np.frombuffer(payload, dtype=np.uint8, count=fsz, offset=13 + k * fsz).reshape(h, w, c)
        for k in idx
    ]
    stacked = np.stack(frames) if frames else np.empty((0, h, w, c), dtype=np.uint8)
    return fps, stacked


def resize_image(px: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """HxWxC uint8 -> out_h x out_w x C, pure NumPy. Downscale by an
    integer factor uses area averaging (the quality-relevant case for
    feature pipelines: 4K -> thumbnail); everything else is
    nearest-neighbor index gather. Both are vectorized — no per-pixel
    Python."""
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, _c = px.shape
    if out_h < 1 or out_w < 1:
        raise ValueError(f"resize target must be positive, got {out_h}x{out_w}")
    if h % out_h == 0 and w % out_w == 0:
        fh, fw = h // out_h, w // out_w
        area = px.reshape(out_h, fh, out_w, fw, px.shape[2]).astype(np.float32)
        return np.round(area.mean(axis=(1, 3))).clip(0, 255).astype(np.uint8)
    yi = (np.arange(out_h) * h) // out_h
    xi = (np.arange(out_w) * w) // out_w
    return px[yi][:, xi]


def _synth_payload(media_id: int, kind: str, seed: int) -> tuple[bytes, int, int, int]:
    """Deterministic raw payload for one media row:
    (payload, width, height, duration_ms)."""
    rng = np.random.RandomState((media_id * 2654435761 + seed) & 0x7FFFFFFF)
    if kind == "image":
        w = 8 + int(media_id) % 9
        h = 6 + (int(media_id) // 3) % 7
        px = rng.randint(0, 256, size=(h, w, 3), dtype=np.int64).astype(np.uint8)
        return encode_image(px), w, h, 0
    if kind == "audio":
        rate, n = 8000, 800 + int(media_id) % 400
        samples = rng.randint(-(2**15), 2**15, size=n, dtype=np.int64).astype("<i2")
        payload = _AUD_MAGIC + struct.pack("<BII", 1, rate, n) + samples.tobytes()
        return payload, 0, 0, int(n * 1000 / rate)
    if kind == "video" and media_id % 4 != 3:
        w = 6 + int(media_id) % 5
        h = 4 + (int(media_id) // 5) % 5
        n, fps = 6 + int(media_id) % 11, 8
        frames = rng.randint(0, 256, size=(n, h, w, 3), dtype=np.int64).astype(np.uint8)
        return encode_video(frames, fps=fps), w, h, int(n * 1000 / fps)
    # every 4th video row stays a genuinely opaque blob (a compressed
    # codec the container can't decode) — keeps the stub/fallback path
    # exercised end-to-end alongside the real OKPV decode
    blob = hashlib.sha256(f"payload:{media_id}:{seed}".encode()).digest()
    return blob, 0, 0, 0


def synthesize_media(spark, n: int = 256, seed: int = 42) -> DataFrame:
    """Deterministic fake media table. image/audio rows carry REAL
    decodable payloads in the OKPX/OKPA raw containers; 3 of 4 video
    rows carry decodable OKPV clips, every 4th stays an opaque blob so
    the codec-stub fallback path is exercised alongside the real
    decode. Generated distributed via mapInPandas — no driver-side
    materialization."""

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        kinds = ["image", "audio", "video"]
        for pdf in it:
            rows = []
            for mid in pdf["id"]:
                mid = int(mid)
                kind = kinds[hash_kind(mid, seed)]
                payload, w, h, dur = _synth_payload(mid, kind, seed)
                rows.append(
                    (
                        mid,
                        kind,
                        "application/octet-stream",
                        w or None,
                        h or None,
                        dur or None,
                        payload,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "kind",
                    "mime",
                    "width",
                    "height",
                    "duration_ms",
                    "payload",
                ],
            )

    return spark.range(0, n).mapInPandas(gen, schema=MEDIA_SCHEMA)


def hash_kind(media_id: int, seed: int) -> int:
    """Deterministic 0/1/2 kind index (stable across Python runs)."""
    return int(hashlib.sha256(f"kind:{media_id}:{seed}".encode()).digest()[0]) % 3


def _image_feature(px: np.ndarray, feature_dim: int) -> np.ndarray:
    """Real pixel-derived feature: per-channel mean/std then a coarse
    luminance histogram filling the remaining dims. Vectorized NumPy
    over the decoded array."""
    flat = px.reshape(-1, px.shape[2]).astype(np.float32)
    stats = np.concatenate([flat.mean(axis=0), flat.std(axis=0)]) / 255.0
    lum = flat.mean(axis=1)
    nbins = max(1, feature_dim - stats.size)
    hist, _ = np.histogram(lum, bins=nbins, range=(0.0, 255.0))
    hist = hist.astype(np.float32) / max(1, lum.size)
    feat = np.concatenate([stats, hist])[:feature_dim]
    return np.pad(feat, (0, feature_dim - feat.size)).astype(np.float32)


def _audio_feature(rate: int, samples: np.ndarray, feature_dim: int) -> np.ndarray:
    x = samples.astype(np.float32) / 2**15
    base = np.array(
        [x.mean(), x.std(), np.abs(x).max(), rate / 48000.0], dtype=np.float32
    )
    nbins = max(1, feature_dim - base.size)
    hist, _ = np.histogram(x, bins=nbins, range=(-1.0, 1.0))
    hist = hist.astype(np.float32) / max(1, x.size)
    feat = np.concatenate([base, hist])[:feature_dim]
    return np.pad(feat, (0, feature_dim - feat.size)).astype(np.float32)


def _video_feature(fps: int, frames: np.ndarray, feature_dim: int) -> np.ndarray:
    """Pixel-derived video feature over SAMPLED frames: the mean of
    the per-frame image features, with the last dim replaced by
    motion energy (mean |Δ| between consecutive sampled frames) when
    feature_dim allows — a static clip and a noise clip with the same
    color stats separate on that dim."""
    if frames.shape[0] == 0:
        return np.zeros(feature_dim, dtype=np.float32)
    per_frame = np.stack([_image_feature(f, feature_dim) for f in frames])
    feat = per_frame.mean(axis=0).astype(np.float32)
    if feature_dim >= 5 and frames.shape[0] > 1:
        deltas = np.abs(np.diff(frames.astype(np.float32), axis=0)) / 255.0
        feat[feature_dim - 1] = np.float32(deltas.mean())
    return feat


def _hash_feature(sha: str, feature_dim: int) -> np.ndarray:
    """Deterministic fallback vector of EXACTLY feature_dim floats —
    one sha256 digest yields 32 bytes, so larger dims re-hash with a
    block counter (keeps the feature column rectangular alongside the
    decoded rows, which always pad to feature_dim)."""
    buf = b""
    block = 0
    while len(buf) < feature_dim:
        buf += hashlib.sha256(f"{sha}#feat{block}".encode()).digest()
        block += 1
    return np.frombuffer(buf[:feature_dim], dtype=np.uint8).astype(np.float32) / 255.0


def extract_features(
    media: DataFrame, feature_dim: int = 8, batch_size: int = 1024
) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    Payloads in the OKPX/OKPA/OKPV raw containers are genuinely
    DECODED (pure NumPy) and featurized from pixels/samples/frames
    (video via byte-offset frame sampling — at most 8 frames of a
    clip touch memory); other payloads
    (where a real codec would run) fall back to a deterministic
    hash-derived vector so the pipeline shape stays total. The
    execution shape — ``mapInPandas`` with bounded batches, no driver
    collect, schema-stable output — is the production path a real
    extractor drops into."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            for start in range(0, len(pdf), batch_size):
                chunk = pdf.iloc[start : start + batch_size]
                payloads = chunk["payload"]
                shas, feats = [], []
                for p in payloads:
                    p = bytes(p) if p is not None else b""
                    shas.append(hashlib.sha256(p).hexdigest())
                    try:
                        if (
                            p[:4] == _IMG_MAGIC
                            or p[:8] == b"\x89PNG\r\n\x1a\n"
                            or p[:2] in (b"BM", b"P5", b"P6", b"\xff\xd8")
                        ):
                            feats.append(_image_feature(decode_image(p), feature_dim))
                        elif p[:4] == _AUD_MAGIC or p[:4] == b"RIFF":
                            feats.append(_audio_feature(*decode_audio(p), feature_dim))
                        elif p[:4] == _VID_MAGIC:
                            # at most 8 frames touch memory per clip —
                            # sample_frames slices by byte offset
                            _, _, _, nf, _ = _vid_header(p)
                            fps, fr = sample_frames(p, every=max(1, nf // 8), limit=8)
                            feats.append(_video_feature(fps, fr, feature_dim))
                        else:
                            feats.append(_hash_feature(shas[-1], feature_dim))
                    except (ValueError, struct.error, NotImplementedError):
                        # totality: an adversarial/truncated payload that
                        # merely carries the magic prefix must not fail
                        # the task — fall back like any undecodable blob
                        feats.append(_hash_feature(shas[-1], feature_dim))
                yield pd.DataFrame(
                    {
                        "media_id": chunk["media_id"].to_numpy(),
                        "n_bytes": [len(p or b"") for p in payloads],
                        "sha256": shas,
                        "feature": feats,
                    }
                )

    return media.select("media_id", "payload").mapInPandas(batches, schema=FEATURE_SCHEMA)


def resize_images(
    media: DataFrame, height: int, width: int, batch_size: int = 1024
) -> DataFrame:
    """Resize every decodable image payload to height x width,
    re-encoded as OKPX; rows whose payload isn't a decodable image
    (audio/video/opaque) pass through unchanged with their original
    metadata. Arrow-batched ``mapInPandas`` over the full MEDIA_SCHEMA
    — the thumbnail/normalize stage of a training-data pipeline, with
    the same bounded-batch no-collect execution shape as
    ``extract_features``."""

    cols = [f.name for f in MEDIA_SCHEMA.fields]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            for start in range(0, len(pdf), batch_size):
                chunk = pdf.iloc[start : start + batch_size].copy()
                payloads, widths, heights = [], [], []
                for p, w0, h0 in zip(chunk["payload"], chunk["width"], chunk["height"]):
                    b = bytes(p) if p is not None else b""
                    try:
                        px = decode_image(b)
                        payloads.append(encode_image(resize_image(px, height, width)))
                        widths.append(width)
                        heights.append(height)
                    except (ValueError, struct.error, NotImplementedError):
                        payloads.append(b or None)
                        widths.append(w0)
                        heights.append(h0)
                chunk["payload"] = payloads
                chunk["width"] = widths
                chunk["height"] = heights
                yield chunk[cols]

    return media.select(*cols).mapInPandas(batches, schema=MEDIA_SCHEMA)


def explode_frames(
    media: DataFrame, every: int = 4, limit: int | None = None, batch_size: int = 256
) -> DataFrame:
    """One OKPX image row per sampled frame of every decodable video
    payload: (media_id, frame_idx, width, height, payload). Non-video
    rows are dropped (filtered JVM-side before the Python stage so the
    Arrow exchange carries only video bytes). Downstream image ops —
    ``resize_images``, ``extract_features`` — compose directly on the
    result; frame selection slices by byte offset, so ``every=100``
    over a long clip touches 1% of its bytes."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            for start in range(0, len(pdf), batch_size):
                chunk = pdf.iloc[start : start + batch_size]
                out = {"media_id": [], "frame_idx": [], "width": [], "height": [], "payload": []}
                for mid, p in zip(chunk["media_id"], chunk["payload"]):
                    b = bytes(p) if p is not None else b""
                    try:
                        _, frames = sample_frames(b, every=every, limit=limit)
                    except (ValueError, struct.error, NotImplementedError):
                        continue
                    for j, f in enumerate(frames):
                        out["media_id"].append(int(mid))
                        out["frame_idx"].append(j * every)
                        out["width"].append(f.shape[1])
                        out["height"].append(f.shape[0])
                        out["payload"].append(encode_image(f))
                yield pd.DataFrame(out)

    vids = media.filter(
        F.substring(F.col("payload"), 1, 4) == F.lit(_VID_MAGIC)
    ).select("media_id", "payload")
    return vids.mapInPandas(
        batches, schema="media_id long, frame_idx int, width int, height int, payload binary"
    )
