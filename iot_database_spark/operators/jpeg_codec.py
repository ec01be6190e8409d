"""JPEG codec — pure stdlib + numpy, no media libraries.

Decoder: ``jpeg_decode_pixels(b)`` entropy-decodes BOTH sequential
baseline (SOF0/SOF1) and progressive (SOF2) 8-bit Huffman JPEGs to raw
RGB24 bytes: marker walk, DQT/DHT table collection, restart-interval
handling, per-scan Huffman decode into per-component coefficient grids
(progressive spectral selection AND successive approximation — DC
first/refine, AC first/refine with EOB-run coding per ITU T.81 §G),
then one reconstruction pass: dequantize, zigzag, vectorized 8x8 IDCT
(one einsum per component over all blocks), chroma upsampling for
4:2:0/4:2:2/4:1:1, and the JPEG full-range BT.601 YCbCr->RGB matrix.
Arithmetic-coded, lossless, hierarchical, and 12-bit streams raise
NotImplementedError with the feature named — nothing silently passes
as decoded.

Encoders (fixture generation): ``jpeg_encode_baseline(rgb, w, h)``
writes a spec-correct baseline JPEG (Annex K tables, caller-scalable
quant, optional 4:2:0, optional restart intervals);
``jpeg_encode_progressive`` writes a SOF2 stream whose scan script
exercises all four progressive scan types with successive
approximation.  Coefficient recovery through the progressive path is
exact, so the round-trip test demands BIT-IDENTICAL pixels between the
baseline and progressive encodings of the same image — a much stronger
check than a tolerance bound.

This closes the reference's RTSP/MJPEG frame path (reference:
Video/Clients/RtspClient.cs frame loop, VideoCollection.cs frame
indexing) end-to-end: mjpeg_split_frames/avi_split_frames/
mp4_split_samples yield per-frame JPEG bytes, and this module turns
them into actual pixels with no external codec.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "jpeg_decode_pixels",
    "jpeg_encode_baseline",
    "jpeg_encode_progressive",
]

# zigzag order: index i of this array holds the (row-major) coefficient
# position of the i-th coefficient in scan order (ITU T.81 Figure A.6)
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int32)

# 8x8 DCT-II basis matrix: B[u, x] = c(u)/2 * cos((2x+1) u pi / 16).
# IDCT of block S is B.T @ S @ B; forward DCT is B @ s @ B.T.
def _dct_basis() -> np.ndarray:
    u = np.arange(8).reshape(8, 1)
    x = np.arange(8).reshape(1, 8)
    basis = np.cos((2 * x + 1) * u * np.pi / 16) / 2
    basis[0, :] *= 1 / np.sqrt(2)
    return basis


_BASIS = _dct_basis()


class _BitReader:
    """MSB-first bit reader over entropy-coded data with FF00
    unstuffing; restart markers are consumed by the caller."""

    __slots__ = ("data", "pos", "bitbuf", "bitcnt")

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.bitcnt = 0

    def _fill(self) -> None:
        d = self.data
        while self.bitcnt <= 24:
            p = self.pos
            if p >= len(d):
                # past the end: pad with 1-bits (spec behavior for the
                # final truncated byte); decode loop stops at EOI anyway
                self.bitbuf = (self.bitbuf << 8) | 0xFF
                self.bitcnt += 8
                continue
            byte = d[p]
            if byte == 0xFF:
                nxt = d[p + 1] if p + 1 < len(d) else 0xD9
                if nxt == 0x00:  # stuffed FF
                    self.pos = p + 2
                elif nxt == 0xFF:  # fill byte
                    self.pos = p + 1
                    continue
                else:  # a real marker: stop feeding, pad with 1s
                    self.bitbuf = (self.bitbuf << 8) | 0xFF
                    self.bitcnt += 8
                    continue
            else:
                self.pos = p + 1
            self.bitbuf = (self.bitbuf << 8) | byte
            self.bitcnt += 8
        # drop already-consumed high bits so bitbuf stays a small int
        self.bitbuf &= (1 << self.bitcnt) - 1

    def read_bit(self) -> int:
        if self.bitcnt == 0:
            self._fill()
        self.bitcnt -= 1
        return (self.bitbuf >> self.bitcnt) & 1

    def read_bits(self, n: int) -> int:
        if n == 0:
            return 0
        while self.bitcnt < n:
            self._fill()
        self.bitcnt -= n
        return (self.bitbuf >> self.bitcnt) & ((1 << n) - 1)

    def byte_align_to_marker(self) -> int | None:
        """Drop partial bits and consume one marker (returns its second
        byte) if one is next in the stream; None otherwise."""
        self.bitbuf = 0
        self.bitcnt = 0
        d, p = self.data, self.pos
        while p + 1 < len(d) and d[p] == 0xFF and d[p + 1] == 0xFF:
            p += 1  # fill bytes before the marker
        if p + 1 < len(d) and d[p] == 0xFF and d[p + 1] != 0x00:
            self.pos = p + 2
            return d[p + 1]
        self.pos = p
        return None


class _HuffTable:
    """Canonical JPEG Huffman table with a code->symbol map keyed by
    (length, code) for the sequential-read decode loop."""

    __slots__ = ("lookup", "max_len", "fast", "fast_bits")

    def __init__(self, counts: bytes, symbols: bytes) -> None:
        self.lookup: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        self.max_len = 0
        self.fast_bits = 9
        self.fast = [None] * (1 << self.fast_bits)
        for length in range(1, 17):
            for _ in range(counts[length - 1]):
                sym = symbols[k]
                self.lookup[(length, code)] = sym
                if length <= self.fast_bits:
                    # every fast_bits-wide window starting with this code
                    lo = code << (self.fast_bits - length)
                    for w in range(lo, lo + (1 << (self.fast_bits - length))):
                        self.fast[w] = (length, sym)
                k += 1
                code += 1
                self.max_len = length
            code <<= 1

    def decode(self, br: _BitReader) -> int:
        # fast path: peek fast_bits at once
        while br.bitcnt < self.fast_bits:
            br._fill()
        window = (br.bitbuf >> (br.bitcnt - self.fast_bits)) & (
            (1 << self.fast_bits) - 1
        )
        hit = self.fast[window]
        if hit is not None:
            br.bitcnt -= hit[0]
            return hit[1]
        code = window
        length = self.fast_bits
        br.bitcnt -= self.fast_bits
        while length < self.max_len:
            code = (code << 1) | br.read_bit()
            length += 1
            sym = self.lookup.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in JPEG scan data")


def _extend(v: int, t: int) -> int:
    """JPEG EXTEND (T.81 F.2.2.1): map t raw bits to a signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def jpeg_decode_pixels(b: bytes) -> dict:
    """Decode a JPEG to RGB24 — baseline (SOF0/SOF1) AND progressive
    (SOF2) with both spectral selection and successive approximation.

    Architecture: one marker walk accumulates DQT/DHT state and decodes
    every SOS scan into per-component DCT-coefficient grids (progressive
    JPEGs carry many scans — DC first/refine, per-band AC first/refine
    with EOB-run coding per ITU T.81 §G); reconstruction (dequantize,
    un-zigzag, vectorized IDCT, chroma upsample, YCbCr->RGB) runs once
    at EOI over the final coefficients, so baseline is simply the
    single-scan case of the same pipeline.

    Returns ``{"width", "height", "n_components", "rgb"}`` where rgb is
    ``width*height*3`` bytes (grayscale replicated to RGB).  Raises
    ValueError for malformed streams and NotImplementedError for
    arithmetic coding, lossless/hierarchical modes, and 12-bit depth.
    """
    if len(b) < 4 or b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream (missing SOI)")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffTable] = {}
    huff_ac: dict[int, _HuffTable] = {}
    restart_interval = 0
    frame = None  # (w, h, [(cid, h, v, tq)], progressive)
    geo = None
    coefs: list[np.ndarray] | None = None
    i = 2
    n = len(b)
    saw_scan = False
    while i + 3 < n:
        if b[i] != 0xFF:
            raise ValueError(f"expected marker at offset {i}")
        marker = b[i + 1]
        if marker == 0xFF:
            i += 1
            continue
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker == 0xD9:  # EOI
            break
        seglen = struct.unpack(">H", b[i + 2 : i + 4])[0]
        seg = b[i + 4 : i + 2 + seglen]
        if marker == 0xDB:  # DQT
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 0x0F
                j += 1
                if pq == 0:
                    tbl = np.frombuffer(seg[j : j + 64], dtype=np.uint8)
                    j += 64
                else:
                    tbl = np.frombuffer(seg[j : j + 128], dtype=">u2")
                    j += 128
                qt[tq] = tbl.astype(np.float64)
        elif marker == 0xC4:  # DHT
            j = 0
            while j + 17 <= len(seg):
                tc, th = seg[j] >> 4, seg[j] & 0x0F
                counts = seg[j + 1 : j + 17]
                total = sum(counts)
                symbols = seg[j + 17 : j + 17 + total]
                (huff_dc if tc == 0 else huff_ac)[th] = _HuffTable(
                    counts, symbols
                )
                j += 17 + total
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 prog
            prec = seg[0]
            if prec != 8:
                raise NotImplementedError(
                    f"JPEG sample precision {prec} unsupported (8-bit only)"
                )
            h, w = struct.unpack(">HH", seg[1:5])
            ncomp = seg[5]
            comps = []
            for c in range(ncomp):
                cid = seg[6 + 3 * c]
                hv = seg[7 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0x0F, seg[8 + 3 * c]))
            frame = (w, h, comps, marker == 0xC2)
            geo = _frame_geometry(frame)
            coefs = [
                np.zeros((geo["bh"][ci] * geo["bw"][ci], 64), dtype=np.int32)
                for ci in range(len(comps))
            ]
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD,
                        0xCE, 0xCF):
            name = {
                0xC3: "lossless (SOF3)",
                0xC9: "arithmetic-coded (SOF9)",
                0xCA: "progressive arithmetic (SOF10)",
            }.get(marker, f"SOF{marker - 0xC0}")
            raise NotImplementedError(
                f"JPEG {name} decoding unsupported — Huffman "
                "sequential/progressive only"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[0:2])[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            scan = []
            for c in range(ns):
                cs = seg[1 + 2 * c]
                tdta = seg[2 + 2 * c]
                scan.append((cs, tdta >> 4, tdta & 0x0F))
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0x0F
            i = _decode_scan_into(
                b, i + 2 + seglen, frame, geo, coefs, scan,
                (ss, se, ah, al), huff_dc, huff_ac, restart_interval,
            )
            saw_scan = True
            continue
        i += 2 + seglen
    if not saw_scan:
        raise ValueError("JPEG stream ended before SOS")
    return _reconstruct(frame, geo, coefs, qt)


def _frame_geometry(frame) -> dict:
    """MCU tiling and per-component block-grid dims.

    bw/bh: MCU-padded block grid (interleaved addressing, also the
    coefficient-array shape).  nbw/nbh: the component's OWN block grid
    (ceil(comp samples / 8)) — the traversal bounds of non-interleaved
    scans per T.81 A.2.2."""
    w, h, comps, _prog = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    geo = {"hmax": hmax, "vmax": vmax, "mcux": mcux, "mcuy": mcuy,
           "bw": [], "bh": [], "nbw": [], "nbh": []}
    for _cid, hi, vi, _tq in comps:
        if hmax % hi or vmax % vi:
            # legal per T.81 but _reconstruct's integer np.repeat
            # upsampling cannot express e.g. 3:2 — fail by NAME here
            # instead of with an opaque numpy shape error later
            raise NotImplementedError(
                f"JPEG non-integer chroma sampling ratio "
                f"{hmax}:{hi} x {vmax}:{vi} unsupported"
            )
        comp_w = (w * hi + hmax - 1) // hmax
        comp_h = (h * vi + vmax - 1) // vmax
        geo["bw"].append(mcux * hi)
        geo["bh"].append(mcuy * vi)
        geo["nbw"].append((comp_w + 7) // 8)
        geo["nbh"].append((comp_h + 7) // 8)
    return geo


def _next_marker(b: bytes, p: int) -> int:
    """Scan forward to the next true marker (skips entropy remnants,
    stuffed FF00 pairs, fill bytes, and stray RSTn)."""
    n = len(b)
    while p + 1 < n:
        if b[p] == 0xFF and b[p + 1] != 0x00 and not (
            0xD0 <= b[p + 1] <= 0xD7
        ) and b[p + 1] != 0xFF:
            return p
        p += 1
    return n


def _decode_scan_into(
    b: bytes,
    pos: int,
    frame,
    geo: dict,
    coefs: list[np.ndarray],
    scan: list[tuple[int, int, int]],
    band: tuple[int, int, int, int],
    huff_dc: dict[int, _HuffTable],
    huff_ac: dict[int, _HuffTable],
    restart_interval: int,
) -> int:
    """Entropy-decode ONE scan into the coefficient grids; returns the
    stream offset of the marker following the scan's entropy data."""
    w, h, comps, progressive = frame
    ss, se, ah, al = band
    if not progressive:
        ss, se, ah, al = 0, 63, 0, 0
    by_id = {c[0]: ci for ci, c in enumerate(comps)}
    if progressive and ss > 0 and len(scan) > 1:
        # T.81 B.2.3: progressive AC scans are single-component; a
        # malformed multi-component AC scan would otherwise reach
        # _decode_dc_first with dctab=None and die with an opaque
        # AttributeError instead of a named stream error (r5 advice)
        raise ValueError("JPEG progressive AC scan with multiple components")
    members = []  # (ci, dctab|None, actab|None)
    for cs, td, ta in scan:
        if cs not in by_id:
            raise ValueError("scan references unknown component")
        ci = by_id[cs]
        dctab = actab = None
        if ss == 0:
            dctab = huff_dc.get(td)
            if dctab is None and ah == 0:
                raise ValueError("JPEG scan missing DC Huffman table")
        if se > 0 and (not progressive or ss > 0):
            actab = huff_ac.get(ta)
            if actab is None:
                raise ValueError("JPEG scan missing AC Huffman table")
        members.append((ci, dctab, actab))

    br = _BitReader(b, pos)
    pred = [0] * len(members)
    eobrun = 0

    def check_restart(unit_index: int) -> None:
        nonlocal pred, eobrun
        if restart_interval and unit_index and unit_index % restart_interval == 0:
            m = br.byte_align_to_marker()
            if m is None or not (0xD0 <= m <= 0xD7):
                raise ValueError("JPEG restart marker missing at interval")
            pred = [0] * len(members)
            eobrun = 0

    if len(members) > 1:
        # interleaved MCU traversal (multi-component scans only — a scan
        # with Ns=1 is ALWAYS non-interleaved per T.81 A.2, traversing
        # the component's own block grid, baseline included)
        mcux, mcuy = geo["mcux"], geo["mcuy"]
        for mcu in range(mcux * mcuy):
            check_restart(mcu)
            my, mx = divmod(mcu, mcux)
            for mi, (ci, dctab, actab) in enumerate(members):
                _cid, hi, vi, _tq = comps[ci]
                bw = geo["bw"][ci]
                for vy in range(vi):
                    for vx in range(hi):
                        row = coefs[ci][(my * vi + vy) * bw + (mx * hi + vx)]
                        if not progressive:
                            pred[mi] = _decode_block_baseline(
                                br, row, dctab, actab, pred[mi]
                            )
                        elif ah == 0:
                            pred[mi] = _decode_dc_first(
                                br, row, dctab, pred[mi], al
                            )
                        else:
                            _decode_dc_refine(br, row, al)
    else:
        # non-interleaved: the component's own block grid
        ci, dctab, actab = members[0]
        nbw, nbh = geo["nbw"][ci], geo["nbh"][ci]
        bw = geo["bw"][ci]
        for blk in range(nbw * nbh):
            check_restart(blk)
            by, bx = divmod(blk, nbw)
            row = coefs[ci][by * bw + bx]
            if not progressive:
                pred[0] = _decode_block_baseline(br, row, dctab, actab, pred[0])
            elif ss == 0:
                if ah == 0:
                    pred[0] = _decode_dc_first(br, row, dctab, pred[0], al)
                else:
                    _decode_dc_refine(br, row, al)
            elif ah == 0:
                eobrun = _decode_ac_first(br, row, actab, ss, se, al, eobrun)
            else:
                # refinement touches every band coefficient: plain-list
                # access is ~10x numpy scalar indexing in this loop
                lrow = row.tolist()
                eobrun = _decode_ac_refine(br, lrow, actab, ss, se, al, eobrun)
                row[:] = lrow
    return _next_marker(b, br.pos)


def _decode_block_baseline(br, row, dctab, actab, pred: int) -> int:
    t = dctab.decode(br)
    pred += _extend(br.read_bits(t), t)
    row[0] = pred
    k = 1
    while k < 64:
        rs = actab.decode(br)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:
                k += 16  # ZRL
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("JPEG AC index out of range")
        row[k] = _extend(br.read_bits(s), s)
        k += 1
    return pred


def _decode_dc_first(br, row, dctab, pred: int, al: int) -> int:
    t = dctab.decode(br)
    pred += _extend(br.read_bits(t), t)
    row[0] = pred << al
    return pred


def _decode_dc_refine(br, row, al: int) -> None:
    if br.read_bit():
        row[0] |= 1 << al


def _decode_ac_first(br, row, actab, ss, se, al, eobrun: int) -> int:
    """Progressive AC first scan (T.81 G.1.2.2): band coefficients with
    EOB-run coding; values arrive point-transformed (<< al)."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = actab.decode(br)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:
                k += 16  # ZRL
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += br.read_bits(r)
            break
        k += r
        if k > se:
            raise ValueError("JPEG AC index out of range")
        row[k] = _extend(br.read_bits(s), s) << al
        k += 1
    return eobrun


def _decode_ac_refine(br, row, actab, ss, se, al, eobrun: int) -> int:
    """Progressive AC refinement scan (T.81 G.1.2.3): one correction bit
    per already-nonzero coefficient, new coefficients inserted at +-2^al
    with run lengths counting only zero-history positions.  An EOBn
    symbol still corrects the REMAINDER of the current block before the
    run covers the following n-1 whole blocks."""
    p1 = 1 << al
    m1 = -1 << al

    def correct(k: int) -> None:
        while k <= se:
            c = row[k]
            if c != 0 and br.read_bit() and (c & p1) == 0:
                row[k] = c + (p1 if c >= 0 else m1)
            k += 1

    if eobrun > 0:
        correct(ss)
        return eobrun - 1
    k = ss
    while k <= se:
        rs = actab.decode(br)
        r, s = rs >> 4, rs & 0x0F
        val = 0
        if s == 0:
            if r < 15:  # EOBn: finish this block's corrections, then run
                eobrun = (1 << r) - 1
                if r:
                    eobrun += br.read_bits(r)
                correct(k)
                return eobrun
            # r == 15 (ZRL): skip 16 zero-history coefficients
        elif s == 1:
            val = p1 if br.read_bit() else m1
        else:
            raise ValueError("JPEG AC refinement magnitude must be 1")
        while k <= se:
            c = row[k]
            if c != 0:
                if br.read_bit() and (c & p1) == 0:
                    row[k] = c + (p1 if c >= 0 else m1)
            else:
                if r == 0:
                    if s:
                        row[k] = val
                    k += 1
                    break
                r -= 1
            k += 1
    return eobrun


def _reconstruct(frame, geo, coefs, qt: dict[int, np.ndarray]) -> dict:
    """Dequantize + un-zigzag + vectorized IDCT + upsample + color
    convert the accumulated coefficient grids (shared by baseline and
    progressive — baseline is the one-scan case)."""
    w, h, comps, _prog = frame
    hmax, vmax = geo["hmax"], geo["vmax"]
    planes = []
    for ci, (_cid, hi, vi, tq) in enumerate(comps):
        if tq not in qt:
            raise ValueError("JPEG frame missing quantization table")
        arr = coefs[ci]
        bw = geo["bw"][ci]
        dq = arr.astype(np.float64) * qt[tq][np.newaxis, :]
        blocks = np.zeros((arr.shape[0], 64), dtype=np.float64)
        blocks[:, ZIGZAG] = dq
        blocks = blocks.reshape(-1, 8, 8)
        spatial = np.einsum(
            "ua,nuv,vb->nab", _BASIS, blocks, _BASIS, optimize=True
        )
        spatial = np.clip(np.round(spatial + 128), 0, 255)
        bh = arr.shape[0] // bw
        plane = (
            spatial.reshape(bh, bw, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(bh * 8, bw * 8)
        )
        if hi < hmax or vi < vmax:
            plane = np.repeat(
                np.repeat(plane, vmax // vi, axis=0), hmax // hi, axis=1
            )
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        y = planes[0].astype(np.uint8)
        rgb = np.repeat(y[:, :, np.newaxis], 3, axis=2)
    elif len(planes) == 3:
        y, cb, cr = planes
        r = y + 1.402 * (cr - 128)
        g = y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)
        bl = y + 1.772 * (cb - 128)
        rgb = np.clip(
            np.round(np.stack([r, g, bl], axis=2)), 0, 255
        ).astype(np.uint8)
    else:
        raise NotImplementedError(
            f"JPEG with {len(planes)} components unsupported (1 or 3 only)"
        )
    return {
        "width": int(w),
        "height": int(h),
        "n_components": len(planes),
        "rgb": rgb.tobytes(),
    }


# --------------------------------------------------------------------------
# Encoder (fixture generation; Annex K tables)
# --------------------------------------------------------------------------

# ITU T.81 Annex K.1 example quantization tables (luminance, chrominance)
K_LUMA_QT = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)
K_CHROMA_QT = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32)

# Annex K.3 default Huffman tables: (counts[16], symbols)
K_DC_LUMA = (
    bytes([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]),
    bytes(range(12)),
)
K_DC_CHROMA = (
    bytes([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]),
    bytes(range(12)),
)
K_AC_LUMA = (
    bytes([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]),
    bytes([
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
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ]),
)
K_AC_CHROMA = (
    bytes([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]),
    bytes([
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ]),
)


def _huff_codes(counts: bytes, symbols: bytes) -> dict[int, tuple[int, int]]:
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            out[symbols[k]] = (code, length)
            k += 1
            code += 1
        code <<= 1
    return out


class _BitWriter:
    __slots__ = ("out", "acc", "nbits")

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)
        self.acc &= (1 << self.nbits) - 1

    def pad_align(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)


def _mag_bits(v: int) -> tuple[int, int]:
    """Return (category, raw bits) for a signed coefficient value."""
    if v == 0:
        return 0, 0
    a = abs(v)
    t = a.bit_length()
    bits = v if v > 0 else v + (1 << t) - 1
    return t, bits


def _encode_blocks(
    blocks: np.ndarray,
    dc_codes: dict,
    ac_codes: dict,
    bw: _BitWriter,
    pred: int,
) -> int:
    """Huffman-encode quantized zigzag blocks (n x 64). Returns the new
    DC predictor."""
    for row in blocks:
        t, bits = _mag_bits(int(row[0]) - pred)
        pred = int(row[0])
        c, ln = dc_codes[t]
        bw.write(c, ln)
        if t:
            bw.write(bits, t)
        run = 0
        last_nz = 0
        nz = np.nonzero(row[1:])[0]
        last_nz = (nz[-1] + 1) if len(nz) else 0
        for k in range(1, last_nz + 1):
            v = int(row[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                c, ln = ac_codes[0xF0]
                bw.write(c, ln)
                run -= 16
            t, bits = _mag_bits(v)
            c, ln = ac_codes[(run << 4) | t]
            bw.write(c, ln)
            bw.write(bits, t)
            run = 0
        if last_nz < 63:
            c, ln = ac_codes[0x00]  # EOB
            bw.write(c, ln)
    return pred


def _fdct_quant(plane: np.ndarray, qtbl: np.ndarray) -> np.ndarray:
    """plane (H x W, multiple of 8) -> (n_blocks, 64) quantized zigzag
    coefficients, raster block order."""
    hh, ww = plane.shape
    blocks = (
        plane.reshape(hh // 8, 8, ww // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
        .astype(np.float64)
        - 128.0
    )
    coef = np.einsum("au,nuv,bv->nab", _BASIS, blocks, _BASIS, optimize=True)
    coef = coef.reshape(-1, 64)
    q = np.round(coef / qtbl[np.newaxis, :]).astype(np.int32)
    zz = np.empty_like(q)
    zz[:, np.arange(64)] = q[:, ZIGZAG]
    return zz


def _pad_edge(plane: np.ndarray, mult: int) -> np.ndarray:
    hh, ww = plane.shape
    ph = (-hh) % mult
    pw = (-ww) % mult
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    return plane


def jpeg_encode_baseline(
    rgb: bytes | np.ndarray,
    width: int,
    height: int,
    quant_scale: float = 1.0,
    subsample: bool = False,
    restart_interval: int = 0,
    grayscale: bool = False,
) -> bytes:
    """Encode RGB24 (or grayscale when grayscale=True over an HxW
    array/bytes) to a baseline JFIF JPEG with Annex K Huffman tables.

    quant_scale scales the Annex K quantization tables (values clipped
    to [1, 255]); quant_scale -> 0 approaches near-lossless, which is
    what the round-trip tests use to bound decoder error independently
    of table choice.  subsample=True writes 4:2:0."""
    if grayscale:
        arr = np.frombuffer(rgb, dtype=np.uint8) if isinstance(
            rgb, (bytes, bytearray)
        ) else np.asarray(rgb, dtype=np.uint8)
        y = arr.reshape(height, width).astype(np.float64)
        planes = [y]
    else:
        arr = np.frombuffer(rgb, dtype=np.uint8) if isinstance(
            rgb, (bytes, bytearray)
        ) else np.asarray(rgb, dtype=np.uint8)
        img = arr.reshape(height, width, 3).astype(np.float64)
        r, g, bch = img[:, :, 0], img[:, :, 1], img[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * bch
        cb = -0.168736 * r - 0.331264 * g + 0.5 * bch + 128
        cr = 0.5 * r - 0.418688 * g - 0.081312 * bch + 128
        planes = [y, cb, cr]

    lq = np.clip(np.round(K_LUMA_QT * quant_scale), 1, 255).astype(np.int32)
    cq = np.clip(np.round(K_CHROMA_QT * quant_scale), 1, 255).astype(np.int32)

    out = bytearray(b"\xff\xd8")
    # APP0 / JFIF
    app0 = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xff\xe0" + struct.pack(">H", 2 + len(app0)) + app0
    # DQT
    out += b"\xff\xdb" + struct.pack(">H", 2 + 65) + bytes([0x00])
    out += bytes(int(lq[z]) for z in ZIGZAG)
    if not grayscale:
        out += b"\xff\xdb" + struct.pack(">H", 2 + 65) + bytes([0x01])
        out += bytes(int(cq[z]) for z in ZIGZAG)
    # SOF0
    sub = {False: None, True: (2, 2), "420": (2, 2), "422": (2, 1)}[subsample]
    if grayscale:
        comps = bytes([1, 0x11, 0])
        ncomp = 1
    else:
        hv = (sub[0] << 4) | sub[1] if sub else 0x11
        comps = bytes([1, hv, 0, 2, 0x11, 1, 3, 0x11, 1])
        ncomp = 3
    out += b"\xff\xc0" + struct.pack(
        ">HBHHB", 8 + 3 * ncomp, 8, height, width, ncomp
    ) + comps
    # DHT
    for marker_id, (counts, syms) in (
        (0x00, K_DC_LUMA), (0x10, K_AC_LUMA),
        *(() if grayscale else ((0x01, K_DC_CHROMA), (0x11, K_AC_CHROMA))),
    ):
        out += b"\xff\xc4" + struct.pack(
            ">H", 2 + 1 + 16 + len(syms)
        ) + bytes([marker_id]) + counts + syms
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # SOS
    if grayscale:
        sos = bytes([1, 1, 0x00, 0, 63, 0])
    else:
        sos = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    dc_l = _huff_codes(*K_DC_LUMA)
    ac_l = _huff_codes(*K_AC_LUMA)
    dc_c = _huff_codes(*K_DC_CHROMA)
    ac_c = _huff_codes(*K_AC_CHROMA)

    if grayscale or sub is None:
        mult = 8
        padded = [_pad_edge(p, mult) for p in planes]
        zz = [
            _fdct_quant(p, lq if ci == 0 else cq)
            for ci, p in enumerate(padded)
        ]
        bw0 = padded[0].shape[1] // 8
        total_mcus = (padded[0].shape[0] // 8) * bw0
        bwr = _BitWriter()
        pred = [0] * len(planes)
        tables = [
            (dc_l, ac_l) if ci == 0 else (dc_c, ac_c)
            for ci in range(len(planes))
        ]
        rst = 0
        for m in range(total_mcus):
            if restart_interval and m and m % restart_interval == 0:
                bwr.pad_align()
                out_marker = 0xD0 + (rst % 8)
                bwr.out += bytes([0xFF, out_marker])
                rst += 1
                pred = [0] * len(planes)
            for ci in range(len(planes)):
                pred[ci] = _encode_blocks(
                    zz[ci][m : m + 1], tables[ci][0], tables[ci][1],
                    bwr, pred[ci],
                )
    else:
        # subsampled: luma 8*sh x 8*sv per MCU, chroma box-averaged
        sh, sv = sub  # horizontal, vertical luma sampling factors
        mw, mh = 8 * sh, 8 * sv  # MCU pixel dims
        y = planes[0]
        ph = -(-y.shape[0] // mh) * mh
        pw = -(-y.shape[1] // mw) * mw
        y = np.pad(y, ((0, ph - y.shape[0]), (0, pw - y.shape[1])),
                   mode="edge")
        hh, ww = y.shape
        chroma = []
        for plane in planes[1:]:
            c = np.pad(
                plane,
                ((0, hh - plane.shape[0]), (0, ww - plane.shape[1])),
                mode="edge",
            )
            chroma.append(
                c.reshape(hh // sv, sv, ww // sh, sh).mean(axis=(1, 3))
            )
        cb, cr = chroma
        zz_y = _fdct_quant(y, lq)
        zz_cb = _fdct_quant(cb, cq)
        zz_cr = _fdct_quant(cr, cq)
        mcux, mcuy = ww // mw, hh // mh
        ybw = ww // 8
        cbw = ww // (8 * sh)
        bwr = _BitWriter()
        pred = [0, 0, 0]
        rst = 0
        for m in range(mcux * mcuy):
            if restart_interval and m and m % restart_interval == 0:
                bwr.pad_align()
                bwr.out += bytes([0xFF, 0xD0 + (rst % 8)])
                rst += 1
                pred = [0, 0, 0]
            my, mx = divmod(m, mcux)
            idx = [
                (my * sv + vy) * ybw + (mx * sh + vx)
                for vy in range(sv)
                for vx in range(sh)
            ]
            pred[0] = _encode_blocks(zz_y[idx], dc_l, ac_l, bwr, pred[0])
            ci = my * cbw + mx
            pred[1] = _encode_blocks(
                zz_cb[ci : ci + 1], dc_c, ac_c, bwr, pred[1]
            )
            pred[2] = _encode_blocks(
                zz_cr[ci : ci + 1], dc_c, ac_c, bwr, pred[2]
            )

    bwr.pad_align()
    out += bwr.out
    out += b"\xff\xd9"
    return bytes(out)


# --------------------------------------------------------------------------
# Progressive encoder (fixture generation for the progressive decoder)
# --------------------------------------------------------------------------

# Flat canonical table covering ALL 256 RS symbols (Annex K AC tables
# omit the EOBn run symbols progressive scans need): 255 nine-bit codes
# plus one ten-bit, Kraft-incomplete so padding 1-bits never alias.
P_AC_COUNTS = bytes([0] * 8 + [255, 1] + [0] * 6)
P_AC_SYMBOLS = bytes(list(range(255)) + [255])


def _toward_zero(v: int, al: int) -> int:
    """T.81 AC point transform: divide by 2^al truncating toward zero."""
    a = abs(v) >> al
    return a if v >= 0 else -a


def _emit_dc_first(bw, zz_list, order, al, dc_code_list):
    """order: list of (scan_member_index, block_row) pairs in MCU
    traversal order; one DC predictor per scan member."""
    preds = [0] * (max(m for m, _ in order) + 1)
    for m, row in order:
        d = int(row[0]) >> al  # arithmetic shift per G.1.2.1
        t, bits = _mag_bits(d - preds[m])
        preds[m] = d
        c, ln = dc_code_list[m][t]
        bw.write(c, ln)
        if t:
            bw.write(bits, t)


def _emit_dc_refine(bw, order, al):
    for _m, row in order:
        bw.write((int(row[0]) >> al) & 1, 1)


def _emit_ac_first(bw, zz, block_indices, ss, se, al, ac_codes):
    eobrun = 0

    def flush():
        nonlocal eobrun
        if eobrun:
            r = eobrun.bit_length() - 1
            c, ln = ac_codes[r << 4]
            bw.write(c, ln)
            if r:
                bw.write(eobrun - (1 << r), r)
            eobrun = 0

    for bi in block_indices:
        row = zz[bi]
        tvals = [_toward_zero(int(row[k]), al) for k in range(ss, se + 1)]
        last = -1
        for j, t in enumerate(tvals):
            if t:
                last = j
        if last < 0:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush()
            continue
        flush()
        r = 0
        for j in range(last + 1):
            t = tvals[j]
            if t == 0:
                r += 1
                continue
            while r > 15:
                c, ln = ac_codes[0xF0]
                bw.write(c, ln)
                r -= 16
            s, bits = _mag_bits(t)
            c, ln = ac_codes[(r << 4) | s]
            bw.write(c, ln)
            bw.write(bits, s)
            r = 0
        if last < se - ss:
            eobrun += 1
    flush()


def _emit_ac_refine(bw, zz, block_indices, ss, se, al, ac_codes):
    """T.81 G.1.2.3 encoder, mirroring the decoder's read order exactly:
    newly-nonzero coefficients (magnitude 1 at this precision) carry run
    lengths counting zero-history positions only; correction bits for
    already-nonzero positions are emitted in positional order after the
    symbol whose advance crosses them (a ZRL window carries only the
    bits up to its 16th zero); EOB runs buffer bits across blocks."""
    ah = al + 1
    eobrun = 0
    eob_bits: list[int] = []

    def flush_eobrun():
        nonlocal eobrun
        if eobrun:
            r = eobrun.bit_length() - 1
            c, ln = ac_codes[r << 4]
            bw.write(c, ln)
            if r:
                bw.write(eobrun - (1 << r), r)
            eobrun = 0
        for bit in eob_bits:
            bw.write(bit, 1)
        eob_bits.clear()

    for bi in block_indices:
        row = zz[bi]
        band = [int(row[k]) for k in range(ss, se + 1)]
        t_lo = [_toward_zero(v, al) for v in band]
        t_hi = [_toward_zero(v, ah) for v in band]
        newly = [j for j in range(len(band)) if t_hi[j] == 0 and t_lo[j] != 0]
        if not newly:
            eobrun += 1
            eob_bits.extend(abs(t_lo[j]) & 1 for j in range(len(band))
                            if t_hi[j] != 0)
            if eobrun == 0x7FFF:
                flush_eobrun()
            continue
        flush_eobrun()
        last = newly[-1]
        # pending events since the previous symbol, in positional order:
        # 'z' = zero-history zero, ('b', bit) = correction bit
        pending: list = []
        for j in range(last + 1):
            if t_hi[j] != 0:
                pending.append(("b", abs(t_lo[j]) & 1))
            elif t_lo[j] == 0:
                pending.append("z")
            else:  # newly nonzero, |t_lo| == 1
                while sum(1 for e in pending if e == "z") > 15:
                    c, ln = ac_codes[0xF0]  # ZRL
                    bw.write(c, ln)
                    z = 0
                    while z < 16:  # bits inside the 16-zero window only
                        ev = pending.pop(0)
                        if ev == "z":
                            z += 1
                        else:
                            bw.write(ev[1], 1)
                r = sum(1 for e in pending if e == "z")
                c, ln = ac_codes[(r << 4) | 1]
                bw.write(c, ln)
                bw.write(1 if band[j] > 0 else 0, 1)
                for ev in pending:  # remaining corrections, in order
                    if ev != "z":
                        bw.write(ev[1], 1)
                pending = []
        if last < len(band) - 1:
            eobrun += 1
            eob_bits.extend(abs(t_lo[j]) & 1 for j in range(last + 1, len(band))
                            if t_hi[j] != 0)
    flush_eobrun()


def jpeg_encode_progressive(
    rgb: bytes | np.ndarray,
    width: int,
    height: int,
    quant_scale: float = 1.0,
    subsample: bool = False,
    grayscale: bool = False,
) -> bytes:
    """Encode a spec-correct PROGRESSIVE (SOF2) JPEG exercising all four
    scan types the decoder must handle: interleaved DC first (Al=1),
    per-component AC first over two spectral bands (Al=1), DC refinement
    (Ah=1), and AC refinement (Ah=1) — i.e. full successive
    approximation, the scan shape libjpeg's default progressive script
    produces. Coefficient recovery is exact, so decoding this stream
    must yield bit-identical pixels to the baseline encoding of the same
    image with the same quantization tables (the round-trip test)."""
    if grayscale:
        arr = np.frombuffer(rgb, dtype=np.uint8) if isinstance(
            rgb, (bytes, bytearray)
        ) else np.asarray(rgb, dtype=np.uint8)
        planes = [arr.reshape(height, width).astype(np.float64)]
    else:
        arr = np.frombuffer(rgb, dtype=np.uint8) if isinstance(
            rgb, (bytes, bytearray)
        ) else np.asarray(rgb, dtype=np.uint8)
        img = arr.reshape(height, width, 3).astype(np.float64)
        r, g, bch = img[:, :, 0], img[:, :, 1], img[:, :, 2]
        planes = [
            0.299 * r + 0.587 * g + 0.114 * bch,
            -0.168736 * r - 0.331264 * g + 0.5 * bch + 128,
            0.5 * r - 0.418688 * g - 0.081312 * bch + 128,
        ]
    lq = np.clip(np.round(K_LUMA_QT * quant_scale), 1, 255).astype(np.int32)
    cq = np.clip(np.round(K_CHROMA_QT * quant_scale), 1, 255).astype(np.int32)

    ncomp = len(planes)
    sub = {False: None, True: (2, 2), "420": (2, 2), "422": (2, 1)}[subsample]
    if grayscale:
        samp = [(1, 1)]
    elif sub:
        samp = [sub, (1, 1), (1, 1)]
    else:
        samp = [(1, 1)] * 3
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-width // (8 * hmax))
    mcuy = -(-height // (8 * vmax))

    zz = []
    bws = []
    nbws, nbhs = [], []
    for ci, ((hi, vi), plane) in enumerate(zip(samp, planes)):
        comp_w = (width * hi + hmax - 1) // hmax
        comp_h = (height * vi + vmax - 1) // vmax
        pw, ph = mcux * hi * 8, mcuy * vi * 8
        if ci > 0 and sub:
            # chroma: box-mean the edge-padded full-res plane (identical
            # sample prep to jpeg_encode_baseline so the round-trip test
            # can demand bit-equal pixels); result is already (ph, pw)
            fh, fw = mcuy * vmax * 8, mcux * hmax * 8
            full = np.pad(
                plane,
                ((0, fh - plane.shape[0]), (0, fw - plane.shape[1])),
                mode="edge",
            )[:fh, :fw]
            padded = full.reshape(
                fh // vmax, vmax, fw // hmax, hmax
            ).mean(axis=(1, 3))[:ph, :pw]
        else:
            padded = np.pad(
                plane[:comp_h, :comp_w],
                ((0, ph - min(comp_h, ph)), (0, pw - min(comp_w, pw))),
                mode="edge",
            )[:ph, :pw]
        zz.append(_fdct_quant(padded, lq if ci == 0 else cq))
        bws.append(pw // 8)
        nbws.append((comp_w + 7) // 8)
        nbhs.append((comp_h + 7) // 8)

    out = bytearray(b"\xff\xd8")
    app0 = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xff\xe0" + struct.pack(">H", 2 + len(app0)) + app0
    out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([0x00])
    out += bytes(int(lq[z]) for z in ZIGZAG)
    if ncomp == 3:
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([0x01])
        out += bytes(int(cq[z]) for z in ZIGZAG)
    # SOF2
    comps_hdr = b"".join(
        bytes([ci + 1, (samp[ci][0] << 4) | samp[ci][1], 0 if ci == 0 else 1])
        for ci in range(ncomp)
    )
    out += b"\xff\xc2" + struct.pack(
        ">HBHHB", 8 + 3 * ncomp, 8, height, width, ncomp
    ) + comps_hdr
    # DHT: Annex K DC tables + the flat AC table as id 0
    for tid, (counts, syms) in (
        (0x00, K_DC_LUMA),
        *(() if ncomp == 1 else ((0x01, K_DC_CHROMA),)),
        (0x10, (P_AC_COUNTS, P_AC_SYMBOLS)),
    ):
        out += b"\xff\xc4" + struct.pack(
            ">H", 2 + 1 + 16 + len(syms)
        ) + bytes([tid]) + counts + syms
    dc_l = _huff_codes(*K_DC_LUMA)
    dc_c = _huff_codes(*K_DC_CHROMA)
    ac_flat = _huff_codes(P_AC_COUNTS, P_AC_SYMBOLS)

    def sos(members, ss, se, ah, al):
        seg = bytes([len(members)])
        for cid, td, ta in members:
            seg += bytes([cid, (td << 4) | ta])
        seg += bytes([ss, se, (ah << 4) | al])
        return b"\xff\xda" + struct.pack(">H", 2 + len(seg)) + seg

    def mcu_order():
        order = []
        for mcu in range(mcux * mcuy):
            my, mx = divmod(mcu, mcux)
            for ci in range(ncomp):
                hi, vi = samp[ci]
                for vy in range(vi):
                    for vx in range(hi):
                        order.append(
                            (ci, zz[ci][(my * vi + vy) * bws[ci] + mx * hi + vx])
                        )
        return order

    dc_code_list = [dc_l] + [dc_c] * (ncomp - 1)
    members_all = [
        (ci + 1, 0 if ci == 0 else 1, 0) for ci in range(ncomp)
    ]
    order = mcu_order()

    # scan 1: DC first, Al=1, interleaved
    out += sos(members_all, 0, 0, 0, 1)
    bw = _BitWriter()
    _emit_dc_first(bw, zz, order, 1, dc_code_list)
    bw.pad_align()
    out += bw.out
    # scans 2..: AC first per component, two spectral bands, Al=1
    for ss_, se_ in ((1, 5), (6, 63)):
        for ci in range(ncomp):
            idxs = [
                by * bws[ci] + bx
                for by in range(nbhs[ci])
                for bx in range(nbws[ci])
            ]
            out += sos([(ci + 1, 0, 0)], ss_, se_, 0, 1)
            bw = _BitWriter()
            _emit_ac_first(bw, zz[ci], idxs, ss_, se_, 1, ac_flat)
            bw.pad_align()
            out += bw.out
    # DC refinement, Ah=1 -> Al=0
    out += sos(members_all, 0, 0, 1, 0)
    bw = _BitWriter()
    _emit_dc_refine(bw, order, 0)
    bw.pad_align()
    out += bw.out
    # AC refinement per component, full band, Ah=1 -> Al=0
    for ci in range(ncomp):
        idxs = [
            by * bws[ci] + bx
            for by in range(nbhs[ci])
            for bx in range(nbws[ci])
        ]
        out += sos([(ci + 1, 0, 0)], 1, 63, 1, 0)
        bw = _BitWriter()
        _emit_ac_refine(bw, zz[ci], idxs, 1, 63, 0, ac_flat)
        bw.pad_align()
        out += bw.out
    out += b"\xff\xd9"
    return bytes(out)
