"""Baseline-sequential JPEG (JFIF) decoder — stdlib + numpy only.

Implemented from the public ITU-T T.81 spec (no image libraries ship in
this container): marker parse (DQT/DHT/SOF0-1/DRI/SOS), canonical Huffman
decode of the entropy-coded segment (byte-stuffing + restart markers),
dequantize → de-zigzag → exact float 8×8 IDCT (separable DCT-III basis,
numpy matmul), nearest-neighbor chroma upsampling for 4:2:0/4:2:2/4:1:1,
YCbCr→RGB per JFIF. Grayscale (1 component) and YCbCr (3 components)
frames supported.

Progressive (SOF2), arithmetic-coded (SOF9+), hierarchical, 12-bit, and
CMYK frames raise ``NotImplementedError`` — captured PER ROW by the
multimodal plumbing (never a partition kill), same policy as the other
codecs in :mod:`geopetl_spark.functions.multimodal`.

This is the correctness-reference path: the per-image Huffman loop is
plain Python (bounded by image size, not corpus size); corpus-scale decode
throughput comes from the Arrow-batched ``mapInPandas`` plumbing that
parallelizes WHOLE IMAGES across executor cores, which is the unit that
matters at 100 TB (one image never spans partitions).

geopetl parity: binary media columns map to the reference's LOB handling
(/root/reference/geopetl/oracle_sde.py:1114-1129); the reference has no
media decoding at all — this is engine-extension surface.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag order: index i of the scan -> (row, col) in the 8x8 block
_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)


def _idct_basis() -> np.ndarray:
    """8×8 DCT-III basis A with IDCT(block) = A @ coef @ A.T (T.81 A.3.3)."""
    a = np.empty((8, 8))
    for x in range(8):
        for u in range(8):
            cu = (1 / np.sqrt(2)) if u == 0 else 1.0
            a[x, u] = 0.5 * cu * np.cos((2 * x + 1) * u * np.pi / 16)
    return a


_IDCT_A = _idct_basis()


class _Huff:
    """Canonical Huffman table from DHT BITS (16 counts) + HUFFVAL."""

    __slots__ = ("lut",)

    def __init__(self, bits: list[int], vals: bytes):
        self.lut: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        for ln in range(1, 17):
            for _ in range(bits[ln - 1]):
                self.lut[(ln, code)] = vals[k]
                code += 1
                k += 1
            code <<= 1


class _BitReader:
    """MSB-first reader over the entropy-coded segment. 0xFF00 stuffing is
    removed; a bare 0xFF followed by a marker ends the segment (restart
    markers are handled by the caller via :meth:`sync_restart`)."""

    __slots__ = ("data", "pos", "bitbuf", "nbits")

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
            if nxt == 0x00:
                self.pos += 2  # stuffed 0xFF data byte
            else:
                # marker reached (EOI / RSTn seen early): T.81 says pad
                # with 1-bits; a well-formed stream never reads them
                self.bitbuf = (self.bitbuf << 8) | 0xFF
                self.nbits += 8
                return
        else:
            self.pos += 1
        self.bitbuf = (self.bitbuf << 8) | b
        self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("truncated JPEG entropy data")
            self._fill()
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def decode(self, table: _Huff) -> int:
        code = 0
        lut = table.lut
        for ln in range(1, 17):
            code = (code << 1) | self.bit()
            v = lut.get((ln, code))
            if v is not None:
                return v
        raise ValueError("invalid Huffman code in JPEG stream")

    def sync_restart(self, n: int) -> None:
        """Consume the RSTn marker at a restart boundary and byte-align."""
        self.bitbuf = 0
        self.nbits = 0
        d = self.data
        # skip any pad 0xFFs, then expect FFD0+n
        p = self.pos
        while p + 1 < len(d) and d[p] == 0xFF and d[p + 1] == 0xFF:
            p += 1
        if p + 1 >= len(d) or d[p] != 0xFF or d[p + 1] != 0xD0 + n:
            raise ValueError("missing JPEG restart marker")
        self.pos = p + 2


def _extend(v: int, size: int) -> int:
    """T.81 F.12: map `size` magnitude bits to a signed coefficient."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg(blob: bytes) -> np.ndarray:
    """Decode baseline JPEG bytes to an (h, w) or (h, w, 3) uint8 array."""
    if len(blob) < 4 or blob[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _Huff] = {}  # (class 0=DC/1=AC, id)
    frame = None
    restart_interval = 0
    i = 2
    n = len(blob)
    while i < n - 1:
        if blob[i] != 0xFF:
            raise ValueError("JPEG marker desync")
        m = blob[i + 1]
        if m == 0xFF:  # spec-legal 0xFF fill byte before a marker
            i += 1
            continue
        if m == 0xD9:  # EOI before SOS
            raise ValueError("JPEG has no scan data")
        if m in (0x01,) or 0xD0 <= m <= 0xD7:
            i += 2
            continue
        if i + 4 > n:
            raise ValueError("truncated JPEG header")
        seg_len = struct.unpack(">H", blob[i + 2 : i + 4])[0]
        seg = blob[i + 4 : i + 2 + seg_len]
        if len(seg) != seg_len - 2:
            raise ValueError("truncated JPEG segment")
        if m == 0xDB:  # DQT: one or more tables
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 15
                if pq != 0:
                    raise NotImplementedError("16-bit quantization tables")
                qt[tq] = np.frombuffer(seg[p + 1 : p + 65], dtype=np.uint8).astype(np.int32)
                p += 65
        elif m == 0xC4:  # DHT: one or more tables
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                bits = list(seg[p + 1 : p + 17])
                nv = sum(bits)
                huff[(tc, th)] = _Huff(bits, seg[p + 17 : p + 17 + nv])
                p += 17 + nv
        elif m in (0xC0, 0xC1):  # baseline / extended sequential Huffman
            prec, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG precision")
            if nc not in (1, 3):
                raise NotImplementedError(f"{nc}-component JPEG (CMYK?)")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq})
            frame = {"w": w, "h": h, "comps": comps}
        elif m == 0xC2:
            raise NotImplementedError("progressive JPEG (SOF2)")
        elif m in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(f"JPEG SOF marker 0x{m:02x} (non-baseline)")
        elif m == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif m == 0xDA:  # SOS: entropy-coded data follows
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            sel = {}
            for c in range(ns):
                cid, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                sel[cid] = (tt >> 4, tt & 15)  # (dc table, ac table)
            return _decode_scan(
                blob, i + 2 + seg_len, frame, sel, qt, huff, restart_interval
            )
        i += 2 + seg_len
    raise ValueError("JPEG ended before SOS")


def _decode_scan(blob, pos, frame, sel, qt, huff, restart_interval):
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = [
        np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64)
        for c in comps
    ]
    for c in comps:
        if c["tq"] not in qt:
            raise ValueError(f"JPEG missing quant table {c['tq']}")
        cid = c["id"]
        if cid not in sel:
            raise NotImplementedError("multi-scan (non-interleaved) JPEG")
        if (0, sel[cid][0]) not in huff or (1, sel[cid][1]) not in huff:
            raise ValueError("JPEG missing Huffman table")
    r = _BitReader(blob, pos)
    pred = [0] * len(comps)
    zz = _ZIGZAG
    a, at = _IDCT_A, _IDCT_A.T
    mcu_count = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                r.sync_restart(rst)
                rst = (rst + 1) & 7
                pred = [0] * len(comps)
            for ci, c in enumerate(comps):
                dc_t = huff[(0, sel[c["id"]][0])]
                ac_t = huff[(1, sel[c["id"]][1])]
                q = qt[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coef = np.zeros(64, dtype=np.float64)
                        s = r.decode(dc_t)
                        if s > 11:
                            raise ValueError("invalid JPEG DC category")
                        pred[ci] += _extend(r.bits(s), s)
                        coef[0] = pred[ci] * q[0]
                        k = 1
                        while k < 64:
                            rs = r.decode(ac_t)
                            rr, ss = rs >> 4, rs & 15
                            if ss == 0:
                                if rr == 15:  # ZRL: 16 zeros
                                    k += 16
                                    continue
                                break  # EOB
                            k += rr
                            if k > 63:
                                raise ValueError("JPEG AC coefficient overrun")
                            coef[k] = _extend(r.bits(ss), ss) * q[k]
                            k += 1
                        block = np.zeros(64, dtype=np.float64)
                        block[zz] = coef
                        px = a @ block.reshape(8, 8) @ at + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = px
            mcu_count += 1
    # upsample to full MCU-padded luma resolution (sample replication —
    # nearest neighbor, JFIF-legal), then crop to the true frame size
    full = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full.append(p[:h, :w])
    if len(comps) == 1:
        return np.clip(full[0], 0, 255).astype(np.uint8)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    rgb = np.stack(
        [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb],
        axis=2,
    )
    return np.clip(rgb, 0, 255).astype(np.uint8)
