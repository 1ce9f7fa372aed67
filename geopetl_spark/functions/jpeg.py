"""JPEG (JFIF) decoder — stdlib + numpy only, baseline AND progressive.

Implemented from the public ITU-T T.81 spec (no image libraries ship in
this container): marker parse (DQT/DHT/SOF0-2/DRI/SOS), canonical Huffman
decode of the entropy-coded segments (byte-stuffing + restart markers),
per-component coefficient accumulation across scans (progressive spectral
selection + successive approximation, T.81 G.2), dequantize → de-zigzag →
exact float 8×8 IDCT (separable DCT-III basis, one batched numpy matmul
per component), nearest-neighbor chroma upsampling for 4:2:0/4:2:2/4:1:1,
YCbCr→RGB per JFIF. Grayscale (1 component) and YCbCr (3 components)
frames supported, sequential (SOF0/1) and progressive (SOF2).

Arithmetic-coded (SOF9+), hierarchical, lossless, 12-bit, and CMYK frames
raise ``NotImplementedError`` — captured PER ROW by the multimodal
plumbing (never a partition kill), same policy as the other codecs in
:mod:`geopetl_spark.functions.multimodal`.

This is the correctness-reference path: the per-image Huffman loop is
plain Python (bounded by image size, not corpus size); corpus-scale decode
throughput comes from the Arrow-batched ``mapInPandas`` plumbing that
parallelizes WHOLE IMAGES across executor cores, which is the unit that
matters at 100 TB (one image never spans partitions). Validated against
Java ImageIO (Spark's ``image`` data source) on Spark's public mllib
sample JPEGs — both baseline and progressive.

geopetl parity: binary media columns map to the reference's LOB handling
(/root/reference/geopetl/oracle_sde.py:1114-1129); the reference has no
media decoding at all — this is engine-extension surface.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag order: index i of the scan -> flat (row*8 + col) in the 8x8 block
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
    """MSB-first reader over an entropy-coded segment. 0xFF00 stuffing is
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
                # marker reached (EOI / next SOS / RSTn seen early): T.81
                # says pad with 1-bits; a well-formed stream never reads them
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
        p = self.pos
        while p + 1 < len(d) and d[p] == 0xFF and d[p + 1] == 0xFF:
            p += 1
        if p + 1 >= len(d) or d[p] != 0xFF or d[p + 1] != 0xD0 + n:
            raise ValueError("missing JPEG restart marker")
        self.pos = p + 2

    def end_of_segment(self) -> int:
        """Byte position just past the entropy data (at the next marker)."""
        d = self.data
        p = self.pos
        while p + 1 < len(d):
            if d[p] == 0xFF and d[p + 1] != 0x00:
                return p
            p += 1
        return len(d)


def _extend(v: int, size: int) -> int:
    """T.81 F.12: map `size` magnitude bits to a signed coefficient."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg(blob: bytes) -> np.ndarray:
    """Decode JPEG bytes to an (h, w) or (h, w, 3) uint8 array."""
    if len(blob) < 4 or blob[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _Huff] = {}  # (class 0=DC/1=AC, id)
    frame = None
    coefs: list[np.ndarray] = []
    dcpred: list[int] = []
    restart_interval = 0
    any_scan = False
    i = 2
    n = len(blob)
    while i < n - 1:
        if blob[i] != 0xFF:
            raise ValueError("JPEG marker desync")
        m = blob[i + 1]
        if m == 0xFF:  # spec-legal 0xFF fill byte before a marker
            i += 1
            continue
        if m == 0xD9:  # EOI
            break
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
        elif m == 0xC4:  # DHT: one or more tables (redefinable between scans)
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                bits = list(seg[p + 1 : p + 17])
                nv = sum(bits)
                huff[(tc, th)] = _Huff(bits, seg[p + 17 : p + 17 + nv])
                p += 17 + nv
        elif m in (0xC0, 0xC1, 0xC2):  # sequential (0/1) or progressive (2)
            if frame is not None:
                raise NotImplementedError("hierarchical JPEG (multiple frames)")
            prec, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG precision")
            if nc not in (1, 3):
                raise NotImplementedError(f"{nc}-component JPEG (CMYK?)")
            if h == 0 or w == 0:
                raise ValueError("zero-dimension JPEG frame")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq})
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            frame = {
                "w": w, "h": h, "comps": comps,
                "hmax": hmax, "vmax": vmax,
                "mcux": -(-w // (8 * hmax)), "mcuy": -(-h // (8 * vmax)),
                "progressive": m == 0xC2,
            }
            for c in comps:
                # MCU-padded block grid (interleaved scans touch pad blocks);
                # true per-component grid used by non-interleaved scans
                c["bw"] = frame["mcux"] * c["h"]
                c["bh"] = frame["mcuy"] * c["v"]
                c["bw_true"] = -(-(-(-w * c["h"] // hmax)) // 8)
                c["bh_true"] = -(-(-(-h * c["v"] // vmax)) // 8)
                coefs.append(np.zeros((c["bh"], c["bw"], 64), dtype=np.int32))
                dcpred.append(0)
        elif m in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(f"JPEG SOF marker 0x{m:02x} (non-baseline/progressive)")
        elif m == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif m == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            scan = []
            for c in range(ns):
                cid, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                idx = next(
                    (k for k, fc in enumerate(frame["comps"]) if fc["id"] == cid), None
                )
                if idx is None:
                    raise ValueError("JPEG scan references unknown component")
                scan.append((idx, tt >> 4, tt & 15))  # (comp index, dc tbl, ac tbl)
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ah, al = seg[3 + 2 * ns] >> 4, seg[3 + 2 * ns] & 15
            if not frame["progressive"]:
                ss, se, ah, al = 0, 63, 0, 0
            i = _decode_scan(
                blob, i + 2 + seg_len, frame, scan, ss, se, ah, al,
                qt, huff, restart_interval, coefs, dcpred,
            )
            any_scan = True
            continue
        i += 2 + seg_len
    if frame is None or not any_scan:
        raise ValueError("JPEG has no scan data")
    return _reconstruct(frame, coefs, qt)


def _decode_scan(blob, pos, frame, scan, ss, se, ah, al, qt, huff, ri, coefs, dcpred):
    """Decode one entropy-coded segment into the coefficient arrays.
    Returns the byte offset just past the segment (at the next marker).
    Sequential scans are the ss=0..se=63, ah=al=0 special case of the
    progressive band logic (T.81 G.2): first DC/AC scans place
    coefficients shifted left by ``al``; refinement scans (ah>0) add one
    correction bit per coefficient."""
    comps = frame["comps"]
    for ci, dct, act in scan:
        c = comps[ci]
        # DC refinement (ss=0, ah>0) reads raw bits — no DC table needed;
        # AC passes (first and refinement) both consume run/size codes
        if ss == 0 and ah == 0 and (0, dct) not in huff:
            raise ValueError("JPEG missing DC Huffman table")
        if se > 0 and (1, act) not in huff:
            raise ValueError("JPEG missing AC Huffman table")
        if c["tq"] not in qt:
            raise ValueError(f"JPEG missing quant table {c['tq']}")
    r = _BitReader(blob, pos)
    interleaved = len(scan) > 1
    state = {"eobrun": 0}
    for ci, _, _ in scan:
        dcpred[ci] = 0

    def block(ci, dct, act, by, bx):
        cf = coefs[ci][by, bx]
        if ss == 0:  # DC band
            if ah == 0:
                s = r.decode(huff[(0, dct)])
                if s > 11:
                    raise ValueError("invalid JPEG DC category")
                dcpred[ci] += _extend(r.bits(s), s)
                cf[0] = dcpred[ci] << al
            else:  # DC refinement: one bit
                if r.bit():
                    cf[0] = int(cf[0]) | (1 << al)
            if se == 0:
                return
            k = 1
        else:
            k = ss
        if ah == 0:  # AC first pass (or sequential)
            if state["eobrun"] > 0:
                state["eobrun"] -= 1
                return
            ac = huff[(1, act)]
            while k <= se:
                rs = r.decode(ac)
                rr, sz = rs >> 4, rs & 15
                if sz == 0:
                    if rr == 15:  # ZRL
                        k += 16
                        continue
                    if frame["progressive"]:
                        state["eobrun"] = (1 << rr) - 1 + (r.bits(rr) if rr else 0)
                    return  # EOB
                k += rr
                if k > se:
                    raise ValueError("JPEG AC coefficient overrun")
                cf[k] = _extend(r.bits(sz), sz) << al
                k += 1
        else:  # AC refinement (T.81 G.7.2, the libjpeg-documented algorithm)
            p1, m1 = 1 << al, -1 << al
            ac = huff[(1, act)]
            if state["eobrun"] == 0:
                while k <= se:
                    rs = r.decode(ac)
                    rr, sz = rs >> 4, rs & 15
                    val = 0
                    if sz == 0:
                        if rr < 15:
                            # the run INCLUDES the current block: remaining
                            # nonzero coefs below still take correction bits
                            # (trailing sweep), then eobrun decrements
                            state["eobrun"] = (1 << rr) + (r.bits(rr) if rr else 0)
                            break
                        # rr == 15: skip 16 zero-history coefficients
                    else:
                        if sz != 1:
                            raise ValueError("invalid JPEG refinement size")
                        val = p1 if r.bit() else m1
                    while k <= se:
                        if cf[k] != 0:
                            if r.bit() and (int(cf[k]) & p1) == 0:
                                cf[k] = int(cf[k]) + (p1 if cf[k] > 0 else m1)
                        else:
                            if rr == 0:
                                if val:
                                    cf[k] = val
                                k += 1
                                break
                            rr -= 1
                        k += 1
            if state["eobrun"] > 0:
                while k <= se:
                    if cf[k] != 0:
                        if r.bit() and (int(cf[k]) & p1) == 0:
                            cf[k] = int(cf[k]) + (p1 if cf[k] > 0 else m1)
                    k += 1
                state["eobrun"] -= 1

    rst = 0
    unit = 0
    if interleaved:
        for my in range(frame["mcuy"]):
            for mx in range(frame["mcux"]):
                if ri and unit and unit % ri == 0:
                    r.sync_restart(rst)
                    rst = (rst + 1) & 7
                    for ci2, _, _ in scan:
                        dcpred[ci2] = 0
                    state["eobrun"] = 0
                for ci, dct, act in scan:
                    c = comps[ci]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            block(ci, dct, act, my * c["v"] + by, mx * c["h"] + bx)
                unit += 1
    else:
        ci, dct, act = scan[0]
        c = comps[ci]
        for by in range(c["bh_true"]):
            for bx in range(c["bw_true"]):
                if ri and unit and unit % ri == 0:
                    r.sync_restart(rst)
                    rst = (rst + 1) & 7
                    dcpred[ci] = 0
                    state["eobrun"] = 0
                block(ci, dct, act, by, bx)
                unit += 1
    return r.end_of_segment()


def _reconstruct(frame, coefs, qt):
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    zz = _ZIGZAG
    a, at = _IDCT_A, _IDCT_A.T
    full = []
    for ci, c in enumerate(comps):
        bh, bw = c["bh"], c["bw"]
        q = qt[c["tq"]].astype(np.float64)
        flat = coefs[ci].reshape(-1, 64).astype(np.float64) * q  # zigzag order
        nat = np.zeros_like(flat)
        nat[:, zz] = flat
        blocks = a @ nat.reshape(-1, 8, 8) @ at + 128.0  # batched IDCT
        plane = (
            blocks.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
        )
        ry, rx = frame["vmax"] // c["v"], frame["hmax"] // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        full.append(plane[:h, :w])
    if len(comps) == 1:
        return np.clip(full[0], 0, 255).astype(np.uint8)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    rgb = np.stack(
        [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb],
        axis=2,
    )
    return np.clip(rgb, 0, 255).astype(np.uint8)
