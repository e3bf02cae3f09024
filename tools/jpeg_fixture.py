"""Hand-rolled baseline JFIF encoder for the stdlib JPEG decoder tests.

Deliberately NOT a mirror of the decoder: the encoder writes CHOSEN
quantized coefficients directly (no forward DCT anywhere), with its own
trivially-valid canonical Huffman tables (all 12 DC categories at 4
bits, all run/size AC symbols at 8 bits — both leave the all-ones code
of their length unused, as ITU T.81 requires), so tests can pin the
decoder against spec-formula expectations computed from the same
coefficients by :func:`reference_pixels` — a plain double-loop IDCT of
T.81 A.3.3, no shared matrix code.
"""

from __future__ import annotations

import math
import struct

ZIGZAG = (
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
)

# test Huffman spec: DC categories 0..11 all at 4 bits (codes 0..11,
# all-ones 1111 unused); AC run/size pairs all at 8 bits (codes 0..175,
# all-ones 11111111 unused)
DC_SYMBOLS = list(range(12))
AC_SYMBOLS = [(r << 4) | s for r in range(16) for s in range(11)]


def _canonical_codes(symbols: list, length: int) -> dict:
    """symbol -> (code, length) with every symbol at the same length."""
    return {sym: (i, length) for i, sym in enumerate(symbols)}


_DC_CODES = _canonical_codes(DC_SYMBOLS, 4)
_AC_CODES = _canonical_codes(AC_SYMBOLS, 8)


class _BitWriter:
    """MSB-first bit writer with JPEG byte stuffing (FF -> FF 00)."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)
                self.acc = 0
                self.nbits = 0

    def flush(self) -> None:
        """Pad the final partial byte with 1 bits (T.81 F.1.2.3)."""
        while self.nbits:
            self.write(1, 1)


def _category(v: int) -> int:
    return abs(v).bit_length()


def _write_coeff(bw: _BitWriter, codes: dict, sym: int, v: int, t: int):
    code, ln = codes[sym]
    bw.write(code, ln)
    if t:
        bw.write(v + (1 << t) - 1 if v < 0 else v, t)


def encode_jpeg(
    width: int,
    height: int,
    components: list,
    qtables: dict,
    restart_interval: int = 0,
) -> bytes:
    """Baseline JFIF bytes from chosen quantized coefficients.

    ``components``: list of dicts ``{id, h, v, tq, blocks}`` where
    ``blocks`` maps ``(block_row, block_col)`` in the component's
    MCU-padded block grid to 64 quantized coefficients in NATURAL
    (row-major) order; missing blocks are all-zero. ``qtables``: maps
    table id -> 64 ints in NATURAL order (zigzagged into the DQT
    segment, as the spec stores them).
    """
    out = bytearray(b"\xff\xd8")
    # JFIF APP0 (optional but typical)
    app0 = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xff\xe0" + struct.pack(">H", 2 + len(app0)) + app0
    for tq, tab in sorted(qtables.items()):
        body = bytes([tq]) + bytes(tab[ZIGZAG[k]] for k in range(64))
        out += b"\xff\xdb" + struct.pack(">H", 2 + len(body)) + body
    # one DHT segment carrying both tables (class 0 id 0, class 1 id 0)
    dc_counts = [0] * 16
    dc_counts[3] = len(DC_SYMBOLS)
    ac_counts = [0] * 16
    ac_counts[7] = len(AC_SYMBOLS)
    body = (bytes([0x00]) + bytes(dc_counts) + bytes(DC_SYMBOLS)
            + bytes([0x10]) + bytes(ac_counts) + bytes(AC_SYMBOLS))
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # SOF0
    body = bytes([8]) + struct.pack(">HH", height, width) \
        + bytes([len(components)])
    for c in components:
        body += bytes([c["id"], (c["h"] << 4) | c["v"], c["tq"]])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(body)) + body
    # SOS (every component, test tables 0/0)
    body = bytes([len(components)])
    for c in components:
        body += bytes([c["id"], 0x00])
    body += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(body)) + body

    hmax = max(c["h"] for c in components)
    vmax = max(c["v"] for c in components)
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))
    bw = _BitWriter()
    preds = {c["id"]: 0 for c in components}
    rst = 0
    for mcu in range(mcus_x * mcus_y):
        if restart_interval and mcu and mcu % restart_interval == 0:
            bw.flush()
            out += bw.out
            bw = _BitWriter()
            out += bytes([0xFF, 0xD0 + rst % 8])
            rst += 1
            preds = {c["id"]: 0 for c in components}
        my, mx = divmod(mcu, mcus_x)
        for c in components:
            for bv in range(c["v"]):
                for bh in range(c["h"]):
                    blk = c["blocks"].get(
                        (my * c["v"] + bv, mx * c["h"] + bh), [0] * 64
                    )
                    zz = [blk[ZIGZAG[k]] for k in range(64)]
                    diff = zz[0] - preds[c["id"]]
                    preds[c["id"]] = zz[0]
                    _write_coeff(bw, _DC_CODES, _category(diff), diff,
                                 _category(diff))
                    run = 0
                    for k in range(1, 64):
                        if zz[k] == 0:
                            run += 1
                            continue
                        while run > 15:
                            _write_coeff(bw, _AC_CODES, 0xF0, 0, 0)
                            run -= 16
                        s = _category(zz[k])
                        _write_coeff(bw, _AC_CODES, (run << 4) | s,
                                     zz[k], s)
                        run = 0
                    if run:
                        _write_coeff(bw, _AC_CODES, 0x00, 0, 0)  # EOB
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


def reference_pixels(
    width: int, height: int, components: list, qtables: dict
) -> bytes:
    """Spec-formula expected pixels for :func:`encode_jpeg` input: plain
    double-loop T.81 A.3.3 IDCT per block (no numpy, no shared code with
    the decoder), round + clip per component, nearest-replication
    upsample, JFIF YCbCr->RGB with round + clip."""

    def idct_block(coeffs: list, qtab: list) -> list:
        spatial = [[0.0] * 8 for _ in range(8)]
        for py in range(8):
            for px in range(8):
                acc = 0.0
                for u in range(8):
                    cu = 1 / math.sqrt(2) if u == 0 else 1.0
                    for v in range(8):
                        cv = 1 / math.sqrt(2) if v == 0 else 1.0
                        f = coeffs[8 * u + v] * qtab[8 * u + v]
                        acc += (cu * cv / 4.0 * f
                                * math.cos((2 * py + 1) * u * math.pi / 16)
                                * math.cos((2 * px + 1) * v * math.pi / 16))
                spatial[py][px] = acc + 128.0
        return spatial

    def rnd(x: float) -> int:
        # numpy-style banker's rounding, then clip
        lo = math.floor(x)
        frac = x - lo
        if frac > 0.5 or (frac == 0.5 and lo % 2):
            lo += 1
        return min(255, max(0, lo))

    hmax = max(c["h"] for c in components)
    vmax = max(c["v"] for c in components)
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))
    planes = []
    for c in components:
        bw_, bh_ = mcus_x * c["h"], mcus_y * c["v"]
        plane = [[0] * (bw_ * 8) for _ in range(bh_ * 8)]
        for by in range(bh_):
            for bx in range(bw_):
                blk = c["blocks"].get((by, bx), [0] * 64)
                sp = idct_block(blk, qtables[c["tq"]])
                for py in range(8):
                    for px in range(8):
                        plane[by * 8 + py][bx * 8 + px] = rnd(sp[py][px])
        # replicate-upsample to full resolution, crop to (height, width)
        ry, rx = vmax // c["v"], hmax // c["h"]
        up = [[plane[y // ry][x // rx] for x in range(width)]
              for y in range(height)]
        planes.append(up)
    out = bytearray()
    if len(components) == 1:
        for row in planes[0]:
            out += bytes(row)
        return bytes(out)
    yp, cbp, crp = planes
    for y in range(height):
        for x in range(width):
            yy, cb, cr = float(yp[y][x]), float(cbp[y][x]), float(crp[y][x])
            out.append(rnd(yy + 1.402 * (cr - 128.0)))
            out.append(rnd(yy - 0.344136 * (cb - 128.0)
                           - 0.714136 * (cr - 128.0)))
            out.append(rnd(yy + 1.772 * (cb - 128.0)))
    return bytes(out)


def _flush_eobrun(bw: _BitWriter, st: dict) -> None:
    """Emit a pending EOBn symbol (n = floor(log2(run)), n low bits of
    the run as the extension) followed by the correction bits buffered
    across the run's blocks (refinement scans only)."""
    if st["eobrun"]:
        n = st["eobrun"].bit_length() - 1
        _write_coeff(bw, _AC_CODES, n << 4, 0, 0)
        if n:
            bw.write(st["eobrun"] & ((1 << n) - 1), n)
        st["eobrun"] = 0
    for b in st["pend_old"]:
        bw.write(b, 1)
    st["pend_old"] = []


def _pt_ac(v: int, al: int) -> int:
    """AC point transform: divide by 2^Al rounding TOWARD ZERO
    (T.81 G.1.2.2 — unlike DC's arithmetic shift)."""
    return -((-v) >> al) if v < 0 else v >> al


def _ac_first_block(bw: _BitWriter, zz: list, ss: int, se: int,
                    al: int, st: dict) -> None:
    r = 0
    for k in range(ss, se + 1):
        v = _pt_ac(zz[k], al)
        if v == 0:
            r += 1
            continue
        _flush_eobrun(bw, st)
        while r > 15:
            _write_coeff(bw, _AC_CODES, 0xF0, 0, 0)
            r -= 16
        s = _category(v)
        _write_coeff(bw, _AC_CODES, (r << 4) | s, v, s)
        r = 0
    if r > 0:
        st["eobrun"] += 1
        if st["eobrun"] == 0x7FFF:
            _flush_eobrun(bw, st)


def _ac_refine_block(bw: _BitWriter, zz: list, ss: int, se: int,
                     al: int, st: dict) -> None:
    """T.81 G.1.2.3 refinement encoding (the libjpeg formulation):
    newly-nonzero coefficients (|v| == 1 at this precision) are coded
    as (zero-history-run, 1) + sign bit; coefficients already nonzero
    get one buffered correction bit emitted after the next symbol;
    trailing runs fold into the EOB run, their correction bits buffered
    until the EOBn flush."""
    absv = [abs(zz[k]) >> al for k in range(ss, se + 1)]
    eobpos = ss - 1
    for k in range(ss, se + 1):
        if absv[k - ss] == 1:
            eobpos = k
    r = 0
    cur: list = []
    for k in range(ss, se + 1):
        t = absv[k - ss]
        if t == 0:
            r += 1
            continue
        while r > 15 and k <= eobpos:
            _flush_eobrun(bw, st)
            _write_coeff(bw, _AC_CODES, 0xF0, 0, 0)
            r -= 16
            for b in cur:
                bw.write(b, 1)
            cur = []
        if t > 1:
            cur.append(t & 1)
            continue
        _flush_eobrun(bw, st)
        _write_coeff(bw, _AC_CODES, (r << 4) | 1, 0, 0)
        bw.write(1 if zz[k] > 0 else 0, 1)
        for b in cur:
            bw.write(b, 1)
        cur = []
        r = 0
    if r > 0 or cur:
        st["eobrun"] += 1
        st["pend_old"].extend(cur)
        if st["eobrun"] == 0x7FFF:
            _flush_eobrun(bw, st)


def encode_jpeg_progressive(
    width: int,
    height: int,
    components: list,
    qtables: dict,
    scans: list | None = None,
    restart_interval: int = 0,
) -> bytes:
    """Progressive (SOF2) JFIF bytes from the same chosen quantized
    coefficients as :func:`encode_jpeg` — the independent oracle for
    the decoder's progressive path: both encodings carry IDENTICAL
    coefficients, so their decodes must be byte-identical pixels.

    ``scans``: list of ``{"comps": [ids], "ss", "se", "ah", "al"}``
    dicts; the default script is a typical full successive-
    approximation ladder (DC first at Al=1, per-component AC bands
    1-5 / 6-63 at Al=2, AC refinements Al=1 then Al=0, DC refinement).
    Fixture limits (T.81 allows more): DC scans cover ALL components
    (interleaved, frame MCU order) or exactly one; AC scans exactly
    one component — coded over the component's ceil(cw/8) x
    ceil(ch/8) grid (NOT the MCU-padded grid), so tests combining
    subsampling with partial MCUs must keep AC coefficients out of
    MCU-padding blocks. ``restart_interval`` applies per scan (units =
    MCUs for interleaved scans, blocks otherwise), flushing the EOB
    run and buffered correction bits at each boundary as the spec
    requires.
    """
    hmax = max(c["h"] for c in components)
    vmax = max(c["v"] for c in components)
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))
    ids = [c["id"] for c in components]
    by_id = {c["id"]: c for c in components}
    if scans is None:
        scans = (
            [{"comps": list(ids), "ss": 0, "se": 0, "ah": 0, "al": 1}]
            + [{"comps": [i], "ss": 1, "se": 5, "ah": 0, "al": 2}
               for i in ids]
            + [{"comps": [i], "ss": 6, "se": 63, "ah": 0, "al": 2}
               for i in ids]
            + [{"comps": [i], "ss": 1, "se": 63, "ah": 2, "al": 1}
               for i in ids]
            + [{"comps": list(ids), "ss": 0, "se": 0, "ah": 1, "al": 0}]
            + [{"comps": [i], "ss": 1, "se": 63, "ah": 1, "al": 0}
               for i in ids]
        )

    def zz_of(c: dict, by: int, bx: int) -> list:
        blk = c["blocks"].get((by, bx), [0] * 64)
        return [blk[ZIGZAG[k]] for k in range(64)]

    out = bytearray(b"\xff\xd8")
    app0 = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xff\xe0" + struct.pack(">H", 2 + len(app0)) + app0
    for tq, tab in sorted(qtables.items()):
        body = bytes([tq]) + bytes(tab[ZIGZAG[k]] for k in range(64))
        out += b"\xff\xdb" + struct.pack(">H", 2 + len(body)) + body
    dc_counts = [0] * 16
    dc_counts[3] = len(DC_SYMBOLS)
    ac_counts = [0] * 16
    ac_counts[7] = len(AC_SYMBOLS)
    body = (bytes([0x00]) + bytes(dc_counts) + bytes(DC_SYMBOLS)
            + bytes([0x10]) + bytes(ac_counts) + bytes(AC_SYMBOLS))
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    body = bytes([8]) + struct.pack(">HH", height, width) \
        + bytes([len(components)])
    for c in components:
        body += bytes([c["id"], (c["h"] << 4) | c["v"], c["tq"]])
    out += b"\xff\xc2" + struct.pack(">H", 2 + len(body)) + body

    for sc in scans:
        comp_list = [by_id[i] for i in sc["comps"]]
        ss, se, ah, al = sc["ss"], sc["se"], sc["ah"], sc["al"]
        if ss == 0 and se != 0:
            raise ValueError("DC scan must have se == 0")
        if ss > 0 and len(comp_list) != 1:
            raise ValueError("AC scans must cover exactly one component")
        if ss == 0 and len(comp_list) not in (1, len(components)):
            raise ValueError(
                "fixture DC scans cover all components or exactly one")
        body = bytes([len(comp_list)])
        for c in comp_list:
            body += bytes([c["id"], 0x00])
        body += bytes([ss, se, (ah << 4) | al])
        out += b"\xff\xda" + struct.pack(">H", 2 + len(body)) + body

        interleaved = len(comp_list) > 1
        if interleaved:
            n_units = mcus_x * mcus_y
        else:
            c0 = comp_list[0]
            if ss == 0:
                # fixture single-component DC scans use the same
                # non-interleaved raster the decoder does
                pass
            cw = -(-width * c0["h"] // hmax)
            ch = -(-height * c0["v"] // vmax)
            nbx = -(-cw // 8)
            nby = -(-ch // 8)
            n_units = nbx * nby
        bw = _BitWriter()
        preds = {c["id"]: 0 for c in comp_list}
        st = {"eobrun": 0, "pend_old": []}
        rst = 0
        for unit in range(n_units):
            if restart_interval and unit and unit % restart_interval == 0:
                _flush_eobrun(bw, st)
                bw.flush()
                out += bw.out
                bw = _BitWriter()
                out += bytes([0xFF, 0xD0 + rst % 8])
                rst += 1
                preds = {c["id"]: 0 for c in comp_list}
                st = {"eobrun": 0, "pend_old": []}

            def dc_block(zz, cid):
                if ah == 0:
                    v = zz[0] >> al  # DC: arithmetic shift (G.1.2.1)
                    diff = v - preds[cid]
                    preds[cid] = v
                    t = _category(diff)
                    _write_coeff(bw, _DC_CODES, t, diff, t)
                else:
                    bw.write((zz[0] >> al) & 1, 1)

            if interleaved:
                my, mx = divmod(unit, mcus_x)
                for c in comp_list:
                    for bv in range(c["v"]):
                        for bh in range(c["h"]):
                            dc_block(
                                zz_of(c, my * c["v"] + bv,
                                      mx * c["h"] + bh),
                                c["id"],
                            )
            else:
                c0 = comp_list[0]
                by, bx = divmod(unit, nbx)
                zz = zz_of(c0, by, bx)
                if ss == 0:
                    dc_block(zz, c0["id"])
                elif ah == 0:
                    _ac_first_block(bw, zz, ss, se, al, st)
                else:
                    _ac_refine_block(bw, zz, ss, se, al, st)
        _flush_eobrun(bw, st)
        bw.flush()
        out += bw.out
    out += b"\xff\xd9"
    return bytes(out)
