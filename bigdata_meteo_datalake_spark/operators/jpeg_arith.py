"""Arithmetic-coded JPEG entropy layer (ITU-T T.81 Annex D QM-coder +
Annex F/G statistical models) — closes the last JPEG coding-process
boundary: SOF9 (extended sequential, arithmetic) and SOF10 (progressive,
arithmetic), 8- and 12-bit, both DECODE and ENCODE.

The QM-coder is implemented from the public T.81 Annex D flowcharts in
the lazy-renormalization register convention (the byte-aligned C register
with a bit-shift counter) that the public-domain IJG implementation also
uses, because it avoids carrying C and A shifts in lockstep:

- decoder: C accumulates raw stream bytes; ``ct`` counts how many bits C
  is ahead of A's scale, so the interval comparison is
  ``C >= (A - Qe) << ct`` (MPS subinterval at the BOTTOM, LPS on top —
  the QM convention; the later MQ-coder of T.88/JPEG 2000 swaps them).
- encoder: CODEMPS is the cheap path (A -= Qe, no C change); CODELPS
  adds the MPS subinterval to C; conditional MPS/LPS exchange when the
  LPS estimate Qe exceeds the MPS subinterval; carry resolution via the
  stacked-0xFF convention of Figure D.9 and 0x00 byte stuffing after
  0xFF in the output stream.

Probability estimation state machine: Table D.3 (113 adaptive states +
the non-adaptive "fixed" half-probability state used for AC signs),
transcribed from the published standard. Each statistics bin is one
byte: low 7 bits = state index, high bit = current MPS sense. State
transitions happen ONLY on renormalization (D.1.5/D.2.5).

Statistical models (what decision uses which bin):

- DC (F.1.4.1/F.2.4.1): per-component conditioning context in
  {0,4,8,12,16} chosen by classifying the PREVIOUS diff against the
  (L,U) conditioning bounds; bins 0..19 hold the zero/sign/first-magnitude
  decisions, the magnitude-category chain starts at bin 20 (Table F.4
  X1), mantissa bits ride 14 bins above the category chain end.
- AC (F.1.4.2/F.2.4.2): 3 bins per band position k (EOB decision,
  zero/nonzero, first magnitude), category chains at bins 189 / 217
  split by the Kx conditioning bound, sign through the fixed bin.
- Progressive (G.1.3): DC-first = sequential DC in the point-transformed
  domain; DC-refinement = one fixed-bin bit; AC-first = sequential AC
  over the spectral band; AC-refinement = correction bits for
  history-nonzero coefficients + newly-nonzero insertions, with the EOB
  decision suppressed below the previous stage's end-of-block index.

Self-consistency (encode -> decode bit-exact on every fixture, fuzzed
shapes, every subsampling/precision/restart mix) is proven in
tests/test_multimodal.py, along with hand-traced register pins for the
first coder steps. Known evidence boundary, stated plainly: no
third-party arithmetic JPEG exists in this container (PIL/libjpeg are
absent), so cross-implementation interop of the Table D.3 transition
entries is pinned by spot values + structural invariants rather than a
reference bitstream.

Reference parity note: the reference repo has no codec layer at all
(SURVEY.md section 4) — this module belongs to the multimodal
training-data pillar.
"""

from __future__ import annotations

#: T.81 Table D.3: (Qe, NMPS, NLPS, switch) for the 113 adaptive states,
#: plus the non-adaptive fixed half-probability state at index 113 used
#: for AC sign decisions (transitions to itself, never switches).
_ARITH_TAB = (
    (0x5A1D, 1, 1, 1), (0x2586, 2, 14, 0), (0x1114, 3, 16, 0),
    (0x080B, 4, 18, 0), (0x03D8, 5, 20, 0), (0x01DA, 6, 23, 0),
    (0x00E5, 7, 25, 0), (0x006F, 8, 28, 0), (0x0036, 9, 30, 0),
    (0x001A, 10, 33, 0), (0x000D, 11, 35, 0), (0x0006, 12, 9, 0),
    (0x0003, 13, 10, 0), (0x0001, 13, 12, 0), (0x5A7F, 15, 15, 1),
    (0x3F25, 16, 36, 0), (0x2CF2, 17, 38, 0), (0x207C, 18, 39, 0),
    (0x17B9, 19, 40, 0), (0x1182, 20, 42, 0), (0x0CEF, 21, 43, 0),
    (0x09A1, 22, 45, 0), (0x072F, 23, 46, 0), (0x055C, 24, 48, 0),
    (0x0406, 25, 49, 0), (0x0303, 26, 51, 0), (0x0240, 27, 52, 0),
    (0x01B1, 28, 54, 0), (0x0144, 29, 56, 0), (0x00F5, 30, 57, 0),
    (0x00B7, 31, 59, 0), (0x008A, 32, 60, 0), (0x0068, 33, 62, 0),
    (0x004E, 34, 63, 0), (0x003B, 35, 32, 0), (0x002C, 9, 33, 0),
    (0x5AE1, 37, 37, 1), (0x484C, 38, 64, 0), (0x3A0D, 39, 65, 0),
    (0x2EF1, 40, 67, 0), (0x261F, 41, 68, 0), (0x1F33, 42, 69, 0),
    (0x19A8, 43, 70, 0), (0x1518, 44, 72, 0), (0x1177, 45, 73, 0),
    (0x0E74, 46, 74, 0), (0x0BFB, 47, 75, 0), (0x09F8, 48, 77, 0),
    (0x0861, 49, 78, 0), (0x0706, 50, 79, 0), (0x05CD, 51, 48, 0),
    (0x04DE, 52, 50, 0), (0x040F, 53, 50, 0), (0x0363, 54, 51, 0),
    (0x02D4, 55, 52, 0), (0x025C, 56, 53, 0), (0x01F8, 57, 54, 0),
    (0x01A4, 58, 55, 0), (0x0160, 59, 56, 0), (0x0125, 60, 57, 0),
    (0x00F6, 61, 58, 0), (0x00CB, 62, 59, 0), (0x00AB, 63, 61, 0),
    (0x008F, 32, 61, 0), (0x5B12, 65, 65, 1), (0x4D04, 66, 80, 0),
    (0x412C, 67, 81, 0), (0x37D8, 68, 82, 0), (0x2FE8, 69, 83, 0),
    (0x293C, 70, 84, 0), (0x2379, 71, 86, 0), (0x1EDF, 72, 87, 0),
    (0x1AA9, 73, 87, 0), (0x174E, 74, 72, 0), (0x1424, 75, 72, 0),
    (0x119C, 76, 74, 0), (0x0F6B, 77, 74, 0), (0x0D51, 78, 75, 0),
    (0x0BB6, 79, 77, 0), (0x0A40, 48, 77, 0), (0x5832, 81, 80, 1),
    (0x4D1C, 82, 88, 0), (0x438E, 83, 89, 0), (0x3BDD, 84, 90, 0),
    (0x34EE, 85, 91, 0), (0x2EAE, 86, 92, 0), (0x299A, 87, 93, 0),
    (0x2516, 71, 86, 0), (0x5570, 89, 88, 1), (0x4CA9, 90, 95, 0),
    (0x44D9, 91, 96, 0), (0x3E22, 92, 97, 0), (0x3824, 93, 99, 0),
    (0x32B4, 94, 99, 0), (0x2E17, 86, 93, 0), (0x56A8, 96, 95, 1),
    (0x4F46, 97, 101, 0), (0x47E5, 98, 102, 0), (0x41CF, 99, 103, 0),
    (0x3C3D, 100, 104, 0), (0x375E, 93, 99, 0), (0x5231, 102, 105, 0),
    (0x4C0F, 103, 106, 0), (0x4639, 104, 107, 0), (0x415E, 99, 103, 0),
    (0x5627, 106, 105, 1), (0x50E7, 107, 108, 0), (0x4B85, 103, 109, 0),
    (0x5597, 109, 110, 0), (0x504F, 107, 111, 0), (0x5A10, 111, 110, 1),
    (0x5522, 109, 112, 0), (0x59EB, 111, 112, 1), (0x5A1D, 113, 113, 0),
)

#: index of the non-adaptive half-probability state (AC signs, DC refine)
FIXED_STATE = 113


class ArithDecoder:
    """QM arithmetic decoder over one scan's entropy-coded segment.

    Byte feed per D.2.6: a 0x00 after 0xFF is stuffing (the data byte is
    0xFF); a marker stops the feed and the decoder supplies zero bytes
    from then on (``pos`` freezes ON the marker's 0xFF so the scan
    walker can resume the segment walk)."""

    #: once the stream is exhausted, a bounded number of zero-byte feeds
    #: is legitimate (decoder look-ahead past the final marker); an
    #: unbounded appetite means corrupt dimensions looping forever
    _MAX_ZERO_FEEDS = 64

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.c = 0
        self.a = 0
        self.ct = -16  # forces the two INITDEC byte fetches (D.2.7)
        self.marker_hit = False
        self._zero_feeds = 0

    def _get_byte(self) -> int:
        if self.marker_hit:
            self._zero_feeds += 1
            if self._zero_feeds > self._MAX_ZERO_FEEDS:
                raise ValueError(
                    "arithmetic entropy data exhausted before all blocks "
                    "decoded (truncated or corrupt JPEG)"
                )
            return 0
        d, p = self.data, self.pos
        if p >= len(d):
            self.marker_hit = True
            return 0
        v = d[p]
        if v != 0xFF:
            self.pos = p + 1
            return v
        if p + 1 < len(d) and d[p + 1] == 0x00:
            self.pos = p + 2  # stuffed zero: the data byte is 0xFF
            return 0xFF
        self.marker_hit = True  # a marker: pos stays on the 0xFF
        return 0

    def decode(self, stats: bytearray, i: int) -> int:
        """Decode one binary decision against statistics bin i (D.2.2)."""
        a, c, ct = self.a, self.c, self.ct
        # renormalization + byte feed (lazy: runs before the NEXT
        # decision, so state updates below already happened eagerly)
        while a < 0x8000:
            ct -= 1
            if ct < 0:
                c = (c << 8) | self._get_byte()
                ct += 8
                if ct < 0:  # still initializing (needs two bytes)
                    ct += 1
                    if ct == 0:
                        a = 0x8000  # -> 0x10000 after the shift below
            a <<= 1
        sv = stats[i]
        qe, nmps, nlps, sw = _ARITH_TAB[sv & 0x7F]
        mps = sv >> 7
        a -= qe
        temp = a << ct
        if c >= temp:
            # upper (Qe-sized) subinterval
            c -= temp
            if a < qe:  # conditional exchange: upper belongs to the MPS
                d = mps
                stats[i] = (mps << 7) | nmps
            else:
                d = 1 - mps
                if sw:
                    mps = 1 - mps
                stats[i] = (mps << 7) | nlps
            a = qe
        elif a < 0x8000:
            # lower (MPS-sized) subinterval, renormalization due
            if a < qe:  # conditional exchange: lower belongs to the LPS
                d = 1 - mps
                if sw:
                    mps = 1 - mps
                stats[i] = (mps << 7) | nlps
            else:
                d = mps
                stats[i] = (mps << 7) | nmps
        else:
            d = mps  # no renormalization -> no estimation update (D.2.5)
        self.a, self.c, self.ct = a, c, ct
        return d


class ArithEncoder:
    """QM arithmetic encoder (D.1): carry via the stacked-0xFF
    convention, 0x00 stuffed after every emitted 0xFF."""

    def __init__(self):
        self.a = 0x10000
        self.c = 0
        self.ct = 11
        self.buffer = -1  # pending output byte (may still take a carry)
        self.sc = 0  # count of stacked 0xFF bytes awaiting carry fate
        self.out = bytearray()

    def encode(self, stats: bytearray, i: int, val: int) -> None:
        sv = stats[i]
        qe, nmps, nlps, sw = _ARITH_TAB[sv & 0x7F]
        mps = sv >> 7
        self.a -= qe
        if val != mps:
            # CODELPS (D.1.3): LPS takes the upper Qe-sized subinterval
            # unless it would be the larger piece (conditional exchange)
            if self.a >= qe:
                self.c += self.a
                self.a = qe
            if sw:
                mps = 1 - mps
            stats[i] = (mps << 7) | nlps
        else:
            # CODEMPS: cheap path; estimation only on renormalization
            if self.a >= 0x8000:
                return
            if self.a < qe:  # conditional exchange
                self.c += self.a
                self.a = qe
            stats[i] = (mps << 7) | nmps
        while self.a < 0x8000:
            self.a <<= 1
            self.c <<= 1
            self.ct -= 1
            if self.ct == 0:
                self._byteout()

    def _byteout(self) -> None:
        temp = self.c >> 19
        if temp > 0xFF:
            # carry: ripple into the buffered byte, stacked 0xFFs -> 0x00
            if self.buffer >= 0:
                b = self.buffer + 1
                self.out.append(b)
                if b == 0xFF:
                    self.out.append(0x00)
            self.out.extend(b"\x00" * self.sc)
            self.sc = 0
            self.buffer = temp & 0xFF
        elif temp == 0xFF:
            self.sc += 1  # fate (0xFF00 vs carry) decided later
        else:
            if self.buffer >= 0:
                self.out.append(self.buffer)  # never 0xFF here
            for _ in range(self.sc):
                self.out += b"\xff\x00"
            self.sc = 0
            self.buffer = temp
        self.c &= 0x7FFFF
        self.ct += 8

    def flush(self) -> bytes:
        """D.1.8/D.1.9: pick the in-interval code point with the most
        trailing zeros, push out the remaining register bytes (dropping
        an all-zero tail — the decoder feeds zeros past the marker)."""
        temp = (self.a - 1 + self.c) & 0xFFFF0000
        self.c = temp + 0x8000 if temp < self.c else temp
        self.c <<= self.ct
        if self.c & 0xF8000000:
            if self.buffer >= 0:
                b = self.buffer + 1
                self.out.append(b)
                if b == 0xFF:
                    self.out.append(0x00)
            self.out.extend(b"\x00" * self.sc)
        else:
            if self.buffer >= 0:
                self.out.append(self.buffer)
            for _ in range(self.sc):
                self.out += b"\xff\x00"
        self.sc = 0
        self.buffer = -1
        if self.c & 0x7FFF800:
            b = (self.c >> 19) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)
            if self.c & 0x7F800:
                b = (self.c >> 11) & 0xFF
                self.out.append(b)
                if b == 0xFF:
                    self.out.append(0x00)
        return bytes(self.out)


# --- statistical models: decode ------------------------------------------------------

#: statistics-area sizes (bins per conditioning table)
DC_STAT_BINS = 64
AC_STAT_BINS = 256


def _decode_dc_diff(dec, st, ctx, L, U):
    """One DC difference (F.2.4.1); returns (diff, new context)."""
    base = ctx
    if dec.decode(st, base) == 0:
        return 0, 0
    sign = dec.decode(st, base + 1)
    i = base + 2 + sign
    m = dec.decode(st, i)
    if m:
        i = 20  # Table F.4: X1
        while dec.decode(st, i):
            m <<= 1
            if m == 0x8000:
                raise ValueError("arithmetic DC magnitude overflow")
            i += 1
    # F.1.4.4.1.2: classify THIS diff for the next block's context
    if m < ((1 << L) >> 1):
        ctx = 0
    elif m > ((1 << U) >> 1):
        ctx = 12 + sign * 4
    else:
        ctx = 4 + sign * 4
    v = m
    i += 14  # mantissa bits share one bin per category
    while m := m >> 1:
        if dec.decode(st, i):
            v |= m
    v += 1
    return (-v if sign else v), ctx


def _decode_ac_band(dec, st, fixed, coef, ss, se, al, kx):
    """AC coefficients for one block over band ss..se (F.2.4.2 for the
    sequential full band, G.1.3.2 with the point transform for
    progressive first scans)."""
    k = ss
    while k <= se:
        i = 3 * (k - 1)
        if dec.decode(st, i):
            break  # EOB
        while dec.decode(st, i + 1) == 0:
            i += 3
            k += 1
            if k > se:
                raise ValueError("arithmetic AC run past end of band")
        sign = dec.decode(fixed, 0)
        i += 2
        m = dec.decode(st, i)
        if m:
            if dec.decode(st, i):
                m <<= 1
                i = 189 if k <= kx else 217
                while dec.decode(st, i):
                    m <<= 1
                    if m == 0x8000:
                        raise ValueError("arithmetic AC magnitude overflow")
                    i += 1
        v = m
        i += 14
        while m := m >> 1:
            if dec.decode(st, i):
                v |= m
        v += 1
        coef[k] = (-v if sign else v) << al
        k += 1


def _decode_ac_refine(dec, st, fixed, coef, ss, se, al):
    """Progressive AC refinement for one block (G.1.3.3): correction
    bit per history-nonzero coefficient, newly-nonzero insertions as
    +/-2^Al, EOB decision active only above the previous stage's
    end-of-block index."""
    p1 = 1 << al
    m1 = -p1
    kex = se
    while kex > 0 and not coef[kex]:
        kex -= 1
    k = ss
    while k <= se:
        i = 3 * (k - 1)
        if k > kex and dec.decode(st, i):
            break  # EOB
        while True:
            c = int(coef[k])
            if c:
                if dec.decode(st, i + 2):
                    coef[k] = c + (p1 if c > 0 else m1)
                break
            if dec.decode(st, i + 1):
                coef[k] = m1 if dec.decode(fixed, 0) else p1
                break
            i += 3
            k += 1
            if k > se:
                raise ValueError("arithmetic AC refinement past end of band")
        k += 1


def decode_scan_arith(
    b: bytes,
    data_pos: int,
    scan_comps: list,
    band: tuple,
    coefs: list,
    mcu_geom: tuple,
    restart_interval: int,
    dc_cond: dict,
    ac_cond: dict,
    progressive: bool,
) -> int:
    """Arithmetic twin of jpeg._decode_scan: decode one SOF9/SOF10 scan
    into the frame coefficient store and return the byte position of the
    following marker. ``scan_comps`` is [(comp, Td, Ta), ...] where the
    table ids select conditioning (DAC) and statistics areas. Restart
    markers reset the coder, ALL statistics areas, and the DC state
    (F.2.1.3.1)."""
    ss, se, ah, al = band
    mcux, mcuy = mcu_geom
    interleaved = len(scan_comps) > 1
    sequential = not progressive
    if sequential and (ss, se, ah, al) != (0, 63, 0, 0):
        raise ValueError("sequential arithmetic scan must cover the full band")
    if interleaved and progressive and (ss, se) != (0, 0):
        raise ValueError("progressive interleaved scans carry only the DC band")

    dc_tids = sorted({td for _, td, _ in scan_comps})
    ac_tids = sorted({ta for _, _, ta in scan_comps})

    def fresh():
        return (
            {t: bytearray(DC_STAT_BINS) for t in dc_tids},
            {t: bytearray(AC_STAT_BINS) for t in ac_tids},
            bytearray([FIXED_STATE]),
            [0] * len(scan_comps),  # dc contexts
            [0] * len(scan_comps),  # last dc values
        )

    dc_stats, ac_stats, fixed, dc_ctx, last_dc = fresh()
    dec = ArithDecoder(b, data_pos)

    if interleaved:
        units_total = mcux * mcuy
    else:
        c0 = scan_comps[0][0]
        units_total = c0["nwb"] * c0["nhb"]

    need_dc = ss == 0
    need_ac = se > 0

    def decode_block(ci, c, td, ta, coef):
        if need_dc and ah == 0:
            L, U = dc_cond.get(td, (0, 1))
            diff, dc_ctx[ci] = _decode_dc_diff(
                dec, dc_stats[td], dc_ctx[ci], L, U
            )
            last_dc[ci] += diff
            coef[0] = last_dc[ci] << al
        elif need_dc:  # DC refinement: one fixed-bin bit
            if dec.decode(fixed, 0):
                coef[0] = int(coef[0]) | (1 << al)
        if need_ac and ah == 0:
            kx = ac_cond.get(ta, 5)
            _decode_ac_band(
                dec, ac_stats[ta], fixed, coef, max(ss, 1), se, al, kx
            )
        elif need_ac:
            _decode_ac_refine(dec, ac_stats[ta], fixed, coef, ss, se, al)

    for unit in range(units_total):
        if restart_interval and unit and unit % restart_interval == 0:
            # decoder stops feeding at the marker; skip RSTn and restart.
            # T.81 D.1.8/D.1.9: the encoder MAY leave trailing zero flush
            # bytes (and 0xFF00 stuffing) before the marker — ONLY those.
            # Walk forward requiring every skipped byte to be 0x00 or a
            # stuffed 0xFF00 pair; any other byte between the decoder
            # stop position and the marker is stream corruption, not
            # permitted flush, and must raise rather than be skipped.
            p = dec.pos
            while p + 1 < len(b):
                if b[p] == 0xFF:
                    if b[p + 1] == 0x00:
                        p += 2  # stuffed 0xFF00
                        continue
                    break  # a real marker
                if b[p] != 0x00:
                    raise ValueError(
                        f"non-flush byte 0x{b[p]:02x} before restart "
                        f"marker at offset {p}"
                    )
                p += 1
            if not (p + 1 < len(b) and b[p] == 0xFF and 0xD0 <= b[p + 1] <= 0xD7):
                raise ValueError("expected restart marker")
            dc_stats, ac_stats, fixed, dc_ctx, last_dc = fresh()
            dec = ArithDecoder(b, p + 2)
        if interleaved:
            my, mx = divmod(unit, mcux)
            for ci, (c, td, ta) in enumerate(scan_comps):
                store = coefs[c["idx"]]
                for bv in range(c["v"]):
                    for bh in range(c["h"]):
                        idx = ((my * c["v"] + bv) * c["cols8"]
                               + mx * c["h"] + bh)
                        decode_block(ci, c, td, ta, store[idx])
        else:
            c, td, ta = scan_comps[0]
            brow, bcol = divmod(unit, c["nwb"])
            decode_block(0, c, td, ta, coefs[c["idx"]][brow * c["cols8"] + bcol])

    # resume the segment walk at the next marker
    p = dec.pos
    while p + 1 < len(b):
        if b[p] == 0xFF and b[p + 1] != 0x00:
            if 0xD0 <= b[p + 1] <= 0xD7:
                p += 2
                continue
            return p
        p += 1
    raise ValueError("entropy stream ends without a terminating marker")


# --- statistical models: encode ------------------------------------------------------


def _encode_dc_diff(enc, st, ctx, diff, L, U):
    """One DC difference (F.1.4.1); returns the next context."""
    base = ctx
    if diff == 0:
        enc.encode(st, base, 0)
        return 0
    enc.encode(st, base, 1)
    v = diff
    if v > 0:
        enc.encode(st, base + 1, 0)
        i = base + 2
        sign = 0
    else:
        v = -v
        enc.encode(st, base + 1, 1)
        i = base + 3
        sign = 1
    m = 0
    v -= 1
    if v:
        enc.encode(st, i, 1)
        m = 1
        v2 = v
        i = 20
        while v2 := v2 >> 1:
            enc.encode(st, i, 1)
            m <<= 1
            i += 1
    enc.encode(st, i, 0)
    if m < ((1 << L) >> 1):
        ctx = 0
    elif m > ((1 << U) >> 1):
        ctx = 12 + sign * 4
    else:
        ctx = 4 + sign * 4
    i += 14
    while m := m >> 1:
        enc.encode(st, i, 1 if (m & v) else 0)
    return ctx


def _encode_ac_band(enc, st, fixed, coef, ss, se, al, kx):
    """AC coefficients for one block over band ss..se (F.1.4.2 /
    G.1.2.2 with the point transform for progressive first scans)."""
    ke = se
    while ke >= ss and (abs(int(coef[ke])) >> al) == 0:
        ke -= 1
    k = ss
    while k <= ke:
        i = 3 * (k - 1)
        enc.encode(st, i, 0)  # not EOB yet
        while True:
            v = int(coef[k])
            sign = 1 if v < 0 else 0
            v = abs(v) >> al
            if v:
                break
            enc.encode(st, i + 1, 0)
            i += 3
            k += 1
        enc.encode(st, i + 1, 1)
        enc.encode(fixed, 0, sign)
        i += 2
        m = 0
        v -= 1
        if v:
            enc.encode(st, i, 1)
            m = 1
            v2 = v
            if v2 := v2 >> 1:
                enc.encode(st, i, 1)
                m <<= 1
                i = 189 if k <= kx else 217
                while v2 := v2 >> 1:
                    enc.encode(st, i, 1)
                    m <<= 1
                    i += 1
        enc.encode(st, i, 0)
        i += 14
        while m := m >> 1:
            enc.encode(st, i, 1 if (m & v) else 0)
        k += 1
    if k <= se:
        enc.encode(st, 3 * (k - 1), 1)  # EOB


def _encode_ac_refine(enc, st, fixed, coef, ss, se, ah, al):
    """Progressive AC refinement for one block (G.1.3.3 encode)."""
    ke = se
    while ke >= ss and (abs(int(coef[ke])) >> al) == 0:
        ke -= 1
    kex = ke
    while kex >= ss and (abs(int(coef[kex])) >> ah) == 0:
        kex -= 1
    k = ss
    while k <= ke:
        i = 3 * (k - 1)
        if k > kex:
            enc.encode(st, i, 0)
        while True:
            c = int(coef[k])
            sign = 1 if c < 0 else 0
            v = abs(c) >> al
            if v:
                if v >> 1:  # history-nonzero: correction bit
                    enc.encode(st, i + 2, v & 1)
                else:  # newly nonzero
                    enc.encode(st, i + 1, 1)
                    enc.encode(fixed, 0, sign)
                break
            enc.encode(st, i + 1, 0)
            i += 3
            k += 1
        k += 1
    if k <= se:
        enc.encode(st, 3 * (k - 1), 1)  # EOB


class ArithScanEncoder:
    """Per-scan encoder state bundle: coder + statistics areas + DC
    conditioning state, with restart support (flush, reset, resume)."""

    def __init__(self, n_comps, dc_tids, ac_tids, dc_cond, ac_cond):
        self.n_comps = n_comps
        self.dc_tids = sorted(set(dc_tids))
        self.ac_tids = sorted(set(ac_tids))
        self.dc_cond = dc_cond
        self.ac_cond = ac_cond
        self.chunks: list[bytes] = []
        self._reset()

    def _reset(self):
        self.enc = ArithEncoder()
        self.dc_stats = {t: bytearray(DC_STAT_BINS) for t in self.dc_tids}
        self.ac_stats = {t: bytearray(AC_STAT_BINS) for t in self.ac_tids}
        self.fixed = bytearray([FIXED_STATE])
        self.dc_ctx = [0] * self.n_comps
        self.last_dc = [0] * self.n_comps

    def restart(self, n_rst: int):
        self.chunks.append(self.enc.flush())
        self.chunks.append(bytes([0xFF, 0xD0 + n_rst % 8]))
        self._reset()

    def dc_first(self, ci, td, coef, al):
        L, U = self.dc_cond.get(td, (0, 1))
        v = int(coef[0]) >> al
        diff = v - self.last_dc[ci]
        self.last_dc[ci] = v
        self.dc_ctx[ci] = _encode_dc_diff(
            self.enc, self.dc_stats[td], self.dc_ctx[ci], diff, L, U
        )

    def dc_refine(self, coef, al):
        self.enc.encode(self.fixed, 0, (int(coef[0]) >> al) & 1)

    def ac_first(self, ta, coef, ss, se, al):
        kx = self.ac_cond.get(ta, 5)
        _encode_ac_band(
            self.enc, self.ac_stats[ta], self.fixed, coef, ss, se, al, kx
        )

    def ac_refine(self, ta, coef, ss, se, ah, al):
        _encode_ac_refine(
            self.enc, self.ac_stats[ta], self.fixed, coef, ss, se, ah, al
        )

    def finish(self) -> bytes:
        self.chunks.append(self.enc.flush())
        return b"".join(self.chunks)
