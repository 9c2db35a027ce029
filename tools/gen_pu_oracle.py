#!/usr/bin/env python3
"""Independent TH1 decoder + pu_reweight replay for the l28 oracle.

Decodes the REAL 2018 pileup files the reference wires in
config/parameters.py (pu_file_data = puData2018_withVar.root with its
nominal/up/down TH1s "pileup"/"pileup_plus"/"pileup_minus"; pu_file_mc =
mcPileup2018.root "pu_mc") with its OWN minimal ROOT parser (public
on-disk format; shares no code with the Scala root-hist connector),
replays stage1/corrections/pu_reweight.py:32-66 (clamp>=0, normalize,
ratio where mc!=0, iterative maxw crop + integral-preserving renorm),
and prints both the crop-loop trajectory and literal VALUES rows for
the DuckDB oracle. Dev tooling only — run once to (re)generate
LookupQueries.l28Sql.
"""
import struct
import zlib
import os

REF = os.environ.get("GRAFT_REFERENCE_DATA", "/root/reference/data")


def scan_keys(raw):
    fbegin, = struct.unpack('>i', raw[8:12])
    fend, = struct.unpack('>i', raw[12:16])
    pos = fbegin
    while pos < fend:
        nbytes, = struct.unpack('>i', raw[pos:pos + 4])
        if nbytes == 0:
            break
        if nbytes < 0:
            pos += -nbytes
            continue
        p = pos + 4
        kver, = struct.unpack('>h', raw[p:p + 2]); p += 2
        objlen, = struct.unpack('>i', raw[p:p + 4]); p += 4
        p += 4  # datime
        keylen, = struct.unpack('>h', raw[p:p + 2]); p += 2
        p += 2  # cycle
        if kver > 1000:
            p += 16
        else:
            p += 8

        def ts(q):
            n = raw[q]; q += 1
            if n == 255:
                n, = struct.unpack('>i', raw[q:q + 4]); q += 4
            return raw[q:q + n].decode('latin1'), q + n
        cls, p = ts(p)
        name, p = ts(p)
        yield cls, name, pos, nbytes, objlen, keylen
        pos += nbytes


def payload(raw, pos, nbytes, objlen, keylen):
    blob = raw[pos + keylen: pos + nbytes]
    if len(blob) == objlen:
        return blob
    out = b''
    q = 0
    while q < len(blob) and len(out) < objlen:
        algo = blob[q:q + 2].decode('latin1')
        assert algo == 'ZL', algo
        csz = blob[q + 3] | (blob[q + 4] << 8) | (blob[q + 5] << 16)
        out += zlib.decompress(blob[q + 9: q + 9 + csz])
        q += 9 + csz
    assert len(out) == objlen, (len(out), objlen)
    return out


class Cur:
    def __init__(self, b):
        self.b = b
        self.p = 0

    def u8(self):
        v = self.b[self.p]; self.p += 1; return v

    def i16(self):
        v, = struct.unpack_from('>h', self.b, self.p); self.p += 2; return v

    def i32(self):
        v, = struct.unpack_from('>i', self.b, self.p); self.p += 4; return v

    def f64(self):
        v, = struct.unpack_from('>d', self.b, self.p); self.p += 8; return v

    def tstring(self):
        n = self.u8()
        if n == 255:
            n = self.i32()
        v = self.b[self.p:self.p + n].decode('latin1'); self.p += n
        return v

    def bcv(self):
        cnt_pos = self.p
        rawv = self.i32()
        assert rawv & 0x40000000, hex(rawv)
        cnt = rawv & 0x3fffffff
        ver = self.i16() & 0xffff
        return ver, cnt_pos + 4 + cnt

    def skip_framed(self):
        _, end = self.bcv()
        self.p = end

    def tnamed(self):
        _, end = self.bcv()
        self.i16(); self.i32()
        bits = self.i32()
        if bits & 0x2:
            self.i16()
        name = self.tstring()
        self.tstring()
        self.p = end
        return name

    def tarrayd(self):
        n = self.i32()
        v = list(struct.unpack_from('>%dd' % n, self.b, self.p))
        self.p += 8 * n
        return v

    def tarrayf(self):
        n = self.i32()
        v = list(struct.unpack_from('>%df' % n, self.b, self.p))
        self.p += 4 * n
        return v


def taxis(c):
    _, end = c.bcv()
    c.tnamed()
    c.skip_framed()
    nbins = c.i32()
    c.f64(); c.f64()
    c.tarrayd()
    c.p = end
    return nbins


def parse_th1(buf, cls):
    c = Cur(buf)
    c.bcv()                      # TH1x outer
    _, base_end = c.bcv()        # TH1 base
    c.tnamed()
    c.skip_framed(); c.skip_framed(); c.skip_framed()
    c.i32()                      # fNcells
    nx = taxis(c)
    taxis(c); taxis(c)           # y, z
    c.p += 4                     # fBarOffset/fBarWidth
    c.f64()                      # entries
    c.p += 7 * 8
    c.tarrayd()                  # contour
    c.tarrayd()                  # sumw2
    c.p = base_end
    contents = c.tarrayd() if cls == 'TH1D' else c.tarrayf()
    assert len(contents) == nx + 2, (len(contents), nx)
    return contents[1:nx + 1]    # in-range bins (uproot .values())


def load_th1(path, name):
    raw = open(path, 'rb').read()
    for cls, nm, pos, nbytes, objlen, keylen in scan_keys(raw):
        if cls in ('TH1D', 'TH1F') and nm == name:
            return parse_th1(payload(raw, pos, nbytes, objlen, keylen), cls)
    raise AssertionError((path, name))


def check_integral(wgt1, wgt2, ref):
    myint = 0.0
    refint = 0.0
    for i in range(len(wgt1)):
        myint += wgt1[i] * ref[i]
        refint += wgt2[i] * ref[i]
    return (myint - refint) / refint


def pu_reweight(data, mc):
    mc_ref = [max(v, 0.0) for v in mc]
    d = [max(v, 0.0) for v in data]
    smc = sum(mc_ref)
    sd = sum(d)
    mcn = [v / smc for v in mc_ref]
    dn = [v / sd for v in d]
    weights = [1.0] * len(mc)
    for i in range(len(mc)):
        if mcn[i] != 0:
            weights[i] = dn[i] / mcn[i]
    maxw = min(max(weights), 5.0)
    cropped = []
    iters = 0
    while maxw > 3:
        cropped = [min(maxw, w) for w in weights]
        shift = check_integral(cropped, weights, mc_ref)
        iters += 1
        if abs(shift) > 0.0025:
            break
        maxw *= 0.95
    maxw /= 0.95
    if cropped:
        cropped = [min(maxw, w) for w in weights]
        normshift = check_integral(cropped, weights, mc_ref)
        weights = [c * (1 - normshift) for c in cropped]
    return weights, maxw, iters


def main():
    mc = load_th1(f"{REF}/pileup/mcPileup2018.root", "pu_mc")
    print(f"-- mc bins: {len(mc)}")
    branch = {"nom": "pileup", "up": "pileup_plus", "down": "pileup_minus"}
    out = {}
    for mode, hname in branch.items():
        data = load_th1(f"{REF}/pileup/puData2018_withVar.root", hname)
        w, maxw, iters = pu_reweight(data, mc)
        out[mode] = (data, w)
        print(f"-- {mode}: data bins {len(data)}, crop iters {iters}, "
              f"final maxw {maxw!r}, max w {max(w)!r}")
    # literal VALUES rows (bin, data_nom, data_up, data_down, mc)
    print("-- VALUES (bin, d_nom, d_up, d_down, mc):")
    n = len(mc)
    for i in range(n):
        sep = ',' if i < n - 1 else ''
        print(f"      |({i},{out['nom'][0][i]!r},{out['up'][0][i]!r},"
              f"{out['down'][0][i]!r},{mc[i]!r}){sep}")
    print("-- expected weights (bin, w_nom, w_up, w_down):")
    for i in range(n):
        print(f"--   {i}: {out['nom'][1][i]!r} {out['up'][1][i]!r} "
              f"{out['down'][1][i]!r}")


if __name__ == '__main__':
    main()
