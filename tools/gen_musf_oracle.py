#!/usr/bin/env python3
"""Independent TH2 decoder + combined muon-SF grid dump for the l24
oracle. Decodes the four REAL muon-SF ROOT files the reference wires in
config/parameters.py `muSFFileList["2018"]` with its OWN minimal ROOT
parser (public on-disk format; shares no code with the Scala
root-hist connector), applies lepton_sf.py's scale-weighted
combination (vals += v*scale per file-list entry, errs +=
sqrt(variances)*scale), and prints literal VALUES rows for the DuckDB
oracle. Dev tooling only — run once to (re)generate LookupQueries.l24Sql.
"""
import math
import struct
import sys
import zlib
import os

REF = os.environ.get("GRAFT_REFERENCE_DATA", "/root/reference/data")

S1 = 8.95 / 59.74    # BeforeMuonHLTUpdate lumi fraction
S2 = 50.79 / 59.74   # AfterMuonHLTUpdate lumi fraction


def scan_keys(raw):
    """Linear key-chain walk: yields (cls, name, pos, nbytes, objlen,
    keylen, seek_pdir)."""
    fbegin, = struct.unpack('>i', raw[8:12])
    fend, = struct.unpack('>i', raw[12:16])  # all these files are small
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
            p += 8
            pdir, = struct.unpack('>q', raw[p:p + 8]); p += 8
        else:
            p += 4
            pdir, = struct.unpack('>i', raw[p:p + 4]); p += 4

        def ts(q):
            n = raw[q]; q += 1
            if n == 255:
                n, = struct.unpack('>i', raw[q:q + 4]); q += 4
            return raw[q:q + n].decode('latin1'), q + n
        cls, p = ts(p)
        name, p = ts(p)
        yield cls, name, pos, nbytes, objlen, keylen, pdir
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

    def f32(self):
        v, = struct.unpack_from('>f', self.b, self.p); self.p += 4; return v

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
        title = self.tstring()
        self.p = end
        return name, title

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
    c.skip_framed()  # TAttAxis
    nbins = c.i32()
    xmin = c.f64()
    xmax = c.f64()
    edges = c.tarrayd()
    c.p = end
    if not edges:
        edges = [xmin + (xmax - xmin) * i / nbins for i in range(nbins + 1)]
    return nbins, edges


def parse_th2(buf, cls):
    c = Cur(buf)
    c.bcv()                      # TH2x outer
    _, mid_end = c.bcv()         # TH2 base
    _, base_end = c.bcv()        # TH1 base
    c.tnamed()
    c.skip_framed(); c.skip_framed(); c.skip_framed()
    c.i32()                      # fNcells
    nx, xedges = taxis(c)
    ny, yedges = taxis(c)
    taxis(c)                     # z
    c.p += 4
    c.f64()                      # entries
    c.p += 7 * 8
    c.tarrayd()                  # contour
    sumw2 = c.tarrayd()
    c.p = max(base_end, mid_end)
    contents = c.tarrayd() if cls == 'TH2D' else c.tarrayf()
    cells = (nx + 2) * (ny + 2)
    assert len(contents) == cells, (len(contents), cells)
    if not sumw2:
        sumw2 = contents
    return nx, xedges, ny, yedges, contents, sumw2


def load_th2(path, name, want_dir=None):
    raw = open(path, 'rb').read()
    dirs = {}
    hits = []
    for cls, nm, pos, nbytes, objlen, keylen, pdir in scan_keys(raw):
        if cls in ('TDirectory', 'TDirectoryFile'):
            dirs[pos] = (nm, pdir)
        if cls in ('TH2D', 'TH2F') and nm == name:
            hits.append((cls, pos, nbytes, objlen, keylen, pdir))
    pick = None
    for cls, pos, nbytes, objlen, keylen, pdir in hits:
        chain = []
        q = pdir
        while q in dirs:
            chain.append(dirs[q][0])
            q = dirs[q][1]
        if want_dir is None or want_dir in chain:
            pick = (cls, pos, nbytes, objlen, keylen)
            break
    assert pick, (path, name, want_dir, len(hits))
    cls, pos, nbytes, objlen, keylen = pick
    return parse_th2(payload(raw, pos, nbytes, objlen, keylen), cls)


def grid(vals_errs, nx, xe, ny, ye):
    rows = []
    for bx in range(1, nx + 1):
        for by in range(1, ny + 1):
            cell = bx + (nx + 2) * by
            v, e = vals_errs(cell)
            rows.append((xe[bx - 1], xe[bx], ye[by - 1], ye[by], v, e))
    return rows


def dump(tag, rows):
    print(f"-- {tag}: {len(rows)} rows")
    for i, (xl, xh, yl, yh, v, e) in enumerate(rows):
        sep = ',' if i < len(rows) - 1 else ''
        print(f"      |({xl!r},{xh!r},{yl!r},{yh!r},{v!r},{e!r}){sep}")


def main():
    idf = f"{REF}/muon_sf/year2018/RunABCD_SF_ID.root"
    isof = f"{REF}/muon_sf/year2018/RunABCD_SF_ISO.root"
    trig_b = (f"{REF}/muon_sf/mu2018/EfficienciesStudies_2018_trigger_"
              "EfficienciesAndSF_2018Data_BeforeMuonHLTUpdate.root")
    trig_a = (f"{REF}/muon_sf/mu2018/EfficienciesStudies_2018_trigger_"
              "EfficienciesAndSF_2018Data_AfterMuonHLTUpdate.root")

    # ID / ISO: both file-list entries read the SAME file -> v*S1 + v*S2
    for tag, path, name in [
            ("musf_id", idf, "NUM_MediumID_DEN_genTracks_pt_abseta"),
            ("musf_iso", isof, "NUM_TightRelIso_DEN_MediumID_pt_abseta")]:
        nx, xe, ny, ye, v, w2 = load_th2(path, name)
        def ve(cell, v=v, w2=w2):
            val = v[cell] * S1 + v[cell] * S2
            err = math.sqrt(w2[cell]) * S1 + math.sqrt(w2[cell]) * S2
            return val, err
        dump(tag, grid(ve, nx, xe, ny, ye))

    # TRIG: Before*S1 + After*S2 per DATA/MC
    for tag, name in [("musf_trig_data", "abseta_pt_DATA"),
                      ("musf_trig_mc", "abseta_pt_MC")]:
        nxb, xeb, nyb, yeb, vb, wb = load_th2(trig_b, name, "IsoMu24_PtEtaBins")
        nxa, xea, nya, yea, va, wa = load_th2(trig_a, name, "IsoMu24_PtEtaBins")
        assert (nxb, nyb) == (nxa, nya) and xeb == xea and yeb == yea
        def ve(cell, vb=vb, wb=wb, va=va, wa=wa):
            val = vb[cell] * S1 + va[cell] * S2
            err = math.sqrt(wb[cell]) * S1 + math.sqrt(wa[cell]) * S2
            return val, err
        dump(tag, grid(ve, nxb, xeb, nyb, yeb))


if __name__ == "__main__":
    main()
