#!/usr/bin/env python3
"""Independent decoder + pipeline replay for the s14_root_stage1 oracle.

Decodes the jagged muon_pt/muon_eta branches of the reference's
muonresolution.root fixture with its OWN minimal ROOT parser (shares no
code with the Scala reader), replays the stage-1 selection pipeline in
pure Python, and prints the literal VALUES oracle rows. Dev tooling
only — run once to (re)generate the literal SQL in StageQueries.s14Sql.

Pipeline spec (must match StageQueries.s14 exactly):
  muons  = zip(pt, eta) per entry
  select pt > 20 and pt < 200 and |eta| < 2.4
  events with exactly 2 selected muons
  mass   = p4_sum_mass(pt1,eta1,phi=0,m_mu, pt2,eta2,phi=0,m_mu)
           with sinh spelled (e^x - e^-x)/2 (Kinematics.sinhP)
  region = z-peak / h-sidebands / h-peak / none  (Selections.regionLabel)
  out    = per (region, bin over [0,200)x40): n_events,
           sum(floor(mass*1000 + 0.5)) as mass_milli_sum
"""
import math
import struct
import sys

PATH = sys.argv[1] if len(sys.argv) > 1 else \
    "/root/reference/data/mass_res_pisa/muonresolution.root"


def read_baskets(raw, want):
    """Yield (branch, entry_values_list) per basket, in key-chain order."""
    fbegin, = struct.unpack('>i', raw[8:12])
    fend, = struct.unpack('>i', raw[12:16])
    pos = fbegin
    out = {b: [] for b in want}
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
        p += 16 if kver > 1000 else 8  # seekKey, seekPdir

        def ts(q):
            n = raw[q]; q += 1
            if n == 255:
                n, = struct.unpack('>i', raw[q:q + 4]); q += 4
            return raw[q:q + n].decode('latin1'), q + n
        cls, p = ts(p)
        name, p = ts(p)
        title, p = ts(p)
        if cls == 'TBasket' and name in want and title == 'MyTree':
            # basket trailer after the title: version i16, fBufferSize
            # i32, fNevBufSize i32, fNevBuf i32, fLast i32
            p += 2 + 4 + 4
            nev, = struct.unpack('>i', raw[p:p + 4]); p += 4
            last, = struct.unpack('>i', raw[p:p + 4]); p += 4
            data = raw[pos + keylen: pos + nbytes]
            if objlen > len(data):
                import zlib
                o = b''
                q = 0
                while q < len(data) and len(o) < objlen:
                    csz = data[q + 3] | (data[q + 4] << 8) | (data[q + 5] << 16)
                    o += zlib.decompress(data[q + 9: q + 9 + csz])
                    q += 9 + csz
                data = o
            data_end = last - keylen
            # framed jagged payload: per entry bytecount|0x40000000,
            # version i16, n i32, then n float32
            q = 0
            ents = []
            for _ in range(nev):
                if q >= data_end:
                    break
                cnt, = struct.unpack('>i', data[q:q + 4])
                cnt &= 0x3fffffff
                end = q + 4 + cnt
                n, = struct.unpack('>i', data[q + 6:q + 10])
                elem = (cnt - 6) // n if n > 0 else 8
                vals = []
                r = q + 10
                for _i in range(n):
                    if elem == 8:
                        v, = struct.unpack('>d', data[r:r + 8]); r += 8
                    else:
                        v, = struct.unpack('>f', data[r:r + 4]); r += 4
                    vals.append(v)
                ents.append(vals)
                q = end
            out[name].append(ents)
        pos += nbytes
    return {b: [e for basket in lst for e in basket] for b, lst in out.items()}


def main():
    raw = open(PATH, 'rb').read()
    br = read_baskets(raw, {'muon_pt', 'muon_eta'})
    pts, etas = br['muon_pt'], br['muon_eta']
    assert len(pts) == len(etas), (len(pts), len(etas))
    m_mu = 0.1057

    def sinh(x):
        return (math.exp(x) - math.exp(-x)) / 2.0

    agg = {}
    n_sel = 0
    for pt, eta in zip(pts, etas):
        sel = [(p, e) for p, e in zip(pt, eta)
               if p > 20.0 and p < 200.0 and abs(e) < 2.4]
        if len(sel) != 2:
            continue
        n_sel += 1
        (pt1, eta1), (pt2, eta2) = sel
        # phi = 0 (the fixture has no phi branch): px = pt, py = 0
        pz1, pz2 = pt1 * sinh(eta1), pt2 * sinh(eta2)
        e1 = math.sqrt(pt1 * pt1 + pz1 * pz1 + m_mu * m_mu)
        e2 = math.sqrt(pt2 * pt2 + pz2 * pz2 + m_mu * m_mu)
        sx, sz, se = pt1 + pt2, pz1 + pz2, e1 + e2
        m2c = se * se - sx * sx - sz * sz
        mass = math.sqrt(max(m2c, 0.0))
        if 76.0 < mass < 106.0:
            region = 'z-peak'
        elif 110.0 < mass < 115.03 or 135.03 < mass < 150.0:
            region = 'h-sidebands'
        elif 115.03 <= mass <= 135.03:
            region = 'h-peak'
        else:
            region = 'none'
        if mass < 0.0:
            b = 0
        elif mass >= 200.0:
            b = 41
        else:
            b = int(math.floor(mass * 40.0 / 200.0)) + 1
        k = (region, b)
        c, s = agg.get(k, (0, 0))
        agg[k] = (c + 1, s + int(math.floor(mass * 1000.0 + 0.5)))
    rows = sorted(agg.items())
    print(f"-- {len(pts)} entries decoded, {n_sel} events with exactly 2 "
          f"selected muons, {len(rows)} output rows")
    vals = ",\n".join(
        f"('{r}', {b}, {c}, {s})" for (r, b), (c, s) in rows)
    print(f"""SELECT region, bin, n_events, mass_milli_sum FROM (VALUES
{vals}
) AS t(region, bin, n_events, mass_milli_sum)
ORDER BY region, bin""")


if __name__ == '__main__':
    main()
