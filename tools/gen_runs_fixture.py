#!/usr/bin/env python3
"""Runs-tree metadata fixture + independent oracle for s16_runs_prescan.

The reference's preprocessor (stage1/preprocessor.py:200-229) reads the
`Runs` TTree of every NanoAOD file and sums genEventSumw/genEventCount
per dataset to derive lumi_weight = xsec * lumi / sumw. The real NanoAOD
blobs are stripped from the reference checkout, so this script AUTHORS a
minimal spec-conforming fixture of that shape — three .root files (two
datasets, multiple files per dataset, multiple Runs entries per file)
with flat-double `genEventSumw`/`genEventCount` branches as raw-f64
TBaskets, per the public ROOT TFile/TKey/TBasket layout — then:

 1. re-decodes the written bytes with an INDEPENDENT minimal parser
    (gen_s14_oracle.py's read-basket discipline, shares no code with
    the Scala reader) and asserts the round-trip;
 2. replays the prescan arithmetic (sum per dataset, lumi weight,
    weighted region yields against the muonresolution.root event
    fixture decoded by gen_s14_oracle's own decoder) in pure Python;
 3. prints the literal VALUES oracle for StageQueries.s16Sql.

Branch values are dyadic rationals (exactly representable doubles whose
partial sums are exact in any order), so the Spark-side sum is
order-free across files/partitions and bit-equal to this replay.

Dev tooling only — run once to (re)generate fixture + oracle.
"""
import importlib.util
import math
import os
import struct
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.environ.get(
    "GRAFT_FIXTURES_DIR",
    os.path.join(HERE, "..", "src", "main", "resources", "fixtures"))
RUNS_DIR = os.path.join(OUT, "runs")

LUMI = 59970.0
# per-dataset cross sections (pb) — same constant family as s02's
XSEC = {"ggh_amcPS": 0.010571, "vbf_powheg": 0.000823}

# dataset -> file part -> branch -> entry values (dyadic doubles)
FILES = {
    ("ggh_amcPS", 0): {
        "genEventSumw": [12345.5, 23456.25],
        "genEventCount": [100000.0, 200000.0],
    },
    ("ggh_amcPS", 1): {
        "genEventSumw": [34567.125],
        "genEventCount": [300000.0],
    },
    ("vbf_powheg", 0): {
        "genEventSumw": [4567.75, 5678.5],
        "genEventCount": [40000.0, 50000.0],
    },
}


def tstr(s):
    b = s.encode()
    assert len(b) < 255
    return bytes([len(b)]) + b


def basket(pos, tree, branch, values):
    """One TBasket key record at file offset `pos`: standard TKey header
    (kver 4 => 32-bit seeks), the 18-byte basket trailer (version,
    fBufferSize, fNevBufSize, fNevBuf, fLast), then the raw big-endian
    f64 payload — the NanoAOD flat-leaf layout (payload == nevBuf*8,
    zero framing)."""
    names = tstr("TBasket") + tstr(branch) + tstr(tree)
    pre = 4 + 2 + 4 + 4 + 2 + 2 + 4 + 4  # nbytes..seekPdir
    keylen = pre + len(names) + 18
    n = len(values)
    nbytes = keylen + 8 * n
    rec = struct.pack(">ihiihhii", nbytes, 4, 8 * n, 0, keylen, 1, pos, 100)
    rec += names
    rec += struct.pack(">hiiii", 3, nbytes, 8, n, keylen + 8 * n)
    rec += b"".join(struct.pack(">d", v) for v in values)
    return rec


def write_file(path, branches):
    body = b""
    pos = 100
    for br, vals in sorted(branches.items()):
        rec = basket(pos, "Runs", br, vals)
        body += rec
        pos += len(rec)
    end = 100 + len(body)
    head = b"root" + struct.pack(">iii", 62506, 100, end)
    head += b"\x00" * (100 - len(head))
    with open(path, "wb") as f:
        f.write(head + body)


def decode_file(path):
    """Independent re-decode of the written bytes (gen_s14_oracle's
    walk): returns {branch: [values...]} in entry order."""
    raw = open(path, "rb").read()
    fbegin, = struct.unpack(">i", raw[8:12])
    fend, = struct.unpack(">i", raw[12:16])
    pos = fbegin
    out = {}
    while pos < fend:
        nbytes, = struct.unpack(">i", raw[pos:pos + 4])
        if nbytes <= 0:
            break
        p = pos + 4
        kver, = struct.unpack(">h", raw[p:p + 2]); p += 2
        objlen, = struct.unpack(">i", raw[p:p + 4]); p += 4
        p += 4  # datime
        keylen, = struct.unpack(">h", raw[p:p + 2]); p += 2
        p += 2  # cycle
        p += 16 if kver > 1000 else 8

        def ts(q):
            n = raw[q]; q += 1
            if n == 255:
                n, = struct.unpack(">i", raw[q:q + 4]); q += 4
            return raw[q:q + n].decode("latin1"), q + n
        cls, p = ts(p)
        name, p = ts(p)
        title, p = ts(p)
        if cls == "TBasket" and title == "Runs":
            p += 2 + 4 + 4
            nev, = struct.unpack(">i", raw[p:p + 4]); p += 4
            last, = struct.unpack(">i", raw[p:p + 4]); p += 4
            data = raw[pos + keylen: pos + nbytes]
            assert last - keylen == nev * 8, (last, keylen, nev)
            vals = [struct.unpack(">d", data[8 * i: 8 * i + 8])[0]
                    for i in range(nev)]
            out.setdefault(name, []).extend(vals)
        pos += nbytes
    return out


def region_counts():
    """Per-region selected-event counts from the muonresolution.root
    event fixture, via gen_s14_oracle's own independent decoder."""
    spec = importlib.util.spec_from_file_location(
        "gen_s14_oracle", os.path.join(HERE, "gen_s14_oracle.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    raw = open(mod.PATH, "rb").read()
    br = mod.read_baskets(raw, {"muon_pt", "muon_eta"})
    counts = {}
    for pt, eta in zip(br["muon_pt"], br["muon_eta"]):
        sel = [(p, e) for p, e in zip(pt, eta)
               if p > 20.0 and p < 200.0 and abs(e) < 2.4]
        if len(sel) != 2:
            continue
        (pt1, eta1), (pt2, eta2) = sel
        sinh = lambda x: (math.exp(x) - math.exp(-x)) / 2.0
        pz1, pz2 = pt1 * sinh(eta1), pt2 * sinh(eta2)
        m_mu = 0.1057
        e1 = math.sqrt(pt1 * pt1 + pz1 * pz1 + m_mu * m_mu)
        e2 = math.sqrt(pt2 * pt2 + pz2 * pz2 + m_mu * m_mu)
        sx, sz, se = pt1 + pt2, pz1 + pz2, e1 + e2
        mass = math.sqrt(max(se * se - sx * sx - sz * sz, 0.0))
        if 76.0 < mass < 106.0:
            region = "z-peak"
        elif 110.0 < mass < 115.03 or 135.03 < mass < 150.0:
            region = "h-sidebands"
        elif 115.03 <= mass <= 135.03:
            region = "h-peak"
        else:
            region = "none"
        counts[region] = counts.get(region, 0) + 1
    return counts


def main():
    os.makedirs(RUNS_DIR, exist_ok=True)
    for (ds, part), branches in sorted(FILES.items()):
        path = os.path.join(RUNS_DIR, f"{ds}_part{part}.root")
        write_file(path, branches)
        back = decode_file(path)
        assert back == branches, (path, back)
        print(f"-- wrote {path} ({os.path.getsize(path)} bytes, "
              f"round-trip ok)")

    # prescan replay: per-dataset sums -> lumi weight
    sums, cnts = {}, {}
    for (ds, _), branches in sorted(FILES.items()):
        sums[ds] = sums.get(ds, 0.0) + sum(branches["genEventSumw"])
        cnts[ds] = cnts.get(ds, 0.0) + sum(branches["genEventCount"])
    regions = region_counts()
    rows = []
    for ds in sorted(sums):
        w = XSEC[ds] * LUMI / sums[ds]
        for region in sorted(regions):
            n = regions[region]
            y = int(math.floor(n * w * 1e6 + 0.5))
            rows.append((ds, region, n, int(cnts[ds]),
                         struct.unpack("f", struct.pack("f", w))[0], y))
    print(f"-- sums: {sums}  counts: {cnts}  regions: {regions}")
    vals = ",\n".join(
        f"('{d}', '{r}', {n}, {g}, CAST({w!r} AS REAL), {y})"
        for d, r, n, g, w, y in rows)
    print(f"""SELECT dataset, region, n_events, n_gen, lumi_wgt, yield_micro FROM (VALUES
{vals}
) AS t(dataset, region, n_events, n_gen, lumi_wgt, yield_micro)
ORDER BY dataset, region""")


if __name__ == "__main__":
    main()
