#!/usr/bin/env python3
"""Independent parse of the reference's REAL JEC payload files into the
fixture CSVs the DuckDB oracles read, so the l10/l20/l21 tables cross
the engine boundary as data parsed by a SECOND implementation (the
Scala engine parses the original .txt/.csv files itself; the oracle
reads these CSVs; the driver's hash compare proves the two parses +
two evaluations agree).

Inputs (read-only):
  /root/reference/data/jec/Autumn18_V19_MC_L1FastJet_AK4PFchs.jec.txt
  /root/reference/data/jec/Autumn18_V19_MC_L2Relative_AK4PFchs.jec.txt
  /root/reference/data/jec/Autumn18_V19_MC_UncertaintySources_AK4PFchs.junc.txt
  /root/reference/data/btag/DeepCSV_102XSF_V1.csv
Outputs (committed fixtures):
  src/main/resources/fixtures/jec_l1_mc.csv
  src/main/resources/fixtures/jec_l2_mc.csv
  src/main/resources/fixtures/jes_sources_2018.csv
  src/main/resources/fixtures/btag_reshape_central.csv
"""
import csv
import os
import re
import sys

REF = os.environ.get("GRAFT_REFERENCE_DATA", "/root/reference/data")
OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src/main/resources/fixtures")


def parse_level(path, n_binvars, n_evalvars):
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("{"):
                continue
            t = line.split()
            bounds = [float(x) for x in t[: 2 * n_binvars]]
            c = int(t[2 * n_binvars])
            vals = [float(x) for x in t[2 * n_binvars + 1: 2 * n_binvars + 1 + c]]
            clamps = vals[: 2 * n_evalvars]
            params = vals[2 * n_evalvars:]
            rows.append((bounds, clamps, params))
    return rows


def gen_l1():
    rows = parse_level(
        f"{REF}/jec/Autumn18_V19_MC_L1FastJet_AK4PFchs.jec.txt", 1, 3)
    with open(f"{OUT}/jec_l1_mc.csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["eta_lo", "eta_hi", "rho_lo", "rho_hi", "pt_lo", "pt_hi",
                    "a_lo", "a_hi", "p0", "p1", "p2", "p3", "p4", "p5"])
        for bounds, clamps, params in rows:
            assert len(params) == 6, params
            w.writerow([repr(v) for v in bounds + clamps + params])
    print(f"jec_l1_mc.csv: {len(rows)} rows")


def gen_l2():
    rows = parse_level(
        f"{REF}/jec/Autumn18_V19_MC_L2Relative_AK4PFchs.jec.txt", 2, 1)
    with open(f"{OUT}/jec_l2_mc.csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["eta_lo", "eta_hi", "bpt_lo", "bpt_hi", "x_lo", "x_hi",
                    "p0", "p1", "p2", "p3", "p4"])
        for bounds, clamps, params in rows:
            assert len(params) == 5, params
            w.writerow([repr(v) for v in bounds + clamps + params])
    print(f"jec_l2_mc.csv: {len(rows)} rows")


def gen_jes_sources():
    src = None
    secs = {}
    path = f"{REF}/jec/Autumn18_V19_MC_UncertaintySources_AK4PFchs.junc.txt"
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line.startswith("["):
                src = line[1:-1]
                secs[src] = []
                continue
            if not line or line.startswith("{"):
                continue
            t = line.split()
            lo, hi, n = float(t[0]), float(t[1]), int(t[2])
            vals = [float(x) for x in t[3: 3 + n]]
            knots = [(vals[i * 3], vals[i * 3 + 1], vals[i * 3 + 2])
                     for i in range(n // 3)]
            secs[src].append((lo, hi, knots))
    # the reference considers these 11 regrouped sources
    # (config/jec_parameters.py jec_unc_to_consider["2018"])
    keep = ["Absolute", "Absolute2018", "BBEC1", "BBEC12018", "EC2",
            "EC22018", "FlavorQCD", "HF", "HF2018", "RelativeBal",
            "RelativeSample2018"]
    n = 0
    with open(f"{OUT}/jes_sources_2018.csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["source", "eta_lo", "eta_hi", "x0", "x1", "u0", "u1"])
        for s in keep:
            for lo, hi, knots in secs[s]:
                # sentinel clamp segments at both ends (u0 == u1 so the
                # interp formula is exactly the clamp), l17's pattern
                segs = ([(-1e18, knots[0][0], knots[0][1], knots[0][1])]
                        + [(a[0], b[0], a[1], b[1])
                           for a, b in zip(knots, knots[1:])]
                        + [(knots[-1][0], 1e18, knots[-1][1], knots[-1][1])])
                for x0, x1, u0, u1 in segs:
                    w.writerow([s] + [repr(v) for v in (lo, hi, x0, x1, u0, u1)])
                    n += 1
    print(f"jes_sources_2018.csv: {n} rows ({len(keep)} sources)")


HORNER = re.compile(
    r"^(?P<a0>-?[\d.]+(?:e-?\d+)?)\+x\*\((?P<rest>.*)\)$")
NUM = r"-?[\d.]+(?:e-?\d+)?"


def horner_coeffs(formula):
    """Extract Horner coefficients from the three shapes the reshape
    central rows use: constant, '(a+b*x)', 'a0+x*(a1+x*(...))'. This is
    pattern extraction of the file's own Horner nesting — NO algebra, so
    the coefficients are the literal file numbers."""
    f = formula.strip().strip('"').strip()
    m = re.fullmatch(NUM, f)
    if m:
        return [float(f)]
    m = re.fullmatch(rf"\(({NUM})\+({NUM})\*x\)", f)
    if m:
        return [float(m.group(1)), float(m.group(2))]
    coeffs = []
    while True:
        m = re.fullmatch(rf"({NUM})\+x\*\((.*)\)", f)
        if m:
            coeffs.append(float(m.group(1)))
            f = m.group(2)
            continue
        m = re.fullmatch(rf"({NUM})\+x\*({NUM})", f)
        if m:
            coeffs.append(float(m.group(1)))
            coeffs.append(float(m.group(2)))
            return coeffs
        raise ValueError(f"unrecognized shape: {formula!r} at {f!r}")


def gen_btag():
    path = f"{REF}/btag/DeepCSV_102XSF_V1.csv"
    n = 0
    with open(path) as fin, \
         open(f"{OUT}/btag_reshape_central.csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["flavor", "eta_lo", "eta_hi", "pt_lo", "pt_hi",
                    "d_lo", "d_hi", "c0", "c1", "c2", "c3", "c4", "c5", "c6"])
        rdr = csv.reader(fin)
        next(rdr)
        for row in rdr:
            if row[0].strip() != "3":
                continue
            if row[1].strip() != "iterativefit":
                continue
            if row[2].strip() != "central":
                continue
            c = horner_coeffs(row[10])
            c = c + [0.0] * (7 - len(c))
            w.writerow([row[3].strip()]
                       + [repr(float(x)) for x in row[4:10]]
                       + [repr(v) for v in c])
            n += 1
    print(f"btag_reshape_central.csv: {n} rows")


def gen_data_era():
    """RunA DATA-era levels incl. the L2L3Residual whose formula uses
    TMath::-namespaced functions — the l23 chain."""
    rows = parse_level(
        f"{REF}/jec/Autumn18_RunA_V19_DATA_L1FastJet_AK4PFchs.jec.txt", 1, 3)
    with open(f"{OUT}/jec_l1_data.csv", "w", newline="") as f:
        w = csv.writer(f)
        # the DATA-era L1 formula carries a 7th scale parameter [6]
        w.writerow(["eta_lo", "eta_hi", "rho_lo", "rho_hi", "pt_lo", "pt_hi",
                    "a_lo", "a_hi", "p0", "p1", "p2", "p3", "p4", "p5", "p6"])
        for bounds, clamps, params in rows:
            assert len(params) == 7, params
            w.writerow([repr(v) for v in bounds + clamps + params])
    print(f"jec_l1_data.csv: {len(rows)} rows")
    rows = parse_level(
        f"{REF}/jec/Autumn18_RunA_V19_DATA_L2Relative_AK4PFchs.jec.txt", 2, 1)
    with open(f"{OUT}/jec_l2_data.csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["eta_lo", "eta_hi", "bpt_lo", "bpt_hi", "x_lo", "x_hi",
                    "p0", "p1", "p2", "p3", "p4"])
        for bounds, clamps, params in rows:
            assert len(params) == 5, params
            w.writerow([repr(v) for v in bounds + clamps + params])
    print(f"jec_l2_data.csv: {len(rows)} rows")
    rows = parse_level(
        f"{REF}/jec/Autumn18_RunA_V19_DATA_L2L3Residual_AK4PFchs.jec.txt", 1, 1)
    with open(f"{OUT}/jec_res_data.csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["eta_lo", "eta_hi", "x_lo", "x_hi"]
                   + [f"p{i}" for i in range(9)])
        for bounds, clamps, params in rows:
            assert len(params) == 9, params
            w.writerow([repr(v) for v in bounds + clamps + params])
    print(f"jec_res_data.csv: {len(rows)} rows")


if __name__ == "__main__":
    os.makedirs(OUT, exist_ok=True)
    gen_l1()
    gen_l2()
    gen_jes_sources()
    gen_btag()
    gen_data_era()
