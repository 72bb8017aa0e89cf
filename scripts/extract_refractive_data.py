"""Extract the water/ice refractive-index data tables from the reference.

The reference ships the published optical-constant compilations (Hale &
Querry 1972, Palmer & Williams 1974, Downing & Williams 1975, Ray 1972 for
water; Warren 1984 for ice) as Fortran DATA statements inside
Tools/RefractiveIndex-IceAndWater.f.  This script parses those DATA
statements and stores the numeric tables (public literature data, not code)
as i3rc_tpu/tools/data/refractive_index.npz for the Python implementation
in i3rc_tpu/tools/refractive_index.py.

Usage: python scripts/extract_refractive_data.py [path-to-fortran-file]
"""

from __future__ import annotations

import re
import sys

import numpy as np

DEFAULT_SRC = "/root/reference/Tools/RefractiveIndex-IceAndWater.f"
OUT = "i3rc_tpu/tools/data/refractive_index.npz"


def join_statements(lines):
    """Merge Fortran-77 continuation lines into single statements."""
    stmts = []
    for raw in lines:
        line = raw.rstrip("\n")
        if not line.strip() or line[:1].upper() == "C":
            continue
        body = line[6:]
        is_cont = len(line) > 5 and line[5] not in (" ", "0")
        if is_cont and stmts:
            stmts[-1] += body
        else:
            stmts.append(body)
    return stmts


def parse_data_statements(src_text, subroutine):
    """Collect {array_name: {flat_index: value}} from one subroutine's DATA."""
    # Isolate the subroutine body
    m = re.search(rf"SUBROUTINE\s+{subroutine}\b(.*?)\n\s*END\b", src_text,
                  re.DOTALL | re.IGNORECASE)
    body = m.group(1)
    stmts = join_statements(body.splitlines())
    arrays: dict = {}
    for s in stmts:
        s = s.strip()
        if not s.upper().startswith("DATA"):
            continue
        s = s[4:].strip()
        # Two forms: (NAME(I[,k]),I=a,b)/values/  or  NAME[,NAME...]/values/
        m1 = re.match(r"\(\s*(\w+)\s*\(\s*I\s*(?:,\s*(\d+)\s*)?\)\s*,\s*I\s*=\s*"
                      r"([\dA-Z]+)\s*,\s*([\dA-Z]+)\s*\)\s*/(.*)/\s*$", s,
                      re.IGNORECASE)
        m2 = re.match(r"([\w\s,]+)/(.*)/\s*$", s)
        if m1:
            name = m1.group(1).upper()
            col = int(m1.group(2)) if m1.group(2) else 0
            lo = m1.group(3).upper()
            hi = m1.group(4).upper()
            consts = {"NWLT": 62, "NWL": 468}
            lo = consts.get(lo, None) if not lo.isdigit() else int(lo)
            hi = consts.get(hi, None) if not hi.isdigit() else int(hi)
            values = [float(v.replace("D", "E")) for v in m1.group(5).split(",")]
            assert hi - lo + 1 == len(values), (name, lo, hi, len(values))
            store = arrays.setdefault((name, col), {})
            for i, v in zip(range(lo, hi + 1), values):
                store[i] = v
        elif m2:
            names = [n.strip().upper() for n in m2.group(1).split(",")]
            values = [float(v.replace("D", "E")) for v in m2.group(2).split(",")]
            if len(names) == 1 and len(values) > 1:
                store = arrays.setdefault((names[0], 0), {})
                for i, v in enumerate(values, start=1):
                    store[i] = v
            else:
                for n, v in zip(names, values):
                    arrays.setdefault((n, 0), {})[1] = v
    return arrays


def to_vector(store):
    n = max(store)
    out = np.empty(n)
    for i in range(1, n + 1):
        out[i - 1] = store[i]
    return out


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_SRC
    text = open(src).read()

    water = parse_data_statements(text, "REFWAT")
    ice = parse_data_statements(text, "REFICE")

    wl_water = to_vector(water[("WLTABW", 0)])
    rn_water = to_vector(water[("RNTABW", 0)])
    cn_water = to_vector(water[("CNTABW", 0)])
    assert wl_water.size == rn_water.size == cn_water.size == 518

    wl_ice = to_vector(ice[("WL", 0)])
    re_ice = to_vector(ice[("TABRE", 0)])
    im_ice = to_vector(ice[("TABIM", 0)])
    assert wl_ice.size == re_ice.size == im_ice.size == 468
    wlt_ice = to_vector(ice[("WLT", 0)])
    assert wlt_ice.size == 62
    ret_ice = np.stack([to_vector(ice[("TABRET", k)]) for k in range(1, 5)], axis=1)
    imt_ice = np.stack([to_vector(ice[("TABIMT", k)]) for k in range(1, 5)], axis=1)
    temref = to_vector(ice[("TEMREF", 0)])
    assert temref.size == 4

    np.savez_compressed(
        OUT,
        water_wavelength=wl_water, water_real=rn_water, water_imag=cn_water,
        ice_wavelength=wl_ice, ice_real=re_ice, ice_imag=im_ice,
        ice_wavelength_t=wlt_ice, ice_real_t=ret_ice, ice_imag_t=imt_ice,
        ice_temperatures=temref)
    print(f"wrote {OUT}: water {wl_water.size} pts "
          f"({wl_water[0]}-{wl_water[-1]} um), ice {wl_ice.size} pts "
          f"({wl_ice[0]}-{wl_ice[-1]} um) + {wlt_ice.size} microwave pts x 4 T")


if __name__ == "__main__":
    main()
