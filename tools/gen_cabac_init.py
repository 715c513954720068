"""Generate xevd_tpu/tables_cabac_init.py from the reference decoder's
normative CM_INIT CABAC context-initialization tables.

These are spec constants of ISO/IEC 23094-1 (the adaptive context-model
init values used when sps_cm_init_flag=1); the authoritative values live in
the reference at src_main/xevdm_tbl.c:64-377.  We extract the numbers (not
code) into a generated Python module.
"""
from __future__ import annotations

import re
from pathlib import Path

REF = Path("/root/reference/src_main/xevdm_tbl.c")
OUT = Path(__file__).resolve().parent.parent / "xevd_tpu" / "tables_cabac_init.py"


def main():
    src = REF.read_text()
    # match: const s16 init_<name>[2][...] = { {...}, {...}, };
    pat = re.compile(
        r"const\s+s16\s+(init_\w+)\s*\[2\]\[[^\]]+\]\s*=\s*\{(.*?)\};",
        re.S)
    out = ["'''CM_INIT context-model initialization values (generated).\n\n"
           "Normative constants of ISO/IEC 23094-1, extracted from the\n"
           "reference tables (ref: src_main/xevdm_tbl.c:64-377) by\n"
           "tools/gen_cabac_init.py.  Layout: name -> (row_P_or_I, row_B).\n"
           "'''\n"]
    n = 0
    for m in pat.finditer(src):
        name, body = m.group(1), m.group(2)
        rows = re.findall(r"\{([^{}]*)\}", body)
        assert len(rows) == 2, name
        vals = []
        for r in rows:
            nums = [int(x) for x in re.findall(r"-?\d+", r)]
            vals.append(tuple(nums))
        assert len(vals[0]) == len(vals[1]), name
        out.append(f"{name} = ({vals[0]!r}, {vals[1]!r})\n")
        n += 1
    OUT.write_text("\n".join(out))
    print(f"wrote {OUT} with {n} tables")


if __name__ == "__main__":
    main()
