"""Extract i-quant codebook constants from the reference header into npz.

The IQ* formats are defined by fixed codebook grids (numeric constants in
ggml/src/ggml-common.h) — wire-format facts without which no independent
implementation can decode the formats.  This tool parses the tables once
and commits them as data (ggml_hexagon_tpu/quant/iq_data.npz).
"""
import re
import sys

import numpy as np

SRC = "/root/reference/ggml/src/ggml-common.h"

TABLES = {
    "kvalues_iq4nl": np.int8,
    "kmask_iq2xs": np.uint8,
    "ksigns_iq2xs": np.uint8,
    "iq2xxs_grid": np.uint64,
    "iq2xs_grid": np.uint64,
    "iq2s_grid": np.uint64,
    "iq3xxs_grid": np.uint32,
    "iq3s_grid": np.uint32,
    "iq1s_grid": np.uint64,
}


def main(out_path: str):
    text = open(SRC).read()
    out = {}
    for name, dtype in TABLES.items():
        m = re.search(
            rf"GGML_TABLE_BEGIN\(\w+,\s*{name},\s*[\w_]+\)(.*?)GGML_TABLE_END\(\)",
            text,
            re.S,
        )
        if not m:
            print(f"WARNING: table {name} not found", file=sys.stderr)
            continue
        body = m.group(1)
        vals = re.findall(r"(-?0x[0-9a-fA-F]+|-?\d+)", body)
        arr = np.array([int(v, 0) for v in vals], dtype=np.int64 if dtype == np.int8 else np.uint64)
        out[name] = arr.astype(dtype)
        print(f"{name}: {out[name].size} entries ({dtype.__name__})")
    np.savez_compressed(out_path, **out)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "ggml_hexagon_tpu/quant/iq_data.npz")
