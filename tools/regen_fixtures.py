#!/usr/bin/env python3
"""Regenerate the expected-output oracle fixtures for the sketch queries.

The MinHash/SimHash/LSH pair queries are deterministic (seeded) but their
recall is not SQL-expressible, so their sf0.01 results are pinned as parquet
fixtures under src/test/resources/oracle/ and the oracle SQL just reads them
back (see QueriesLlm.fixtureSql). Run this ONLY after a deliberate behavior
change to those pipelines, and eyeball the diff:

    sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"
    python tools/regen_fixtures.py /tmp/verify_out
"""
import glob
import os
import sys

import pandas as pd

FIXTURES = {
    "q_minhash_pairs": ["id_a", "id_b"],
    "q_dedup_cross": ["id_new", "id_old"],
    "q_simhash_pairs": ["id_a", "id_b"],
    "q_embed_neardup_ann": ["id_a", "id_b"],
    "q_dedup_near_full": ["doc_id"],
}

def main(verify_out):
    outdir = os.path.join(os.path.dirname(__file__), "..",
                          "src/test/resources/oracle")
    os.makedirs(outdir, exist_ok=True)
    for name, order in FIXTURES.items():
        parts = sorted(glob.glob(f"{verify_out}/{name}/*.parquet"))
        if not parts:
            sys.exit(f"no verify output for {name} under {verify_out}")
        df = pd.concat([pd.read_parquet(f) for f in parts], ignore_index=True)
        df = df.sort_values(order).reset_index(drop=True)
        path = os.path.join(outdir, f"{name}.parquet")
        df.to_parquet(path, index=False)
        print(f"wrote {path}: {len(df)} rows")

if __name__ == "__main__":
    main(sys.argv[1])
