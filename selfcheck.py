"""Self-check harness: run EVERY registered query against its DuckDB
oracle with the driver-style canonical compare (row count + column
names + value hash over column-sorted / row-sorted / 6-dp-rounded
frames) and write one JSON artifact.

The driver's per-round CORRECTNESS sweep has a bounded window (observed
~50 entries); this runs the full surface so every registered query has
a recorded, reproducible pass/fail row each round.

Usage:
    python selfcheck.py [sf_dir] [out.json]      # defaults sf0.01
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))

import pandas as pd


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "CORRECTNESS_selfcheck.json"

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False,
        )

    from oracle_utils import canon_frame, duck_oracle

    from ehdc_llpg_address_matching_ray.pipelines import queries as Q

    def vhash(df: pd.DataFrame) -> str:
        return hashlib.md5(df.to_csv(index=False).encode()).hexdigest()

    results: dict[str, dict] = {}
    n_pass = n_fail = 0
    for name, fn in Q.QUERIES.items():
        t0 = time.time()
        row: dict = {}
        try:
            res = fn(sf)
            df = res.to_pandas() if hasattr(res, "to_pandas") else pd.DataFrame(res)
            a = canon_frame(df)
            b = canon_frame(duck_oracle(sf, Q.ORACLE_SQL[name]))
            row["rows"] = [len(a), len(b)]
            row["rows_match"] = len(a) == len(b)
            row["schema_match"] = list(a.columns) == list(b.columns)
            row["hash_match"] = row["rows_match"] and row["schema_match"] and vhash(
                a
            ) == vhash(b)
            row["status"] = "pass" if row["hash_match"] else "FAIL"
        except Exception as e:  # noqa: BLE001 — record, keep sweeping
            row["status"] = f"error: {type(e).__name__}: {e}"
        row["sec"] = round(time.time() - t0, 2)
        results[name] = row
        ok = row["status"] == "pass"
        n_pass += ok
        n_fail += not ok
        print(f"[{('PASS' if ok else 'FAIL')}] {name} ({row['sec']}s)", flush=True)

    artifact = {
        "sf_dir": sf,
        "n_queries": len(Q.QUERIES),
        "n_pass": n_pass,
        "n_fail": n_fail,
        "results": results,
    }
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"{n_pass}/{len(Q.QUERIES)} pass -> {out_path}", flush=True)
    ray.shutdown()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
