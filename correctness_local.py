"""Full-registry local correctness record in the driver's format.

The driver's per-round CORRECTNESS_r{N}.json samples 50 of the 225
registered queries (the same 50 every round), so ~78% of the surface
has only the local pytest oracle gate as evidence.  This script closes
that gap from the builder side: it runs EVERY ``__spark_entry__.
queries()`` entry on Spark and its ``oracle_sql()`` twin on DuckDB at
sf0.01 (the driver's correctness scale), compares row count / column
set / order-insensitive type-tagged canonical values — the exact
comparator the pytest gate uses (tests/test_entry_contract.py) — and
writes ``CORRECTNESS_LOCAL.json`` keyed like the driver's file:

    {name: {rows_match, schema_match, hash_match,
            spark_rows, oracle_rows, err}}

``hash_match`` here is canonical-value equality (sha256 over the
canonical row tuples on both sides — equality of digests iff equality
of canonicalized results).  Queries with no oracle twin record the
driver's weaker rows-only fallback (hash_match null).

Run:  python correctness_local.py          # all queries, ~15 min
      python correctness_local.py name...  # a subset
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")


def _digest(canon_rows) -> str:
    h = hashlib.sha256()
    for row in canon_rows:
        h.update("\x1f".join(row).encode())
        h.update(b"\x1e")
    return h.hexdigest()


def main() -> None:
    import __spark_entry__ as entry_mod
    from flow_indexer_spark.session import get_spark
    from tests.test_entry_contract import _canon, _duck

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    names = sys.argv[1:] or sorted(qs)
    unknown = [n for n in names if n not in qs]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    spark = get_spark(
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '16')}]",
        shuffle_partitions=16,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    out, t_start = {}, time.monotonic()
    for i, name in enumerate(names, 1):
        rec = {
            "rows_match": None,
            "schema_match": None,
            "hash_match": None,
            "spark_rows": None,
            "oracle_rows": None,
            "err": None,
        }
        try:
            sdf = qs[name](spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            rec["spark_rows"] = len(srows)
            sql = oracles.get(name)
            if sql is None:
                # driver fallback: rows-only evidence, no hash grade
                rec["rows_match"] = len(srows) >= 0
            else:
                con = _duck(SF_DIR)
                cur = con.execute(sql)
                ocols = [d[0] for d in cur.description]
                orows = cur.fetchall()
                con.close()
                rec["oracle_rows"] = len(orows)
                rec["rows_match"] = len(srows) == len(orows)
                rec["schema_match"] = sorted(scols) == sorted(ocols)
                rec["hash_match"] = (
                    rec["schema_match"]
                    and _digest(_canon(srows, scols))
                    == _digest(_canon(orows, ocols))
                )
        except Exception as exc:  # noqa: BLE001 — record, keep sweeping
            rec["err"] = f"{type(exc).__name__}: {exc}"[:300]
        out[name] = rec
        ok = rec["err"] is None and rec["rows_match"] and (
            rec["hash_match"] is not False
        ) and rec["schema_match"] is not False
        print(
            f"[{i}/{len(names)}] {name}: {'ok' if ok else 'FAIL ' + str(rec)}",
            flush=True,
        )
    spark.stop()

    n_hash = sum(1 for r in out.values() if r["hash_match"] is True)
    n_rows_only = sum(
        1 for r in out.values() if r["rows_match"] and r["hash_match"] is None
    )
    n_fail = len(out) - n_hash - n_rows_only
    summary = {
        "sf_dir": SF_DIR,
        "n_queries": len(out),
        "n_hash_green": n_hash,
        "n_rows_only": n_rows_only,
        "n_fail": n_fail,
        "wall_s": round(time.monotonic() - t_start, 1),
    }
    if len(names) == len(qs):
        with open(os.path.join(REPO, "CORRECTNESS_LOCAL.json"), "w") as f:
            json.dump({"_summary": summary, **out}, f, indent=1, sort_keys=True)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
