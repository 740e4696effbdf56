#!/usr/bin/env python
"""Prove the SCALE.md §1 bucketed-read claim: with transcripts stored
bucketed by conv_id, the flagship triple extraction runs with ZERO
exchanges — the groupBy(conv_id, mention_type) reuses the storage
partitioning (HashPartitioning(conv_id) satisfies the clustered
distribution of any key set containing conv_id).

The same plan over a plain parquet directory needs one shuffle.  This is
the parquet-dir stand-in for an Iceberg `bucket(N, conv_id)` table: the
transform is identical, only the catalog metadata differs.

Writes the evidence (both formatted plans + exchange counts) to
BUCKETED_READ.md and exits non-zero if the bucketed plan still shuffles.

Usage: python scripts/bucketed_read_demo.py [sf_dir]
"""

from __future__ import annotations

import io
import re
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, "/root/repo")

from kie_invoice_minimal_spark.operators.mention_detect import (  # noqa: E402
    detect_mentions_native,
)
from kie_invoice_minimal_spark.operators.triples import materialize_triples  # noqa: E402
from kie_invoice_minimal_spark.session import get_spark  # noqa: E402
from kie_invoice_minimal_spark.sources.transcripts import (  # noqa: E402
    transcripts_from_documents,
)

N_BUCKETS = 16
WAREHOUSE = "/tmp/spark_graft_bucket_demo_warehouse"


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def n_exchanges(plan: str) -> int:
    # count detail entries ("(9) Exchange"), not tree lines — the formatted
    # output renders each node twice (tree + per-node detail)
    return len(re.findall(r"^\(\d+\) Exchange", plan, re.M))


def main(sf_dir: str = "/root/testdata/sf0.01") -> int:
    import shutil

    shutil.rmtree(WAREHOUSE, ignore_errors=True)  # fresh demo warehouse
    spark = get_spark(
        app_name="bucketed-read-demo",
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={"spark.sql.warehouse.dir": WAREHOUSE},
    )
    spark.sparkContext.setLogLevel("ERROR")

    t = transcripts_from_documents(spark, sf_dir)

    # materialize both layouts from the same logical table
    plain_path = f"{WAREHOUSE}/transcripts_plain"
    t.write.mode("overwrite").parquet(plain_path)
    (
        t.write.mode("overwrite")
        .bucketBy(N_BUCKETS, "conv_id")
        .sortBy("conv_id", "turn_idx")
        .format("parquet")
        .saveAsTable("transcripts_bucketed")
    )

    def triples_over(src):
        return materialize_triples(detect_mentions_native(src))

    plain = triples_over(spark.read.parquet(plain_path))
    bucketed = triples_over(spark.table("transcripts_bucketed"))

    plan_plain = plan_of(plain)
    plan_bucketed = plan_of(bucketed)
    ex_plain = n_exchanges(plan_plain)
    ex_bucketed = n_exchanges(plan_bucketed)

    # correctness guard: both layouts produce the identical triple set
    n_plain = plain.count()
    n_bucketed = bucketed.count()
    diff = plain.exceptAll(bucketed).count() + bucketed.exceptAll(plain).count()

    def timed(df):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        return time.time() - t0

    timed(plain)  # warm
    s_plain = min(timed(plain), timed(plain))
    s_bucketed = min(timed(bucketed), timed(bucketed))

    ok = ex_bucketed == 0 and ex_plain >= 1 and diff == 0
    with open("/root/repo/BUCKETED_READ.md", "w") as f:
        f.write(
            f"""# Bucketed-read demonstration (SCALE.md §1 claim, proven)

`scripts/bucketed_read_demo.py` materializes the sf-dir transcripts twice —
a plain parquet directory and a `bucketBy({N_BUCKETS}, conv_id)` +
`sortBy(conv_id, turn_idx)` table (the parquet stand-in for Iceberg
`bucket({N_BUCKETS}, conv_id)`) — and runs the identical flagship plan
(native mention detection -> `groupBy(conv_id, mention_type)` triple
materialization) over both.

| layout | exchanges in physical plan | rows | min-of-2 wall (noop write) |
|---|---|---|---|
| plain parquet dir | {ex_plain} | {n_plain} | {s_plain:.2f}s |
| bucketed by conv_id | {ex_bucketed} | {n_bucketed} | {s_bucketed:.2f}s |

Result sets are identical (symmetric exceptAll diff = {diff} rows).

Why zero exchanges: the bucketed scan reports
`HashPartitioning(conv_id, {N_BUCKETS})`; the aggregation keys
`(conv_id, mention_type)` are a superset of the partitioning expression, so
`ClusteredDistribution` is already satisfied and Catalyst plans the final
aggregate directly on the scan output — extraction with zero exchanges.
The narrow detector (posexplode + projections) preserves the partitioning
because `conv_id` survives every projection.  (The Arrow detector variant
does not — `mapInPandas` emits a new attribute set, so its plan keeps the
one groupBy exchange; at cluster scale you pick the native detector when
the input is bucketed, or accept the single shuffle.)

## Plan over bucketed table (zero Exchange)

```
{plan_bucketed.strip()}
```

## Plan over plain parquet ({ex_plain} Exchange nodes)

```
{plan_plain.strip()}
```
"""
        )
    print(
        f"plain: {ex_plain} exchanges ({s_plain:.2f}s) | bucketed: {ex_bucketed} "
        f"exchanges ({s_bucketed:.2f}s) | diff rows: {diff} -> {'OK' if ok else 'FAIL'}"
    )
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
