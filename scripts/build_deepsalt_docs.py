"""Deep-salted documents corpus for shingle-family 100x rungs.

scale_smoke.py's replication salts each copy by APPENDING one token
("copy{i}"), which leaves every interior 8-token shingle IDENTICAL
across copies. That is the right instrument below ~64 copies (cross-
copy pairs are genuine near-dups, output quadratic in copies — the
l50/l49 output-bound rungs), but at >= L49_DF_CAP(64)+1 copies every
shingle's document frequency crosses the cap and l49's pair GENERATION
empties by construction: a standard-corpus 100x rung would measure the
cap pass only, not pair state.

This builder salts INSIDE the shingles instead: every 4th token gets a
per-copy suffix, so every 8-token shingle contains >= 2 salted tokens
and is copy-unique. Cross-copy df contribution collapses to zero while
WITHIN-copy duplicate structure (the base corpus's genuine dup pairs)
is preserved per copy — postings, df profile, pair generation and
output all scale LINEARLY in copies, which is exactly the regime the
100 TB claim is about (a real corpus 100x bigger has ~100x more dup
pairs, not 10,000x).

Only documents.parquet is written (the l49/l38/l39/l42 family reads
nothing else). Written as 64 files: a single-file corpus caps every
scan stage at 1-4 tasks (parquet splits at row-group boundaries and
the whole table is one ~40 MB row group), which serializes the
CPU-heavy shingling passes on a 32-core box and contaminates the rung
— measured r12: 3 shingle passes at 4-task parallelism were ~30% of
l49's deep-salt 100x wall. A real 100 TB table is thousands of files.

--salt-every 1 (the "fullsalt" corpus) salts EVERY token, which is a
per-copy TOKEN BIJECTION: within one copy every pairwise token-set
Jaccard is IDENTICAL to the base corpus (near-dup cluster structure
preserved exactly, incl. l51's uniq_ppm scores), while cross-copy
token sets are disjoint (Jaccard 0 < any threshold). That bounds
cluster size at the base corpus's as copies grow — the instrument the
CLUSTER-family rungs (l51) need, where deep-salt's positional
salting is wrong: near-dup pair members differ in token count, so
"every 4th position" salts DIFFERENT tokens across the pair and
destroys their similarity (measured r14: l51 keepers 43300 on
deepsalt-10x vs 11950 = 10x base on fullsalt-10x).

Usage: python scripts/build_deepsalt_docs.py [n_copies] [--salt-every K]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sparkstreaming_mq_spark.session import get_spark
from sparkstreaming_mq_spark.tables import load_table

SRC = "/root/testdata/sf0.1"
KEYSPAN = 10_000_000
SALT_EVERY = 4  # < L38_NGRAM(8)/2 -> every 8-shingle holds >=2 salted tokens


def main() -> int:
    args = list(sys.argv[1:])
    salt_every = SALT_EVERY
    if "--salt-every" in args:
        i = args.index("--salt-every")
        salt_every = int(args[i + 1])
        del args[i : i + 2]
    n_copies = int(args[0]) if args else 100
    kind = "fullsalt" if salt_every == 1 else "deepsalt"
    out_dir = f"/tmp/sparkgraft_{kind}_{n_copies}x_v2"  # v2: 64-file layout
    done = os.path.join(out_dir, "_READY")
    if os.path.exists(done):
        print(f"reusing {out_dir}")
        return 0
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(
        app_name="deepsalt-build",
        shuffle_partitions=64,
        extra_conf={"spark.driver.memory": "24g"},
    )
    copies = spark.range(n_copies).withColumnRenamed("id", "i")
    docs = load_table(spark, SRC, "documents").crossJoin(F.broadcast(copies))
    salted = (
        docs.withColumn("doc_id", F.col("doc_id") + F.col("i") * KEYSPAN)
        .withColumn(
            "text",
            F.array_join(
                F.transform(
                    F.split(F.col("text"), " "),
                    lambda t, j: F.when(
                        j % salt_every == 0,
                        F.concat(t, F.lit("~c"), F.col("i").cast("string")),
                    ).otherwise(t),
                ),
                " ",
            ),
        )
        .drop("i")
    )
    t0 = time.time()
    salted.repartition(64).write.mode("overwrite").parquet(
        os.path.join(out_dir, "documents.parquet")
    )
    open(done, "w").close()
    print(f"built {out_dir} in {time.time() - t0:.1f}s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
