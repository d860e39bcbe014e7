"""Training-data curation with go_iceberg_spark's operator library:
dedup -> quality gate -> decontaminate -> split -> pack. Runs offline on the
bundled testdata.

Run:  PYTHONPATH=<repo root> python examples/curation.py [sf_dir]
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

from go_iceberg_spark.operators import dedup as D
from go_iceberg_spark.operators import text as X
from go_iceberg_spark.operators.sampling import hash_split, pack_by_token_budget
from go_iceberg_spark.session import EngineConfig, get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(EngineConfig(app_name="curation-example"))
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    print(f"corpus: {docs.count()} documents")

    # 1. exact dedup (near-dup would add D.minhash_lsh_pairs + keep list)
    kept = D.exact_dedup(docs, ["text"], "doc_id").select("doc_id", "text")
    print(f"after exact dedup: {kept.count()}")

    # 2. quality gate: drop the worst quartile by the frozen quality score
    surv = X.quality_filter(kept, "doc_id", "text", min_quantile=0.25, exact=True)
    curated = kept.join(surv.select("doc_id"), on="doc_id")
    print(f"after quality gate: {curated.count()}")

    # 3. decontaminate against an eval set (here: a slice of the corpus)
    eval_set = docs.filter(F.col("doc_id") % 97 == 0)
    hits = D.contamination(curated, eval_set, "doc_id", "text", n=3)
    clean = curated.join(hits.select("doc_id").distinct(), on="doc_id", how="left_anti")
    print(f"after decontamination: {clean.count()}")

    # 4. deterministic split + token-budget packing for the train shard
    split = hash_split(clean, "doc_id", {"train": 90, "val": 5, "test": 5})
    train = split.filter(F.col("split") == "train").withColumn(
        "n_tokens", X.token_count_expr(F.col("text")))
    packed = pack_by_token_budget(train, "doc_id", "n_tokens", budget=512)
    print("train bins:", packed.select("bin_id").distinct().count())
    split.groupBy("split").count().show()


if __name__ == "__main__":
    main()
