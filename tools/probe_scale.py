"""Reproducible large-scale probe behind SCALE.md's measured claims.

Generates a deterministic 1M-document English-like corpus (hashed
letter-only vocabulary, 20% stopwords, engineered duplication: per
10-doc decade one exact copy and one near-dup of the decade leader),
writes it as a testdata-layout directory, and times the declared
pipeline stages against it.

Usage: python tools/probe_scale.py [n_docs] [out_dir]
Defaults: 1_000_000 /tmp/p2ss_probe_1m
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

STOPS = ["the", "of", "and", "to", "in"]
STAGES = ["dedup_exact", "dedup_minhash", "corpus_prep_pipeline",
          "corpus_prep_pipeline_lsh", "dedup_passage",
          "text_quality_score"]


def synth_text(idcol):
    toks = []
    for k in range(60):
        if k % 5 == 4:
            toks.append(F.lit(STOPS[(k // 5) % 5]))
        else:
            h = F.abs(F.xxhash64(idcol * 60 + k)) % 9973
            toks.append(F.translate(h.cast("string"),
                                    "0123456789", "abcdefghij"))
    return F.concat_ws(" ", *toks)


def generate(spark, n: int, out_dir: str) -> None:
    base = spark.range(n).select(F.col("id").alias("doc_id"))
    lead = F.col("doc_id") - (F.col("doc_id") % 10)
    txt = (F.when(F.col("doc_id") % 10 == 7, synth_text(lead))
           .when(F.col("doc_id") % 10 == 8,
                 F.concat(synth_text(lead), F.lit(" zqextratail")))
           .otherwise(synth_text(F.col("doc_id"))))
    docs = base.select(
        "doc_id", txt.alias("text"), F.lit("en").alias("lang"),
        F.lit("probe").alias("source"), F.length(txt).alias("n_chars"))
    docs.write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/p2ss_probe_1m"

    from project_2_semantic_similarity_spark.plans.registry import (
        QUERIES, load_all)
    from project_2_semantic_similarity_spark.session import get_spark

    load_all()
    spark = get_spark("probe_scale", cpus=32)
    t = time.time()
    generate(spark, n, out)
    print(f"corpus gen+write ({n} docs): {time.time() - t:.1f}s")
    for name in STAGES:
        t = time.time()
        cnt = QUERIES[name](spark, out).count()
        print(f"{name}: {time.time() - t:.1f}s rows={cnt}")


if __name__ == "__main__":
    main()
