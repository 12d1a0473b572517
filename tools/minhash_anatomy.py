"""Per-stage anatomy of the dedup_minhash_lsh pipeline (r11 verdict #4).

The 32x stress decade reports one wall-time ratio; this probe reports
WHERE the work is — per-stage row counts at a given sf_dir — so the
ratio is attributable: if docs grow k-fold, the banded index grows
k-fold, and the CANDIDATE PAIR count (the only super-linear risk in
the whole pipeline — it is what the band join emits) is shown growing
linearly, the decade certifies the operator rather than the fixture.

Stages (matching minhash_lsh_pairs, operators/dedup.py):
  docs            corpus rows
  sig_rows        signature-index rows (docs with >= 1 shingle)
  band_rows       exploded (doc, band_key) rows fed to the self-join
  candidates      distinct id_a < id_b pairs sharing >= 1 band
                  (threshold 0.0 keeps every candidate: exact Jaccard
                  is >= 0 by construction, so the verify filter
                  passes everything and the count IS the band-join
                  output after first-match-band dedup)
  verified        pairs with exact Jaccard >= 0.3 (the registered gate)

Usage: python tools/minhash_anatomy.py [sf_dir ...]
Defaults to sf0.1 and the 32x stress fixture if it exists.

With --linear K, additionally builds (or reuses) a CONSTANT-DENSITY
K-fold documents fixture and reports its anatomy: copy i rewrites
every token t as "c{i}{t}", so copy vocabularies are pairwise
DISJOINT (cross-copy Jaccard = 0) while each copy is internally a
token-bijection of the base corpus (intra-copy Jaccard values, and
per-shingle df counts, are IDENTICAL to base). True-pair density is
therefore constant by construction and EVERY stage — including the
band-join candidate count, the only super-linear risk — must grow
exactly K-fold if the operator is linear. This is the fixture the
shared `_shifted` recipe is not: its " variant{i}" suffix keeps
cross-copy Jaccard ~= 1, so its near-dup output is quadratic TRUE
pairs (see SCALE.md round-12) and it measures output volume, not
operator scaling.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from dataframe_retail_e_inventarios_spark.operators.dedup import (
    minhash_index,
    minhash_lsh_pairs_from_index,
)
from dataframe_retail_e_inventarios_spark.plans.queries_llm import MAX_DF
from dataframe_retail_e_inventarios_spark.session import get_spark
from dataframe_retail_e_inventarios_spark.sources.readers import load_table
from tools.scale_stress import scaled_fixture_dir

K, BANDS, THRESHOLD = 16, 4, 0.3


def anatomy(spark, sf_dir: str) -> dict:
    docs = load_table(spark, sf_dir, "documents")
    t0 = time.time()
    sig = minhash_index(docs, K, max_df=MAX_DF)
    # localCheckpoint: each stage below is counted once from the same
    # materialized index instead of re-tokenizing the corpus per count
    # (probe-only; the production operator relies on ReuseExchange).
    sig = sig.localCheckpoint(eager=True)
    out = {
        "sf_dir": sf_dir,
        "docs": docs.count(),
        "sig_rows": sig.count(),
        "band_rows": sig.count() * BANDS,
        "candidates": minhash_lsh_pairs_from_index(sig, 0.0, K, BANDS).count(),
        "verified": minhash_lsh_pairs_from_index(sig, THRESHOLD, K, BANDS).count(),
        "sec": round(time.time() - t0, 1),
    }
    return out


def linear_docs_fixture(spark, base_dir: str, k: int) -> str:
    """Build (or reuse) the constant-density k-fold documents fixture:
    copy i shifts doc ids and prefixes every whitespace token with
    "c{i}" — a per-copy token bijection, so intra-copy similarity
    structure and per-shingle df are exactly the base corpus's while
    cross-copy Jaccard is 0."""
    import tempfile

    out = os.path.join(tempfile.gettempdir(), f"spark_graft_lineardocs_{k}x_v1")
    dst = os.path.join(out, "documents.parquet")
    if os.path.exists(dst):
        return out
    base = load_table(spark, base_dir, "documents")
    # Pre-normalize exactly like operators/textops.tokens() (lower,
    # trim, collapse whitespace) so the per-copy prefix map is a strict
    # bijection on the operator's own token sequences — intra-copy
    # Jaccard values and per-shingle df counts match base exactly.
    norm = F.lower(F.trim(F.regexp_replace(F.col("text"), r"\s+", " ")))
    scaled = base
    for i in range(1, k):
        tagged = F.array_join(
            F.transform(
                F.split(norm, " "),
                lambda t: F.concat(F.lit(f"c{i}"), t),
            ),
            " ",
        )
        scaled = scaled.unionByName(
            base.withColumn("doc_id", F.col("doc_id") + 1_000_000 * i)
            .withColumn("text", tagged)
        )
    scaled.write.mode("overwrite").parquet(dst)
    return out


def main() -> int:
    args = sys.argv[1:]
    linear_k = None
    if "--linear" in args:
        i = args.index("--linear")
        linear_k = int(args[i + 1])
        del args[i : i + 2]
    dirs = args
    if not dirs:
        dirs = ["/root/testdata/sf0.1"]
        k32 = scaled_fixture_dir(32)
        if os.path.exists(k32):
            dirs.append(k32)
    spark = get_spark("minhash-anatomy")
    if linear_k:
        dirs = ["/root/testdata/sf0.1",
                linear_docs_fixture(spark, "/root/testdata/sf0.1", linear_k)]
    rows = []
    for d in dirs:
        r = anatomy(spark, d)
        rows.append(r)
        print(json.dumps(r), flush=True)
    if len(rows) == 2 and rows[0]["docs"]:
        ratio = {
            key: round(rows[1][key] / rows[0][key], 2)
            for key in ("docs", "band_rows", "candidates", "verified")
            if rows[0][key]
        }
        print(json.dumps({"growth_ratios": ratio}), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
