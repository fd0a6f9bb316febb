"""Generate a larger-tier stress fixture set by key-shifted replication
of the driver's sf0.1 tables (the driver ships sf0.001/0.01/0.1 only;
VERDICT r3 item 5 asks for a tier where compute outweighs Spark's
scheduling floor).

NOT a replacement for the driver's fixtures — written to a gitignored
dir (default /root/repo/.stress/sf1) and consumed only by
`DRIVER_SIM_SF_DIR=... scripts/driver_sim.py` / `SPARK_GRAFT_SF_DIR=...
bench.py`, which compare Spark against DuckDB over the SAME files, so
the correctness gate stays self-contained whatever the data.

Scaling rules (COPIES× the sf0.1 row counts, deterministic):
  - every id column is offset per copy by a table-specific stride, so
    referential integrity holds within and across copies (orders.c
    _custkey -> customer, lineitem.l_orderkey -> orders, events.user_id
    -> customer, embeddings.vec_id ~ documents.doc_id);
  - dimension tables region/nation are NOT scaled (they are fixed
    domains, like real TPC-H);
  - documents.text gets a per-copy VOCABULARY suffix (every token of
    copy i becomes `tok_i`): per-copy token/shingle structure is
    identical to sf0.1 while copies share no shingles at all. (First
    attempt rotated the token list instead — WRONG: rotation preserves
    all but two 3-shingles, so all COPIES copies of a doc were mutual
    near-duplicates and the candidate-pair space exploded ~COPIES², OOMing
    the DuckDB oracle. Replicating a corpus must not replicate its
    shingle space.);
  - embeddings scale by EMB_COPIES (default 3, not 10) with a tiny
    deterministic per-copy jitter: the embedding near-dup ORACLE is an
    exact all-pairs self-join, O(n²) in DuckDB by design, so this table's
    stress tier is bounded by the oracle, not the engine.
"""

from __future__ import annotations

import glob as globmod
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from data_ingestion_service_spark.session import get_spark

SRC = os.environ.get("GEN_SCALE_SRC", "/root/testdata/sf0.1")
# Skew mode (VERDICT r4 item 4): reshape the scaled data like a real
# crawl-heavy training mix — ONE source owns 80% of documents and ONE
# user owns 80% of events — so the skew guards (AQE skew-split, salting,
# per-shard packing windows) fire on organically-shaped data instead of
# only on the forced-skew posture fixtures. Purely deterministic
# remapping (id % 10 < 8), so both engines read identical files and the
# oracle gate stays exact.
SKEW = os.environ.get("GEN_SCALE_SKEW", "") == "1"
OUT = os.environ.get(
    "GEN_SCALE_OUT",
    "/root/repo/.stress/sf1skew" if SKEW else "/root/repo/.stress/sf1",
)
COPIES = int(os.environ.get("GEN_SCALE_COPIES", "10"))
EMB_COPIES = int(os.environ.get("GEN_SCALE_EMB_COPIES", "3"))
HOT_USER = 1  # lowest customer key — always a valid FK target

# Key strides: comfortably above each table's max id at sf0.1.
C_OFF = 100_000          # c_custkey / user_id
S_OFF = 10_000           # s_suppkey
P_OFF = 100_000          # p_partkey
O_OFF = 10_000_000       # o_orderkey
E_OFF = 10_000_000       # event_id
D_OFF = 100_000          # doc_id / vec_id


def main() -> None:
    spark = get_spark(app_name="gen-scale")
    copies = spark.range(COPIES).select(F.col("id").cast("int").alias("cp"))

    def write_single_file(df, name: str) -> None:
        """Stage as one part file, then move it to <name>.parquet — the
        driver's fixture layout (one FILE per table; DuckDB's view path
        depends on it). Row groups are capped at 8MB: DuckDB
        parallelizes scans BY ROW GROUP, so a default-sized single-group
        file pins every downstream operator to one thread (measured:
        the sf1 edit-distance oracle ran 137s at threads=32 and 137s at
        threads=1 over a one-group documents file)."""
        stage = f"{OUT}/_stage_{name}"
        (
            df.coalesce(1)
            .write.mode("overwrite")
            .option("parquet.block.size", str(2 * 1024 * 1024))
            .parquet(stage)
        )
        [part] = globmod.glob(f"{stage}/part-*.parquet")
        target = f"{OUT}/{name}.parquet"
        if os.path.isdir(target):
            shutil.rmtree(target)
        shutil.move(part, target)
        shutil.rmtree(stage)

    def scaled(name: str, offsets: dict[str, int], extra=None, n_copies=None):
        df = spark.read.parquet(f"{SRC}/{name}.parquet")
        cps = copies if n_copies is None else spark.range(n_copies).select(
            F.col("id").cast("int").alias("cp")
        )
        out = df.crossJoin(F.broadcast(cps))
        for col, off in offsets.items():
            out = out.withColumn(col, (F.col(col) + F.col("cp").cast("long") * off).cast(dict(df.dtypes)[col]))
        if extra is not None:
            out = extra(out)
        write_single_file(out.drop("cp"), name)
        print(f"{name}: {df.count()} -> {spark.read.parquet(f'{OUT}/{name}.parquet').count()}")

    os.makedirs(OUT, exist_ok=True)
    # Fixed-domain dims: copy through unchanged.
    for name in ("region", "nation"):
        write_single_file(spark.read.parquet(f"{SRC}/{name}.parquet"), name)
        print(f"{name}: copied")

    scaled("customer", {"c_custkey": C_OFF})
    scaled("supplier", {"s_suppkey": S_OFF})
    scaled("part", {"p_partkey": P_OFF})
    scaled("orders", {"o_orderkey": O_OFF, "o_custkey": C_OFF})
    scaled(
        "lineitem",
        {"l_orderkey": O_OFF, "l_partkey": P_OFF, "l_suppkey": S_OFF},
    )
    def hot_user(out):
        if not SKEW:
            return out
        return out.withColumn(
            "user_id",
            F.when(F.col("event_id") % 10 < 8, F.lit(HOT_USER).cast("long"))
            .otherwise(F.col("user_id")),
        )

    scaled("events", {"event_id": E_OFF, "user_id": C_OFF}, extra=hot_user)

    def suffix_vocab(out):
        toks = F.split("text", " ")
        suffixed = F.transform(
            toks, lambda t: F.concat(t, F.lit("_"), F.col("cp").cast("string"))
        )
        out = out.withColumn("text", F.array_join(suffixed, " "))
        if SKEW:
            # 80% of docs land in src0 — the dominant-crawl shape. Token
            # content is untouched: dedup/shingle structure stays the
            # per-copy-unique design above; only GROUPING skews.
            out = out.withColumn(
                "source",
                F.when(F.col("doc_id") % 10 < 8, F.lit("src0")).otherwise(
                    F.col("source")
                ),
            )
        return out

    scaled("documents", {"doc_id": D_OFF}, extra=suffix_vocab)

    def jitter(out):
        return out.withColumn(
            "embedding",
            F.concat(
                F.array((F.element_at("embedding", 1) + F.col("cp") * F.lit(1e-3)).cast("float")),
                F.slice("embedding", 2, F.size("embedding") - 1),
            ),
        )

    scaled("embeddings", {"vec_id": D_OFF}, extra=jitter, n_copies=EMB_COPIES)
    spark.stop()


if __name__ == "__main__":
    main()
