"""Within-run A/B for perplexity_scores variants at sf0.1.

Variants:
  base      - current bigram_logprob (2 tokenize passes, SMJ on (w1,w2))
  bcast     - model localCheckpoint(eager) + count-guarded broadcast join
  split_tok - base but F.split tokenizer instead of regexp_extract_all
"""
import os, sys, time, statistics
sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), '..', '..')))

from pyspark.sql import functions as F, Window
from seqtables_spark import get_spark
from seqtables_spark.operators.widen import widen

SF = "/root/testdata/sf0.1"
REPS = 5

spark = get_spark(app_name="perp_ab")
docs_raw = spark.read.parquet(SF + "/documents.parquet")


def _docs():
    return widen(docs_raw, 8, only_if_narrow=True)


def _pairs(toks):
    return F.filter(
        F.zip_with(
            toks,
            F.slice(F.concat(toks, F.array(F.lit(None))), 2, F.size(toks)),
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
        ),
        lambda p: p["w2"].isNotNull(),
    )


def _doc_bigrams(df, tokenizer="regex"):
    if tokenizer == "regex":
        toks = F.regexp_extract_all(F.lower(F.col("text")), F.lit(r"\S+"), 0)
    else:
        toks = F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda t: t != "")
    return df.filter(F.size(toks) >= 2).select(
        "doc_id", F.explode(_pairs(toks)).alias("p")
    ).select("doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))


def _finish(doc_bigrams, model):
    scored = doc_bigrams.join(model, ["w1", "w2"]).select(
        "doc_id",
        F.round(F.log(F.col("c12").cast("double") / F.col("c1")) * 1_000_000)
        .cast("long").alias("lp_micro"),
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        (F.round((F.sum("lp_micro").cast("double") / F.count(F.lit(1))) / 1e6, 6)
         + F.lit(0.0)).alias("avg_logprob"),
    )


def run_base(tokenizer="regex"):
    db = _doc_bigrams(_docs(), tokenizer)
    model = db.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12")).withColumn(
        "c1", F.sum("c12").over(Window.partitionBy("w1")))
    return _finish(db, model)


def run_bcast(tokenizer="regex"):
    db = _doc_bigrams(_docs(), tokenizer)
    model = db.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12")).withColumn(
        "c1", F.sum("c12").over(Window.partitionBy("w1")))
    model = model.localCheckpoint(eager=True)
    n = model.count()
    if n <= 2_000_000:
        model = F.broadcast(model)
    return _finish(db, model)


VARIANTS = {
    "base": lambda: run_base("regex"),
    "bcast": lambda: run_bcast("regex"),
    "split_tok": lambda: run_base("split"),
    "bcast_split": lambda: run_bcast("split"),
}

# hash check vs base first
import hashlib
def _hash(df):
    rows = sorted(map(str, df.collect()))
    return hashlib.md5("\n".join(rows).encode()).hexdigest()

h0 = _hash(run_base())
for name, fn in VARIANTS.items():
    h = _hash(fn())
    print(f"hash {name}: {'OK' if h == h0 else 'MISMATCH ' + h}")

times = {n: [] for n in VARIANTS}
for rep in range(REPS):
    for name, fn in VARIANTS.items():
        t0 = time.time()
        fn().collect()
        times[name].append(time.time() - t0)
for name, ts in times.items():
    print(f"{name:12s} median {statistics.median(ts):.3f}s  all {[round(t,3) for t in ts]}")
