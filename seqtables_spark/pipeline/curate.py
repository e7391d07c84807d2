"""End-to-end corpus curation: the composed pre-training cleaning
pipeline (quality gate -> language filter -> exact-dedup survivor
selection) as ONE lazy DataFrame plan.

Each stage is an existing operator from this package; composing them
stays a single Catalyst plan, so the optimizer pushes the cheap
quality predicates into the parquet scan and every row that fails the
gate is never tokenized, language-scored, or hashed. At 100 TB this
ordering is the whole game: the row-local filters (quality, language)
run scan-side and only survivors reach the one shuffle (the dedup
group-by on the content digest).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import exact_dedup
from .text import language_id


def curate_documents(
    df: DataFrame,
    min_tokens: int = 10,
    max_tokens: int = 5000,
    min_alpha_ratio: float = 0.4,
    drop_undetermined: bool = True,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Curated corpus view: rows that pass the quality gate and the
    language check, minus exact duplicates (deterministic min-id
    survivor per content digest).

    Returns the input columns + (n_tokens, pred_lang, lang_score) for
    surviving rows only. Survivor selection is a LEFT SEMI join of the
    gated rows against the digest group-by's keep ids - the semi side
    is aggregated (one row per distinct content), so the join never
    rematerializes duplicate payloads.
    """
    t = F.col(text_col)
    n_tokens = F.size(F.regexp_extract_all(t, F.lit(r"\S+"), 0))
    n_alpha = F.length(F.regexp_replace(t, r"[^A-Za-z]", ""))
    alpha_ratio = n_alpha.cast("double") / F.length(t)
    gated = df.filter(
        (n_tokens >= min_tokens)
        & (n_tokens <= max_tokens)
        & (alpha_ratio >= min_alpha_ratio)
    ).withColumn("n_tokens", n_tokens.cast("long"))
    langed = language_id(gated, text_col=text_col, id_col=id_col)
    if drop_undetermined:
        langed = langed.filter(F.col("pred_lang") != "und")
    survivors = exact_dedup(langed, text_col=text_col, id_col=id_col).select(
        F.col("keep_id").alias(id_col)
    )
    return langed.join(survivors, id_col, "left_semi")
