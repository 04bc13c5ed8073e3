"""End-to-end corpus curation (north star, §2.11): the single pass a
pretraining pipeline runs before tokenization — language gate, quality
gate, repetition gate, near-dup resolution — with a per-document
verdict and the FIRST failing reason.

Composes the individually-verified operators (`text_analysis.lang_id`,
`quality_score`, `repetition_stats`; `dedup.minhash_near_dups` +
`canonical_docs`); the composition itself adds only doc_id-keyed
joins, which co-partition after the first exchange. See SCALE.md §5.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import dedup as D
from . import text_analysis as TA


def curation_pipeline(docs: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", min_quality: float = 0.6,
                      jaccard_threshold: float = 0.5,
                      sigs: DataFrame | None = None) -> DataFrame:
    """Verdict per document → ``(doc_id, kept, reject_reason)`` where
    ``reject_reason`` ∈ {'lang', 'quality', 'repetitive', 'duplicate',
    NULL}: the FIRST failing gate in pipeline order, NULL if kept.

    Gate order mirrors real pipelines (cheap narrow screens first, the
    shuffling dedup last — at scale you'd materialize after the narrow
    gates and run dedup only on survivors; here every doc is scored so
    the verdict table is complete). ``filter(kept == 1)`` is the
    training corpus."""
    lang = TA.lang_id(docs, text_col, id_col).select(id_col, "pred_lang")
    qual = TA.quality_score(docs, text_col, id_col).select(id_col, "quality")
    rep = TA.repetition_stats(docs, text_col, id_col) \
        .select(id_col, "repetitive")
    pairs = D.minhash_near_dups(docs, text_col, id_col,
                                threshold=jaccard_threshold, sigs=sigs)
    canon = D.canonical_docs(docs, pairs, id_col).select(id_col, "is_dup")
    j = (docs.select(F.col(id_col))
         .join(lang, id_col).join(qual, id_col)
         .join(rep, id_col).join(canon, id_col))
    reason = (F.when(F.col("pred_lang") == "unk", F.lit("lang"))
              .when(F.col("quality") < F.lit(min_quality), F.lit("quality"))
              .when(F.col("repetitive") == 1, F.lit("repetitive"))
              .when(F.col("is_dup") == 1, F.lit("duplicate")))
    return j.select(
        F.col(id_col),
        F.when(reason.isNull(), F.lit(1)).otherwise(F.lit(0))
        .cast("int").alias("kept"),
        reason.alias("reject_reason"))
