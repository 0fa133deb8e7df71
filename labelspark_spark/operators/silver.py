"""Bronze->silver wide-table builder (SURVEY §2.4 A4/A5/A6).

Reference: `labelspark/bronze_to_silver.py:13-76` iterates rows on the
driver via pandas-on-Spark ``iterrows``, hand-building per-row dicts of
classification answers and ``<title>.count`` object counters, then joins
back to bronze. Rebuilt fully distributed:

- object counts  = explode -> groupBy(key, title) -> count -> pivot
- answer columns = explode -> groupBy(key).pivot(title).agg(first)
  with a deterministic pre-sort (the reference's first-wins dict insert,
  `add_json_answers_to_dictionary.py:34-36`, is order-dependent; we pin
  order explicitly so results are reproducible)
- checklist folds = array_join(transform(...)) per A6
- final inner join on the row key (+ frame for video) per J1
  (`bronze_to_silver.py:67-74`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def object_counts_wide(
    df: DataFrame,
    key_cols: list[str],
    objects_col: str,
    title_field: str = "title",
    titles: list[str] | None = None,
    suffix: str = ".count",
) -> DataFrame:
    """A4 rebuilt: one ``<title>.count`` column per object class.

    ``titles`` pins the pivot width (mandatory discipline at scale — an
    unpinned pivot runs an extra distinct job over all data).
    """
    # key columns ride through the pivot under RESERVED names: a
    # pivoted title that happens to equal a key column name would
    # otherwise produce two same-named columns, break the
    # `c not in key_cols` rename filter, and make the select ambiguous
    # (r11 review — ontology titles are user-controlled)
    tmp = [f"_ls_key_{i}__" for i in range(len(key_cols))]
    exploded = df.select(
        *[F.col(k).alias(t) for k, t in zip(key_cols, tmp)],
        F.explode(F.col(objects_col)).alias("_obj"),
    ).select(*tmp, F.col(f"_obj.{title_field}").alias("_title"))
    pivot = exploded.groupBy(*tmp).pivot("_title", values=titles).agg(
        F.count(F.lit(1))
    )
    renamed = pivot.select(
        *[F.col(t).alias(k) for t, k in zip(tmp, key_cols)],
        *[F.col(f"`{c}`").alias(f"{c}{suffix}") for c in pivot.columns if c not in tmp],
    )
    return renamed


def answers_wide(
    df: DataFrame,
    key_cols: list[str],
    entries_col: str,
    title_field: str = "title",
    answer_expr=None,
    titles: list[str] | None = None,
) -> DataFrame:
    """A5 rebuilt: one column per classification question.

    first-wins semantics made deterministic: entries are ranked by array
    position within each (key, title) group and only rank 1 survives.
    """
    # same reserved-name discipline as object_counts_wide: a question
    # title equal to a key column name must not collide with it
    tmp = [f"_ls_key_{i}__" for i in range(len(key_cols))]
    exploded = df.select(
        *[F.col(k).alias(t) for k, t in zip(key_cols, tmp)],
        F.posexplode(F.col(entries_col)).alias("_pos", "_entry"),
    )
    answer = answer_expr if answer_expr is not None else F.col("_entry.answer")
    shaped = exploded.select(
        *tmp,
        F.col(f"_entry.{title_field}").alias("_title"),
        answer.alias("_answer"),
        F.col("_pos"),
    )
    w = Window.partitionBy(*tmp, "_title").orderBy("_pos")
    first_wins = (
        shaped.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn", "_pos")
    )
    pivot = first_wins.groupBy(*tmp).pivot("_title", values=titles).agg(
        F.first("_answer")
    )
    return pivot.select(
        *[F.col(t).alias(k) for t, k in zip(tmp, key_cols)],
        *[F.col(f"`{c}`") for c in pivot.columns if c not in tmp],
    )


def checklist_fold(col, item_field: str = "title", delim: str = ",") :
    """A6: checklist array -> delimited string, natively.

    Reference: `add_json_answers_to_dictionary.py:26-30` (','.join in
    Python). Here: array_join(transform(...)).
    """
    return F.array_join(F.transform(col, lambda x: x[item_field]), delim)


def bronze_to_silver(
    bronze: DataFrame,
    key_cols: list[str],
    objects_col: str | None = None,
    classifications_col: str | None = None,
    object_titles: list[str] | None = None,
    question_titles: list[str] | None = None,
) -> DataFrame:
    """End-to-end silver build: counts + answers joined back to keys.

    The join is on the full key set — including the frame column for
    video — mirroring `bronze_to_silver.py:67-74`'s guard against
    N^2 row blowup.
    """
    out = bronze.select(*key_cols).distinct()
    if objects_col is not None:
        out = out.join(
            object_counts_wide(bronze, key_cols, objects_col, titles=object_titles),
            on=key_cols,
            how="left",
        )
    if classifications_col is not None:
        out = out.join(
            answers_wide(bronze, key_cols, classifications_col, titles=question_titles),
            on=key_cols,
            how="left",
        )
    return out
