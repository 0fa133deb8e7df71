"""100 TB discipline: assert the physical plans are the plans we want —
pushdown, pruning, broadcasts, no Python in hot paths — not merely that
results are correct (SURVEY §4)."""

from __future__ import annotations

import pyspark.sql.functions as F

from labelspark_spark.plans import explain
from labelspark_spark.queries import (
    q_join_broadcast_lookup,
    q_q1_pricing_summary,
    q_q3_shipping_priority,
    q_scan_project,
    q_uploads_build,
)
from labelspark_spark.sources import read_table

from .conftest import SF_SMOKE


def test_filter_pushdown_reaches_scan(spark):
    li = read_table(spark, SF_SMOKE, "lineitem").filter(F.col("l_quantity") > 40).select(
        "l_orderkey"
    )
    assert explain.has_pushed_filters(li)


def test_column_pruning(spark):
    df = q_scan_project(spark, SF_SMOKE)
    cols = explain.read_schema_columns(df)
    # only the 4 projected source columns are read, not all 11
    assert set(cols) == {"l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"}


def test_q1_is_two_stage_hash_agg(spark):
    plan = explain.formatted_plan(q_q1_pricing_summary(spark, SF_SMOKE))
    # partial + final HashAggregate (map-side combine), single exchange
    assert plan.count("HashAggregate") >= 2
    assert "PushedFilters" in plan


def test_q3_broadcasts_small_sides(spark):
    # at test scale, customer/orders are tiny -> Catalyst should broadcast
    assert explain.has_broadcast_join(q_q3_shipping_priority(spark, SF_SMOKE))


def test_lookup_join_is_broadcast(spark):
    assert explain.has_broadcast_join(q_join_broadcast_lookup(spark, SF_SMOKE))


def test_uploads_build_has_no_python_udf(spark):
    plan = explain.formatted_plan(q_uploads_build(spark, SF_SMOKE))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_whole_stage_codegen_present(spark):
    assert explain.codegen_stage_count(q_q1_pricing_summary(spark, SF_SMOKE)) >= 1
