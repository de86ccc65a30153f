"""Bot classifier as pure Column algebra — zero UDFs.

Reference: ``BotClassifier.classify`` (Common.scala:25-50, thresholds
Common.scala:11-14). The reference evaluates the rules in a Scala
closure inside typed Dataset ops, which is opaque to Catalyst; here the
same rules are native boolean Columns so they stay inside whole-stage
codegen and can be pushed/pruned/folded.

Semantics preserved exactly:
- ``requests``:   clicks + views > 1000
- ``categories``: distinct-category count > 5
- ``clicks/views``: **integer division** clicks / max(views, 1) > 5
  (Common.scala:36 — Long/Long floor division; fires only when
  clicks >= 6 * views)
- reason precedence: requests > categories > clicks/views > "clear"
  (Common.scala:43-46)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Thresholds — Common.scala:11-14.
REQUEST_LIMIT = 1000
CATEGORY_LIMIT = 5
CLICKS_TO_VIEWS_LIMIT = 5

REASON_REQUESTS = "requests"
REASON_CATEGORIES = "categories"
REASON_RATIO = "clicks/views"
REASON_CLEAR = "clear"


def requests_col(clicks: Column, views: Column) -> Column:
    """Total request count (Common.scala:29)."""
    return clicks + views


def ratio_col(clicks: Column, views: Column) -> Column:
    """Integer-division click:view ratio (Common.scala:36).

    Scala ``Long / Long`` truncates; all operands are non-negative so
    ``floor`` is identical. ``greatest(views, 1)`` mirrors the
    ``math.max(views, 1)`` zero guard.
    """
    return F.floor(clicks / F.greatest(views, F.lit(1))).cast("long")


def is_bot_col(
    clicks: Column,
    views: Column,
    categories_count: Column,
    request_limit: int = REQUEST_LIMIT,
    category_limit: int = CATEGORY_LIMIT,
    ratio_limit: int = CLICKS_TO_VIEWS_LIMIT,
) -> Column:
    """Boolean verdict (disjunction of the three rules, Common.scala:39-41)."""
    return (
        (requests_col(clicks, views) > request_limit)
        | (categories_count > category_limit)
        | (ratio_col(clicks, views) > ratio_limit)
    )


def reason_col(
    clicks: Column,
    views: Column,
    categories_count: Column,
    request_limit: int = REQUEST_LIMIT,
    category_limit: int = CATEGORY_LIMIT,
    ratio_limit: int = CLICKS_TO_VIEWS_LIMIT,
) -> Column:
    """First-true reason with fixed precedence (Common.scala:43-46)."""
    return (
        F.when(requests_col(clicks, views) > request_limit, F.lit(REASON_REQUESTS))
        .when(categories_count > category_limit, F.lit(REASON_CATEGORIES))
        .when(ratio_col(clicks, views) > ratio_limit, F.lit(REASON_RATIO))
        .otherwise(F.lit(REASON_CLEAR))
    )


def with_verdict(df, clicks="clicks", views="views", categories_count="categories_count"):
    """Append ``is_bot`` / ``reason`` columns to an aggregated stats frame."""
    c, v, k = F.col(clicks), F.col(views), F.col(categories_count)
    return df.withColumn("is_bot", is_bot_col(c, v, k)).withColumn(
        "reason", reason_col(c, v, k)
    )
