"""Stream-stream joins: watermarked click -> purchase attribution.

The last Structured Streaming join shape the engine needs beyond
stream-static enrichment (``windows.enrich_with_dim``): BOTH sides
unbounded, matched on key + a bounded time interval. Watermarks on the
two event-time columns let Spark expire join state — without the bound
the click buffer grows forever; with it, state is (watermark + window)
deep per key, constant for any stream length.

Batch inputs run the identical join condition without watermarks (the
correctness oracle for the streaming path — pytest compares the two on
the same data).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attribute_purchases(
    clicks: DataFrame,
    purchases: DataFrame,
    window: str = "30 minutes",
    watermark: str = "10 minutes",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Every (click, purchase) pair of the same user where the purchase
    lands within ``window`` at-or-after the click — the attribution
    join behind conversion reporting. Inner stream-stream join; append
    output.

    Returns (user_id, click_id, click_ts, purchase_id, purchase_ts,
    purchase_value). For one-purchase-one-click attribution, follow
    with the funnel/as-of operators on the (small) matched output."""
    c = clicks.select(
        F.col(user_col).alias("user_id"),
        F.col("event_id").alias("click_id"),
        F.col(ts_col).alias("click_ts"),
    )
    p = purchases.select(
        F.col(user_col).alias("p_user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col(ts_col).alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    if clicks.isStreaming:
        c = c.withWatermark("click_ts", watermark)
    if purchases.isStreaming:
        p = p.withWatermark("purchase_ts", watermark)
    cond = (
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"interval {window}"))
    )
    return c.join(p, on=cond, how="inner").select(
        "user_id",
        "click_id",
        "click_ts",
        "purchase_id",
        "purchase_ts",
        "purchase_value",
    )
