"""IST session-parity: the reference's 09:15–15:30 market-hours window is
IST wall clock (ZoneInfo('Asia/Kolkata'), reference config/settings.py:32).
With the session timezone set to IST, the same market-hours predicate
gates on IST wall time — no operator changes needed."""

from __future__ import annotations

from datetime import datetime, timezone

from options_data_pipeline_spark.operators.filters import in_session


def test_market_hours_respects_session_timezone(spark):
    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "Asia/Kolkata")
    try:
        # 03:45 UTC == 09:15 IST (inclusive open); 10:00 UTC == 15:30 IST
        # (exclusive close); 20:00 UTC == 01:30 IST next day (out)
        rows = [
            (1, datetime(2024, 1, 5, 3, 45, tzinfo=timezone.utc)),
            (2, datetime(2024, 1, 5, 10, 0, tzinfo=timezone.utc)),
            (3, datetime(2024, 1, 5, 20, 0, tzinfo=timezone.utc)),
            (4, datetime(2024, 1, 5, 6, 0, tzinfo=timezone.utc)),  # 11:30 IST in
        ]
        df = spark.createDataFrame(rows, "event_id long, ts timestamp")
        kept = {r.event_id for r in in_session(df).collect()}
        assert kept == {1, 4}
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
