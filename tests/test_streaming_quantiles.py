"""Standing rolling-quantile monitor (streaming/quantiles.py): the
streamed daily-histogram zone must equal the batch
`histogram_daily_sketches` relation exactly (merge-by-addition is
lossless), the monitor's rolling quantiles must equal the batch
rollup bit-for-bit, and a re-delivered final batch must change
nothing (the retry-guarded fold contract)."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import Window
from pyspark.sql import functions as F

from big_data_analytics_final_project_spark.operators.sketches import (
    histogram_daily_sketches,
    histogram_rolling_quantiles,
)
from big_data_analytics_final_project_spark.sources import load_table
from big_data_analytics_final_project_spark.streaming import (
    EVENT_SCHEMA,
    read_event_stream,
)
from big_data_analytics_final_project_spark.streaming.quantiles import (
    fold_histogram_batch,
    maintain_daily_histograms,
    read_daily_histograms,
    score_rolling_quantiles,
)

from .conftest import SF_SMOKE

LO, HI, BINS = 0.0, 500.0, 64
QS = [0.5, 0.95]


def _hist_rows(df):
    return sorted((r.day, r.bin, r.cnt) for r in df.collect())


def _quant_rows(df):
    return sorted(
        (r.day, r.n_days_merged, r.q, r.estimate) for r in df.collect()
    )


def test_streamed_zone_equals_batch_and_retry_is_noop(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    batch_daily = histogram_daily_sketches(ev, "ts", "value", LO, HI, BINS)
    want_hist = _hist_rows(batch_daily)
    want_quant = _quant_rows(
        histogram_rolling_quantiles(batch_daily, QS, LO, HI, BINS, 7)
    )
    root = tempfile.mkdtemp(prefix="stream_quant_")
    try:
        src = f"{root}/src"
        chunked = ev.select(
            *[f.name for f in EVENT_SCHEMA.fields]
        ).withColumn(
            "_chunk", F.ntile(4).over(Window.orderBy("ts", "event_id"))
        )
        for c in (1, 2, 3, 4):
            chunked.filter(F.col("_chunk") == c).drop("_chunk").coalesce(
                1
            ).write.mode("append").parquet(src)
        zone = f"{root}/zone"
        q = (
            maintain_daily_histograms(
                read_event_stream(spark, src),
                zone,
                f"{root}/ckpt",
                LO,
                HI,
                BINS,
            )
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(300), "stream did not finish"
        zone_df = read_daily_histograms(spark, zone)
        assert _hist_rows(zone_df) == want_hist
        got_quant = _quant_rows(
            score_rolling_quantiles(zone_df, QS, LO, HI, BINS, 7)
        )
        assert got_quant == want_quant

        # re-delivering the final batch is a no-op per (day, bin)
        raw = spark.read.parquet(zone)
        bmax = raw.agg(F.max("last_batch_id")).collect()[0][0]
        last = chunked.filter(F.col("_chunk") == 4).drop("_chunk")
        fold_histogram_batch(last, bmax, zone, LO, HI, BINS)
        assert _hist_rows(read_daily_histograms(spark, zone)) == want_hist
    finally:
        shutil.rmtree(root, ignore_errors=True)
