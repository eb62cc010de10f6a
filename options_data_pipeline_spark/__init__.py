"""options_data_pipeline_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the capabilities of the reference pipeline
(Mohak-0014/Options_Data_Pipeline, a streaming tick→OHLC→ATR ETL system) as an
idiomatic Spark DataFrame / Structured Streaming engine, extended with
large-scale LLM-data-pipeline operators (dedup, similarity search, text
analysis, multimodal plumbing).

Design stance (SURVEY.md §7):
 - batch-first DataFrame engine, streaming twin where semantics demand it
 - every operator a native Column expression except the single stateful
   pandas-UDF island (Wilder ATR)
 - dims broadcast, facts partitioned by date, dedup via anti-join / MERGE
"""

__version__ = "0.1.0"
