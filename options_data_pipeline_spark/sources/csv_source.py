"""Scrip-master CSV scan + symbol matching (reference S7/J6).

Reference: 80-column exchange scrip-master CSV parsed with column-name
inference over candidate lists, then uppercase-symbol set matching with
first-match-wins (``fetch_tokens.py:132-211``). Spark-first:
``spark.read.csv(header=True)`` + candidate-column resolution against the
actual header + ``isin`` semi-filter + ``dropDuplicates`` for
first-match-wins. Column pruning reaches the scan (only the 3 resolved
columns are read).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# candidate header names, in preference order (reference fetch_tokens.py:141-156)
SYMBOL_CANDIDATES = ["pSymbolName", "pTrdSymbol", "symbol", "tradingsymbol", "sSymbol"]
TOKEN_CANDIDATES = ["pSymbol", "token", "instrument_token", "pScripRefKey"]
SEGMENT_CANDIDATES = ["pExchSeg", "exchange_segment", "segment", "exch_seg"]


def _resolve(columns: list[str], candidates: list[str], what: str) -> str:
    by_lower = {c.lower(): c for c in columns}
    for cand in candidates:
        if cand.lower() in by_lower:
            return by_lower[cand.lower()]
    raise ValueError(f"no {what} column among {candidates}; header has {columns[:10]}...")


def read_scrip_master(spark: SparkSession, path: str) -> DataFrame:
    """CSV → normalized (symbol, token, segment) dimension."""
    raw = spark.read.csv(path, header=True)
    sym = _resolve(raw.columns, SYMBOL_CANDIDATES, "symbol")
    tok = _resolve(raw.columns, TOKEN_CANDIDATES, "token")
    seg = _resolve(raw.columns, SEGMENT_CANDIDATES, "segment")
    return raw.select(
        F.upper(F.trim(F.col(sym))).alias("symbol"),
        F.trim(F.col(tok)).alias("token"),
        F.trim(F.col(seg)).alias("segment"),
    )


def match_tokens(scrip: DataFrame, target_symbols: list[str]) -> DataFrame:
    """J6: uppercase symbol ∈ target set, first match wins (deterministic:
    lowest token per symbol)."""
    targets = [s.upper() for s in target_symbols]
    return (
        scrip.filter(F.col("symbol").isin(targets))
        .withColumn(
            "_rn",
            F.row_number().over(Window.partitionBy("symbol").orderBy("token")),
        )
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
