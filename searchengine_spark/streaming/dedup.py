"""Stateful streaming exact-dedup: drop documents whose content hash was
already seen anywhere earlier in the stream.

The batch pipeline's ``ops.dedup.exact_dedup`` groups the whole corpus; a
continuous ingest needs the same guarantee ACROSS micro-batches, which is a
custom stateful operator — ``applyInPandasWithState`` keyed by a hash prefix
so state shards evenly across partitions (10^12-scale state cannot key by the
full hash: 2^16 prefix groups × a set of seen hashes each keeps per-group
state bounded and the shuffle balanced; the state store checkpoints with the
query, so restart resumes exactly-once).

Emits each batch's FIRST-SEEN rows (doc_id, text_md5); duplicates within a
batch keep the smallest doc_id (same keeper rule as the batch op).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

OUT_SCHEMA = StructType(
    [StructField("doc_id", LongType()), StructField("text_md5", StringType())]
)
STATE_SCHEMA = StructType([StructField("seen", StringType())])  # '|'-joined md5s


def _dedup_group(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    seen: set[str] = set()
    if state.exists:
        (packed,) = state.get
        if packed:
            seen = set(packed.split("|"))
    out_ids, out_md5 = [], []
    for pdf in pdfs:
        for _, row in (
            pdf.sort_values("doc_id").drop_duplicates("text_md5", keep="first").iterrows()
        ):
            h = row["text_md5"]
            if h not in seen:
                seen.add(h)
                out_ids.append(int(row["doc_id"]))
                out_md5.append(h)
    state.update(("|".join(sorted(seen)),))
    yield pd.DataFrame({"doc_id": out_ids, "text_md5": out_md5})


def streaming_exact_dedup(
    stream_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    prefix_len: int = 2,
) -> DataFrame:
    """stream → first-seen (doc_id, text_md5) rows, state keyed by md5
    prefix. Compose with ``writeStream`` in append mode."""
    hashed = stream_df.select(
        F.col(id_col).alias("doc_id"),
        F.md5(F.col(text_col)).alias("text_md5"),
        F.substring(F.md5(F.col(text_col)), 1, prefix_len).alias("shard"),
    )
    return hashed.groupBy("shard").applyInPandasWithState(
        _dedup_group,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
