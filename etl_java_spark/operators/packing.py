"""Sequence packing for LLM training-data preparation (charter §2B).

Packs variable-length documents into fixed-token-budget training
sequences (greedy first-fit within each partition). The per-partition
greedy is the scalable form: packing is embarrassingly parallel as long
as sequences never span partitions, and a <1% fill-rate loss vs global
packing is the standard trade. Sequence ids are (partition, local) pairs
so they are globally unique without coordination.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

PACKED_SCHEMA = T.StructType(
    [
        T.StructField("seq_id", T.LongType()),
        T.StructField("doc_ids", T.ArrayType(T.LongType())),
        T.StructField("n_docs", T.IntegerType()),
        T.StructField("total_tokens", T.LongType()),
    ]
)


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_count_col: str,
    max_tokens: int = 2048,
    partitions: int | None = None,
) -> DataFrame:
    """Greedy first-fit packing of (doc, n_tokens) rows into sequences.

    Documents longer than ``max_tokens`` get a sequence of their own
    (truncation is the caller's policy). Output: one row per packed
    sequence with the member doc ids and token total.
    """
    src = df.select(F.col(id_col).alias("doc_id"), F.col(token_count_col).alias("n_tokens"))
    if partitions:
        src = src.repartition(partitions)

    def _pack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId() if TaskContext.get() else 0
        used: list[int] = []  # tokens used per open sequence
        members: list[list[int]] = []  # doc ids per open sequence
        for pdf in batches:
            for doc_id, n_tok in zip(pdf["doc_id"], pdf["n_tokens"]):
                n_tok = int(n_tok)
                for i in range(len(used)):
                    if used[i] + n_tok <= max_tokens:
                        used[i] += n_tok
                        members[i].append(int(doc_id))
                        break
                else:  # no open sequence fits (or doc is oversized)
                    used.append(n_tok)
                    members.append([int(doc_id)])
        yield pd.DataFrame(
            {
                "seq_id": [(pid << 32) | i for i in range(len(used))],
                "doc_ids": members,
                "n_docs": [len(m) for m in members],
                "total_tokens": used,
            }
        )

    return src.mapInPandas(_pack, PACKED_SCHEMA)


def pack_sequences_first_fit_grouped(
    df: DataFrame,
    id_col: str,
    token_count_col: str,
    group_col: str,
    max_tokens: int = 2048,
) -> DataFrame:
    """DETERMINISTIC first-fit packing: within each group, docs are
    processed in id order and each doc lands in the FIRST open sequence
    with room (vs ``pack_sequences_next_fit`` which only keeps the most
    recent sequence open). Better fill rate than next-fit, still fully
    canonical — the q77 DuckDB oracle replays the bin-fill state as a
    LIST column in a recursive CTE.

    Parallelism is per-group (applyInPandas), exactly like the next-fit
    variant; a doc longer than ``max_tokens`` opens its own (overfull)
    sequence that no later doc can join.

    Output: (group, seq_idx, n_docs, total_tokens), seq_idx 0-based in
    bin-creation order.
    """
    out_schema = T.StructType(
        [
            T.StructField("group", df.schema[group_col].dataType),
            T.StructField("seq_idx", T.LongType()),
            T.StructField("n_docs", T.IntegerType()),
            T.StructField("total_tokens", T.LongType()),
        ]
    )
    src = df.select(
        F.col(group_col).alias("group"),
        F.col(id_col).alias("doc_id"),
        F.col(token_count_col).alias("n_tokens"),
    )

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        fills: list[int] = []
        n_docs: list[int] = []
        for n_tok in pdf["n_tokens"].astype(int):
            for i in range(len(fills)):
                if fills[i] + n_tok <= max_tokens:
                    fills[i] += n_tok
                    n_docs[i] += 1
                    break
            else:
                fills.append(n_tok)
                n_docs.append(1)
        g = pdf["group"].iloc[0]
        return pd.DataFrame(
            {
                "group": [g] * len(fills),
                "seq_idx": range(len(fills)),
                "n_docs": n_docs,
                "total_tokens": fills,
            }
        )

    return src.groupBy("group").applyInPandas(_pack, out_schema)


def pack_sequences_next_fit(
    df: DataFrame,
    id_col: str,
    token_count_col: str,
    group_col: str,
    max_tokens: int = 2048,
) -> DataFrame:
    """DETERMINISTIC next-fit packing: within each group, docs are
    processed in id order and only the most recent sequence is open —
    if the doc doesn't fit, a new sequence starts.

    Next-fit trades a little fill rate vs first-fit for a canonical,
    engine-reproducible assignment (the q111 DuckDB oracle replays it
    with a recursive CTE). Parallelism is per-group (applyInPandas);
    groups are the packing unit exactly as partitions are for
    ``pack_sequences``. A doc longer than ``max_tokens`` opens its own
    (overfull) sequence; the next doc never joins it.

    Output: (group, seq_idx, n_docs, total_tokens).
    """
    out_schema = T.StructType(
        [
            T.StructField("group", df.schema[group_col].dataType),
            T.StructField("seq_idx", T.LongType()),
            T.StructField("n_docs", T.IntegerType()),
            T.StructField("total_tokens", T.LongType()),
        ]
    )
    src = df.select(
        F.col(group_col).alias("group"),
        F.col(id_col).alias("doc_id"),
        F.col(token_count_col).alias("n_tokens"),
    )

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        bins: list[tuple[int, int]] = []  # (n_docs, total_tokens)
        fill = None
        for n_tok in pdf["n_tokens"].astype(int):
            if fill is not None and fill + n_tok <= max_tokens:
                nd, tt = bins[-1]
                bins[-1] = (nd + 1, tt + n_tok)
                fill += n_tok
            else:
                bins.append((1, n_tok))
                fill = n_tok
        g = pdf["group"].iloc[0]
        return pd.DataFrame(
            {
                "group": [g] * len(bins),
                "seq_idx": range(len(bins)),
                "n_docs": [b[0] for b in bins],
                "total_tokens": [b[1] for b in bins],
            }
        )

    return src.groupBy("group").applyInPandas(_pack, out_schema)
