"""Distributed embedding (SURVEY §2.1 'external embed source'): texts are
embedded executor-side via mapInPandas in batches of EMBED_BATCH (the
reference calls its API in batches of 960, BinaryVectorDB/BinaryVectorDB.py:104-112
— the batch size survives as the knob here).

The embedder is a plain function `(list[str]) -> np.ndarray[n, dim]`; the
default deterministic local embedder stands in for a network embedding API.
A real API client plugs in the same way — each Arrow batch becomes one
API call, partitions embed in parallel.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

EMBED_BATCH = 960  # reference batch size (:105)


def embed_texts(df: DataFrame, dim: int,
                embed_fn: Callable[[Sequence[str]], np.ndarray] | None = None,
                id_col: str = "doc_id", text_col: str = "text",
                batch_size: int = EMBED_BATCH) -> DataFrame:
    """df(id, text, ...) -> (id, text, embedding array<float>) — embedded in
    executor-side batches; no data funnels through the driver."""
    if embed_fn is None:
        from binaryvectordb_spark.db import local_embedder
        embed_fn = lambda texts: local_embedder(texts, dim)  # noqa: E731

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            for lo in range(0, len(b), batch_size):
                chunk = b.iloc[lo:lo + batch_size]
                emb = embed_fn(list(chunk[text_col]))
                yield pd.DataFrame({
                    id_col: chunk[id_col].values,
                    text_col: chunk[text_col].values,
                    "embedding": [row.astype(np.float32) for row in emb],
                })

    out_schema = f"{id_col} long, {text_col} string, embedding array<float>"
    return df.select(id_col, text_col).mapInPandas(gen, schema=out_schema)
