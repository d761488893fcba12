"""Decode compressed posting blocks back into DataFrames.

The decode kernel is a single Arrow-batched ``mapInPandas`` pass over the
pruned block scan — numpy varint decode, no per-row Python. Everything after
(scoring, joins, top-k) is pure Catalyst.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..index import codec

POSTINGS_SCHEMA = T.StructType([
    T.StructField("field", T.StringType(), False),
    T.StructField("term", T.StringType(), False),
    T.StructField("docid", T.LongType(), False),
    T.StructField("tf", T.IntegerType(), False),
    T.StructField("doclen", T.IntegerType(), False),
])

POSTINGS_POS_SCHEMA = T.StructType(
    POSTINGS_SCHEMA.fields + [T.StructField("positions", T.ArrayType(T.IntegerType()), False)]
)


def decode_postings(blocks: DataFrame, with_positions: bool = False) -> DataFrame:
    """blocks (BLOCKS_SCHEMA rows) -> long postings DataFrame."""
    import pandas as pd

    schema = POSTINGS_POS_SCHEMA if with_positions else POSTINGS_SCHEMA

    def decode(batches):
        for pdf in batches:
            fields, terms, docids, tfs, doclens, poss = [], [], [], [], [], []
            for row in pdf.itertuples(index=False):
                d, t, dl = codec.decode_block(bytes(row.docids_z), bytes(row.tfs_z), bytes(row.doclens_z))
                k = len(d)
                fields.append(np.repeat(row.field, k))
                terms.append(np.repeat(row.term, k))
                docids.append(d.astype(np.int64))
                tfs.append(t.astype(np.int32))
                doclens.append(dl.astype(np.int32))
                if with_positions:
                    poss.extend(
                        p.astype(np.int32) for p in codec.decode_positions(bytes(row.positions_z), k)
                    )
            if not fields:
                continue
            out = pd.DataFrame({
                "field": np.concatenate(fields),
                "term": np.concatenate(terms),
                "docid": np.concatenate(docids),
                "tf": np.concatenate(tfs),
                "doclen": np.concatenate(doclens),
            })
            if with_positions:
                out["positions"] = [list(map(int, p)) for p in poss]
            yield out

    return blocks.mapInPandas(decode, schema)


def bm25_score_col(tf_col, doclen_col, df: int, n_docs: int, avg_doclen: float,
                   k1: float = 1.2, b: float = 0.75):
    """BM25 per-term score as a pure Catalyst column expression — formula is
    exactly the reference's (QrySopScore.java:78-90): idf is constant-folded,
    tf weight runs in whole-stage codegen."""
    idf = max(0.0, float(np.log((n_docs - df + 0.5) / (df + 0.5))))
    tfd = tf_col.cast("double")
    return F.lit(idf) * tfd / (tfd + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * doclen_col.cast("double") / F.lit(float(avg_doclen))))
