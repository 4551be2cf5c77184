"""Pin cross-engine assumptions the oracle SQL makes about the driver's
fixture tables (r7 ADVICE): _LOGREG_FEAT_SQL inner-joins documents to
unnest-derived token counts, which would DROP a NULL-text document on the
DuckDB side while the Spark feature builder keeps every row — divergent
n/count(*) if the fixture ever grew NULL text. Rather than complicate
every oracle with LEFT JOIN + coalesce for a case the data generator
never produces, assert the assumption so a fixture change fails loudly
here instead of as an opaque driver hash-red.
"""

from __future__ import annotations

import duckdb
import pytest

SF_DIRS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_documents_text_never_null(sf_dir):
    n = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{sf_dir}/documents.parquet') "
        "WHERE text IS NULL"
    ).fetchone()[0]
    assert n == 0, (
        f"{sf_dir}: {n} NULL-text documents — the logreg feature oracles "
        "(_LOGREG_FEAT_SQL's inner join) and Spark's _logreg_spark_feat "
        "would now disagree on corpus size; switch the oracle to LEFT "
        "JOIN + coalesce before trusting any quality-gate row"
    )


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_embeddings_fixed_width_non_null(sf_dir):
    # the pico-unit vector kernels unroll a fixed dim=64 in oracle SQL
    bad = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{sf_dir}/embeddings.parquet') "
        "WHERE embedding IS NULL OR len(embedding) <> 64"
    ).fetchone()[0]
    assert bad == 0
