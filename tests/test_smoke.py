from etl_wikipedia_updates_spark.tables import TABLE_NAMES, register_views

EXPECTED_MIN_ROWS = {
    "region": 5,
    "nation": 25,
    "customer": 100,
    "supplier": 10,
    "part": 100,
    "orders": 1000,
    "lineitem": 5000,
    "events": 500,
    "documents": 100,
    "embeddings": 100,
}


def test_all_tables_load(spark, sf_smoke):
    dfs = register_views(spark, sf_smoke)
    assert set(dfs) == set(TABLE_NAMES)
    for name, df in dfs.items():
        assert df.count() >= EXPECTED_MIN_ROWS[name], name


def test_embedding_schema(spark, sf_smoke):
    dfs = register_views(spark, sf_smoke)
    emb = dfs["embeddings"]
    field = {f.name: f.dataType.simpleString() for f in emb.schema.fields}
    assert field["embedding"] == "array<float>"
