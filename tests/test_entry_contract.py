"""__spark_entry__ driver contract: entry smoke + inventory consistency."""

import __spark_entry__ as E


def test_entry_runs(spark):
    df = E.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {
        "s", "lambda", "a0", "b_quantity", "b_discount", "b_month", "df", "dev_ratio"
    }


def test_inventory_consistency():
    qs = E.queries()
    oracles = E.oracle_sql()
    assert len(qs) >= 45
    assert set(oracles) <= set(qs)
    # every oracle is non-trivial SQL addressing the registered views
    for name, sql in oracles.items():
        assert "SELECT" in sql.upper(), name


def test_no_complex_typed_output_columns(spark, sf_dir):
    """The correctness driver canonicalizes query output with a pandas
    sort/hash — array/map/struct cells are unhashable and turn a working
    query into a hard err row. Every registered query must emit scalar
    columns only (this is what broke 4 GLM path queries in round 2)."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    bad = {}
    for name, fn in E.queries().items():
        schema = fn(spark, sf_dir).schema
        complex_cols = [
            f.name for f in schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))
        ]
        if complex_cols:
            bad[name] = complex_cols
    assert not bad, f"complex-typed output columns break the driver: {bad}"


def test_survey_lists_every_query():
    with open("/root/repo/SURVEY.md") as fh:
        survey = fh.read()
    for name in E.queries():
        assert f"`{name}`" in survey, f"{name} missing from SURVEY.md §2"
