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


def test_survey_lists_every_query():
    with open("/root/repo/SURVEY.md") as fh:
        survey = fh.read()
    for name in E.queries():
        assert f"`{name}`" in survey, f"{name} missing from SURVEY.md §2"
