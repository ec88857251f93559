"""Driver-contract smoke: entry()/queries()/oracle_sql() shape invariants."""

from __future__ import annotations

import importlib.util


def load_entry():
    spec = importlib.util.spec_from_file_location("entry_mod", "/root/repo/__spark_entry__.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def test_entry_runs_and_returns_rows(spark):
    m = load_entry()
    df = m.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.schema.fieldNames() == ["user_id", "last_ts", "last_event_type", "last_value"]


def test_catalog_shape(spark):
    m = load_entry()
    qs, osql = m.queries(), m.oracle_sql()
    assert len(qs) >= 20
    assert set(osql) <= set(qs)  # every oracle key has a query
    # every oracle is plain SQL text
    assert all(isinstance(s, str) and "SELECT" in s.upper() for s in osql.values())
    # callables carry their documented names
    assert all(callable(fn) for fn in qs.values())
