"""Driver contract (__ray_entry__): every oracle key has a queries()
entry, every callable is well-formed, and entry() runs the flagship at
sf0.001 producing rows with a stable schema."""

import __ray_entry__ as entrymod


def test_oracle_keys_subset_of_queries():
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    missing = set(o) - set(q)
    assert not missing, f"oracle_sql keys without queries(): {missing}"
    assert all(callable(f) for f in q.values())
    # every oracle is a non-empty SQL string over the registered views
    assert all(isinstance(s, str) and "SELECT" in s.upper()
               for s in o.values())


def test_entry_smoke(ray_session):
    ds = entrymod.entry()
    n = ds.count() if hasattr(ds, "count") else len(ds)
    assert n > 0
    names = (ds.schema().names if hasattr(ds, "schema") and callable(ds.schema)
             else list(ds.columns))
    assert "series_key" in names or "conv_id" in names
