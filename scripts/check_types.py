#!/usr/bin/env python3
"""Oracle output-TYPE contract (VERDICT r8 task 2).

DESCRIBEs each oracle SQL in DuckDB (no execution) and rejects final
select-list types that cannot hash-compare against the Spark parquet
dump in the driver's gate:

  * HUGEINT / UHUGEINT — an un-cast sum() over BIGINT; pandas
    materializes int128 as float64 and the value hash diverges on
    representation (killed m_media_sniff + p_anneal_plan in round 8).
  * DECIMAL finals where the Spark side emits long/double — DuckDB's
    .df() turns DECIMAL into float64 while Spark's parquet keeps the
    logical type; cast the final column instead.
  * any class mismatch (int vs float vs str vs bool vs date/ts vs
    nested) between the DuckDB DESCRIBE type and the Spark schema.

Usage: check_types.py <sfDir> <contractJson>
  contractJson: {"<query>": {"sql": str, "spark": {col: sparkSimpleType}}}
Exit 0 iff every query passes; prints one line per violation.
"""
import sys, json, os
import duckdb

sfdir, contract_path = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    p = f"{sfdir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")


def duck_class(t):
    t = t.upper()
    if t in ("BIGINT", "INTEGER", "SMALLINT", "TINYINT",
             "UBIGINT", "UINTEGER", "USMALLINT", "UTINYINT"):
        return "int"
    if t in ("DOUBLE", "FLOAT", "REAL"):
        return "float"
    if t == "VARCHAR":
        return "str"
    if t == "BOOLEAN":
        return "bool"
    if t == "DATE":
        return "date"
    if t.startswith("TIMESTAMP"):
        return "ts"
    if t.endswith("[]") or t.startswith(("STRUCT", "MAP", "LIST")):
        return "nested"
    return "other:" + t


def spark_class(t):
    t = t.lower()
    if t in ("bigint", "long", "int", "integer", "smallint", "tinyint"):
        return "int"
    if t in ("double", "float"):
        return "float"
    if t == "string":
        return "str"
    if t == "boolean":
        return "bool"
    if t == "date":
        return "date"
    if t.startswith("timestamp"):
        return "ts"
    if t.startswith(("array", "struct", "map")):
        return "nested"
    return "other:" + t


contract = json.load(open(contract_path))
fails = 0
for name, entry in sorted(contract.items()):
    try:
        desc = con.execute(f"DESCRIBE ({entry['sql']})").fetchall()
    except Exception as e:
        print(f"ERROR    {name}: describe failed: {e}")
        fails += 1
        continue
    dt = {row[0]: row[1] for row in desc}
    st = entry.get("spark", {})
    if st and sorted(dt) != sorted(st):
        print(f"SCHEMA   {name}: duck {sorted(dt)} vs spark {sorted(st)}")
        fails += 1
        continue
    for col in sorted(dt):
        d = dt[col].upper()
        if "HUGEINT" in d:
            print(f"HUGEINT  {name}.{col}: {dt[col]} — wrap the final "
                  f"aggregate in CAST(... AS BIGINT)")
            fails += 1
            continue
        s = st.get(col)
        if d.startswith("DECIMAL") and (s is None or not s.lower().startswith("decimal")):
            print(f"DECIMAL  {name}.{col}: {dt[col]} vs spark {s} — cast "
                  f"the final column to BIGINT/DOUBLE")
            fails += 1
            continue
        if s is not None and not d.startswith("DECIMAL"):
            dc, sc = duck_class(d), spark_class(s)
            if dc != sc:
                print(f"CLASS    {name}.{col}: duck {dt[col]} ({dc}) vs "
                      f"spark {s} ({sc})")
                fails += 1
print(f"{len(contract)} checked, {fails} type violations")
sys.exit(1 if fails else 0)
