"""Property-based round-trip test for the DDL column-definition parser
(mpp.parse_column_defs): for ANY generated column spec — mixed types,
quoting, NOT NULL, DEFAULT literals, UNIQUE/PRIMARY KEY (column- and
table-level) — the parsed schema must reproduce the spec exactly. The
parser feeds CREATE TABLE through the SQL front door, so a silent
mis-parse here becomes silent data corruption there."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from duckdb_mpp_spark.mpp import parse_column_defs

_TYPES = [
    ("INTEGER", T.IntegerType()),
    ("INT", T.IntegerType()),
    ("BIGINT", T.LongType()),
    ("SMALLINT", T.ShortType()),
    ("DOUBLE", T.DoubleType()),
    ("TEXT", T.StringType()),
    ("VARCHAR", T.StringType()),
    ("BOOLEAN", T.BooleanType()),
    ("DATE", T.DateType()),
    ("TIMESTAMP", T.TimestampType()),
    ("DECIMAL(18,4)", T.DecimalType(18, 4)),
]

_name = st.from_regex(r"[a-z][a-z0-9_]{0,8}", fullmatch=True).filter(
    lambda s: s.upper() not in {"PRIMARY", "UNIQUE", "CHECK", "FOREIGN", "CONSTRAINT"}
)

_defaults = st.sampled_from([None, "0", "42", "'x'", "'it''s'", "NULL"])


@st.composite
def _colspec(draw):
    name = draw(_name)
    ddl, dtype = draw(st.sampled_from(_TYPES))
    not_null = draw(st.booleans())
    default = draw(_defaults)
    constraint = draw(st.sampled_from([None, "UNIQUE", "PRIMARY KEY"]))
    return (name, ddl, dtype, not_null, default, constraint)


@settings(
    max_examples=200,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(specs=st.lists(_colspec(), min_size=1, max_size=6, unique_by=lambda s: s[0]),
       table_level_unique=st.booleans())
def test_parse_column_defs_round_trip(spark, specs, table_level_unique):
    # spark: type parsing needs an active SparkContext
    parts = []
    for name, ddl, _, not_null, default, constraint in specs:
        p = f"{name} {ddl}"
        if default is not None:
            p += f" DEFAULT {default}"
        if not_null:
            p += " NOT NULL"
        if constraint:
            p += f" {constraint}"
        parts.append(p)
    if table_level_unique:
        parts.append(f"UNIQUE({specs[0][0]})")
    schema, defaults, uniques = parse_column_defs(", ".join(parts))

    assert [f.name for f in schema.fields] == [s[0] for s in specs]
    for field, (name, _, dtype, not_null, default, constraint) in zip(
        schema.fields, specs
    ):
        assert field.dataType == dtype, (name, field.dataType, dtype)
        expected_nullable = not (not_null or constraint == "PRIMARY KEY")
        assert field.nullable == expected_nullable, (name, constraint)
        if default is not None:
            assert defaults[name] == default
        else:
            assert name not in defaults
    expected_uniques = [s[0] for s in specs if s[5] is not None]
    if table_level_unique and specs[0][0] not in expected_uniques:
        expected_uniques.append(specs[0][0])
    assert sorted(uniques) == sorted(set(expected_uniques))
