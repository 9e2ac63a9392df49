"""Schema construction: CQL DDL -> Spark StructType (SURVEY.md §2.1 M1) and
the cell-annotated data model (SURVEY.md §1.4).

The reference parses the user's ``CREATE TABLE`` with Cassandra's own parser
(QueryProcessor.parseStatement — Cassandra3TTLRemover.java:63-75;
CreateTableStatement.parse — Cassandra4TTLRemover.java:63,
Cassandra41TTLRemover.java:66). Types are declared, never inferred
(SURVEY.md §1.3). Here a small recursive-descent translator maps the CQL type
universe onto Spark types, and the PRIMARY KEY clause is retained so
downstream operators know partition vs clustering columns.

Cell model (SURVEY.md §1.1-1.2): a Cassandra cell is
``(value, timestamp[, ttl, localExpirationTime][, path][, tombstone])`` —
the expiring-cell wire format at NoTTLColumnSerializer.java:33-39 and the
live rebuild at Cassandra3TTLRemover.java:185,189. We model a cell as a
Spark struct ``<value:T, writetime:long, ttl:long, expires_at:long,
deleted_ts:long>``; collection columns put that struct inside Map/Array
(CellPath analog — Cassandra3TTLRemover.java:180-186).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# CQL type -> Spark type
# ---------------------------------------------------------------------------

_SIMPLE_TYPES: dict[str, T.DataType] = {
    "ascii": T.StringType(),
    "text": T.StringType(),
    "varchar": T.StringType(),
    "uuid": T.StringType(),       # kept textual for portability
    "timeuuid": T.StringType(),
    "inet": T.StringType(),
    "tinyint": T.ByteType(),
    "smallint": T.ShortType(),
    "int": T.IntegerType(),
    "bigint": T.LongType(),
    "counter": T.LongType(),      # counters are long cells (no TTL possible —
                                  # NoTTLColumnSerializer.java:26-32)
    "varint": T.DecimalType(38, 0),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "decimal": T.DecimalType(38, 18),
    "boolean": T.BooleanType(),
    "timestamp": T.TimestampNTZType(),
    "date": T.DateType(),
    "time": T.LongType(),         # nanos-since-midnight
    "blob": T.BinaryType(),
    "duration": T.StringType(),
}


class CqlParseError(ValueError):
    pass


def _parse_type(s: str) -> T.DataType:
    s = s.strip()
    low = s.lower()
    if low.startswith("frozen<") and low.endswith(">"):
        return _parse_type(s[len("frozen<"):-1])
    for outer in ("list", "set"):
        if low.startswith(outer + "<") and low.endswith(">"):
            return T.ArrayType(_parse_type(s[len(outer) + 1:-1]))
    if low.startswith("map<") and low.endswith(">"):
        inner = s[4:-1]
        k, v = _split_top_level(inner)
        return T.MapType(_parse_type(k), _parse_type(v))
    if low.startswith("tuple<") and low.endswith(">"):
        parts = _split_all_top_level(s[6:-1])
        return T.StructType(
            [T.StructField(f"_{i}", _parse_type(p)) for i, p in enumerate(parts)]
        )
    if low in _SIMPLE_TYPES:
        return _SIMPLE_TYPES[low]
    raise CqlParseError(f"unsupported CQL type: {s!r}")


def _split_top_level(s: str) -> tuple[str, str]:
    parts = _split_all_top_level(s)
    if len(parts) != 2:
        raise CqlParseError(f"expected two type args in {s!r}")
    return parts[0], parts[1]


def _split_all_top_level(s: str) -> list[str]:
    parts, depth, cur = [], 0, []
    for ch in s:
        if ch == "<":
            depth += 1
        elif ch == ">":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    parts.append("".join(cur))
    return [p.strip() for p in parts if p.strip()]


@dataclass
class CqlTable:
    """Parsed CREATE TABLE: Spark schema + key structure + table options."""

    keyspace: str | None
    name: str
    schema: T.StructType
    partition_keys: list[str]
    clustering_keys: list[str]
    options: dict[str, str] = field(default_factory=dict)

    @property
    def value_columns(self) -> list[str]:
        keys = set(self.partition_keys) | set(self.clustering_keys)
        return [f.name for f in self.schema.fields if f.name not in keys]


_CREATE_RE = re.compile(
    r"^\s*CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?"
    r"(?:(?P<ks>\w+)\s*\.\s*)?(?P<tbl>\w+)\s*\((?P<body>.*)\)\s*"
    r"(?:WITH\s+(?P<opts>.*?))?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)


def parse_cql_create_table(cql: str) -> CqlTable:
    """Parse a CQL ``CREATE TABLE`` statement.

    Mirrors the surface the reference accepts via ``--cql``
    (TTLRemoverCLI.java:67-70). Supports inline ``PRIMARY KEY`` on a column
    and the trailing ``PRIMARY KEY ((pk...), ck...)`` form.
    """
    m = _CREATE_RE.match(cql.strip())
    if not m:
        raise CqlParseError(f"not a CREATE TABLE statement: {cql[:80]!r}")
    body = m.group("body")
    fields: list[T.StructField] = []
    pk: list[str] = []
    ck: list[str] = []
    for item in _split_all_top_level_parens(body):
        low = item.lower()
        if low.startswith("primary key"):
            inner = item[item.index("(") + 1:item.rindex(")")]
            groups = _split_all_top_level_parens(inner)
            first = groups[0]
            if first.startswith("("):
                pk = [c.strip() for c in first[1:-1].split(",") if c.strip()]
            else:
                pk = [first.strip()]
            ck = [g.strip() for g in groups[1:]]
            continue
        parts = item.split(None, 1)
        if len(parts) != 2:
            raise CqlParseError(f"bad column def: {item!r}")
        col, rest = parts
        rest = rest.strip()
        if rest.lower().endswith("primary key"):
            rest = rest[: -len("primary key")].strip()
            pk = [col]
        if rest.lower() == "static":
            raise CqlParseError("static columns not supported")
        if rest.lower().endswith(" static"):
            rest = rest[: -len(" static")].strip()
        fields.append(T.StructField(col, _parse_type(rest), nullable=col not in pk))
    if not fields:
        raise CqlParseError("table has no columns")
    if not pk:
        raise CqlParseError("table has no PRIMARY KEY")
    options: dict[str, str] = {}
    if m.group("opts"):
        for opt in re.split(r"\s+AND\s+", m.group("opts"), flags=re.IGNORECASE):
            if "=" in opt:
                k, v = opt.split("=", 1)
                options[k.strip().lower()] = v.strip().strip("'\"")
    # keys become non-nullable
    fields = [
        T.StructField(f.name, f.dataType, nullable=f.name not in set(pk) | set(ck))
        for f in fields
    ]
    return CqlTable(
        keyspace=m.group("ks"),
        name=m.group("tbl"),
        schema=T.StructType(fields),
        partition_keys=pk,
        clustering_keys=ck,
        options=options,
    )


def _split_all_top_level_parens(s: str) -> list[str]:
    parts, depth, cur = [], 0, []
    for ch in s:
        if ch in "(<":
            depth += 1
        elif ch in ")>":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    parts.append("".join(cur))
    return [p.strip() for p in parts if p.strip()]


def cql_to_struct_type(cql: str) -> T.StructType:
    """CQL CREATE TABLE -> flat Spark StructType (M1)."""
    return parse_cql_create_table(cql).schema


# ---------------------------------------------------------------------------
# Cell-annotated model
# ---------------------------------------------------------------------------

#: Metadata fields carried by every cell (NoTTLColumnSerializer.java:33-39:
#: ``int ttl; int expiration; long ts; value``; deletion branch :47-49).
CELL_META_FIELDS = [
    T.StructField("writetime", T.LongType()),     # microseconds, preserved verbatim
    T.StructField("ttl", T.LongType()),           # seconds; NULL = no TTL
    T.StructField("expires_at", T.LongType()),    # epoch seconds; NULL = never
    T.StructField("deleted_ts", T.LongType()),    # cell tombstone ts; NULL = live
]


def cell_struct(value_type: T.DataType) -> T.StructType:
    """Spark struct for one annotated cell of value type ``value_type``."""
    return T.StructType([T.StructField("value", value_type), *CELL_META_FIELDS])


def annotated_schema(table: CqlTable) -> T.StructType:
    """Cell-annotated schema for a parsed CQL table (SURVEY.md §1.4).

    Key columns stay scalar; every value column becomes a cell struct
    (collections: cell struct nested in the Array/Map); plus row-level
    liveness (`pk_writetime`, `pk_ttl`, `pk_expires_at` — LivenessInfo) and
    `row_deletion_ts` (builder.addRowDeletion — Cassandra3TTLRemover.java:193).
    """
    keys = set(table.partition_keys) | set(table.clustering_keys)
    fields: list[T.StructField] = []
    for f in table.schema.fields:
        if f.name in keys:
            fields.append(f)
        elif isinstance(f.dataType, T.ArrayType):
            fields.append(
                T.StructField(f.name, T.ArrayType(cell_struct(f.dataType.elementType)))
            )
        elif isinstance(f.dataType, T.MapType):
            fields.append(
                T.StructField(
                    f.name, T.MapType(f.dataType.keyType, cell_struct(f.dataType.valueType))
                )
            )
        else:
            fields.append(T.StructField(f.name, cell_struct(f.dataType)))
    fields += [
        T.StructField("pk_writetime", T.LongType()),
        T.StructField("pk_ttl", T.LongType()),
        T.StructField("pk_expires_at", T.LongType()),
        T.StructField("row_deletion_ts", T.LongType()),
    ]
    return T.StructType(fields)
