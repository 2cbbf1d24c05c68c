"""Column mapping for the versioned upsert table format — O(1)
``ALTER TABLE RENAME COLUMN`` / ``DROP COLUMN`` without rewriting a
byte of data, Delta's columnMapping feature re-expressed on the mini
format.

The mapping lives in ``_COLUMN_MAPPING.json`` beside the commit
journal (the same placement as constraints/partitioning metadata):

    {"renames": {"logical_name": "physical_name", ...},
     "dropped": ["physical_name", ...]}

Physical names are what the parquet files carry; logical names are
what every reader and writer of the TABLE sees. A rename is one
metadata flip (the physical name stays frozen in the files); a drop
hides the physical column from readers — the bytes linger until a
full-rewrite OPTIMIZE reclaims them, exactly Delta's "DROP COLUMN is
metadata-only; run REORG/OPTIMIZE to rewrite" contract.

Read path: the typed snapshot reader projects physical → logical and
hides dropped columns (``to_logical``). Write path: staged snapshots
map logical → physical just before the parquet write
(``to_physical``), so the on-disk schema stays physically stable
across renames — which is what keeps hard-link file carries valid
(a linked file can never be rewritten to a new column name).

Like Delta with columnMapping enabled, a renamed/dropped table's raw
parquet is no longer faithfully readable by naive external readers
(they see physical names); the format's own readers are the contract.

Documented divergence from Delta: this format's table metadata
(mapping, constraints, partitioning) is table-level, not versioned
per commit — a time-travel read of a PRE-rename version shows the
CURRENT logical names (physical names are frozen, so the data is
identical either way), where Delta would replay the schema as of that
version. The same rule already applies to CHECK constraints here
(RESTORE validates against the CURRENT set).

Restrictions (all refused loudly, mirroring Delta's):
- renaming/dropping a column referenced by a CHECK constraint, a
  generated column (as target or input), the identity column, or the
  PARTITIONED BY spec;
- renaming onto an existing logical name;
- reusing a dropped column's PHYSICAL name for a new logical column
  (files still carry those bytes — reuse would resurrect stale data;
  Delta sidesteps this with column IDs, this format refuses instead).
"""

from __future__ import annotations

import json
import os

_COLMAP_FILE = "_COLUMN_MAPPING.json"


def _colmap_path(target_dir: str) -> str:
    return os.path.join(target_dir + "_versions", _COLMAP_FILE)


def table_column_mapping(target_dir: str) -> dict:
    """{"renames": {logical: physical}, "dropped": [physical, ...]} —
    empty structures when the table has no mapping."""
    p = _colmap_path(target_dir)
    if not os.path.exists(p):
        return {"renames": {}, "dropped": []}
    with open(p) as f:
        m = json.load(f)
    m.setdefault("renames", {})
    m.setdefault("dropped", [])
    return m


def _has_mapping(m: dict) -> bool:
    return bool(m["renames"] or m["dropped"])


def to_logical(df, m: dict):
    """Project a physically-named frame to the table's logical schema:
    hide dropped physical columns, alias physical → logical. Columns
    absent from the mapping pass through (logical == physical)."""
    if not _has_mapping(m):
        return df
    from pyspark.sql import functions as F

    phys_to_log = {p: lg for lg, p in m["renames"].items()}
    dropped = set(m["dropped"])
    cols = []
    for c in df.columns:
        if c in dropped:
            continue
        cols.append(F.col(f"`{c}`").alias(phys_to_log.get(c, c)))
    return df.select(*cols)


def to_physical(df, m: dict):
    """Map a logically-named frame back to physical names for a staged
    write. Refuses a frame that tries to (re)introduce a dropped
    physical name — the files still carry those bytes and a reuse
    would resurrect them under the new column."""
    if not _has_mapping(m):
        return df
    from pyspark.sql import functions as F

    renames = m["renames"]
    clash = sorted(set(df.columns) & set(m["dropped"]))
    if clash:
        raise ValueError(
            f"column name(s) {clash} were DROPPED from this table and "
            f"their physical names still exist in retained files — "
            f"pick different names (physical-name reuse would "
            f"resurrect stale data)")
    # A renamed column's PHYSICAL name is just as reserved as a dropped
    # one: after RENAME a->b (renames {b: a}), a new logical column
    # literally named 'a' would alias onto physical 'a' alongside b's
    # mapping — two logical columns sharing one physical column. Only
    # an UNMAPPED column can alias this way: a column that is itself a
    # mapping key writes to its own target (legal after rename chains
    # like a->b then c->a, where logical 'a' maps to physical 'c').
    in_use_phys = {p for lg, p in renames.items() if lg != p}
    phys_clash = sorted(
        c for c in df.columns if c in in_use_phys and c not in renames)
    if phys_clash:
        raise ValueError(
            f"column name(s) {phys_clash} are the in-use PHYSICAL names "
            f"of renamed columns of this table — pick different names "
            f"(reuse would alias two logical columns onto one physical "
            f"column)")
    return df.select(*[
        F.col(f"`{c}`").alias(renames.get(c, c)) for c in df.columns])


def _referenced_anywhere(target_dir: str, logical: str) -> str | None:
    """Why this column cannot be renamed/dropped, or None if free.
    Checks the same metadata surfaces Delta's ALTER TABLE guards do."""
    from .ingest import (table_check_constraints, table_generated_columns,
                         table_identity_column)
    from .partitioning import table_partitioning

    if logical in table_partitioning(target_dir):
        return "it is a PARTITIONED BY column (partition directories " \
               "carry its name)"
    ident = table_identity_column(target_dir)
    if ident and ident["name"] == logical:
        return "it is the GENERATED ALWAYS AS IDENTITY column"
    for name, expr in table_check_constraints(target_dir).items():
        if isinstance(expr, dict):          # typed entry (NOT NULL)
            if expr.get("col") == logical:
                return f"NOT NULL constraint {name!r} references it"
            continue
        if _expr_references(expr, logical):
            return f"CHECK constraint {name!r} ({expr}) references it"
    for name, expr in table_generated_columns(target_dir).items():
        if name == logical:
            return f"it is generated column {name!r}"
        if _expr_references(expr, logical):
            return f"generated column {name!r} (ALWAYS AS {expr}) " \
                   f"references it"
    return None


def _expr_references(expr: str, col: str) -> bool:
    """Whether a stored SQL expression references ``col`` — resolved
    through Spark's parser (identifier-aware), not substring matching."""
    from pyspark.sql import functions as F

    try:
        refs = {str(r) for r in
                F.expr(expr)._jc.expr().references().toList().toArray()}
    except Exception:
        # no JVM handy / unparseable: be conservative
        return col in expr
    names = {r.split("#")[0].strip("'") for r in refs}
    return col in names


def _table_logical_columns(spark, target_dir: str) -> list[str]:
    from .ingest import read_upsert_version
    return read_upsert_version(spark, target_dir).columns


def rename_table_column(spark, target_dir: str, old: str,
                        new: str) -> None:
    """ALTER TABLE RENAME COLUMN old TO new — one metadata write, zero
    data movement at any table size. The physical name in the files
    stays frozen (that is what keeps every retained snapshot's
    hard-linked files valid); readers and writers see ``new`` from the
    next operation on."""
    from ..fsutil import atomic_write_json

    m = table_column_mapping(target_dir)
    cols = _table_logical_columns(spark, target_dir)
    if old not in cols:
        raise ValueError(
            f"cannot rename {old!r}: not a column of this table "
            f"(columns: {cols})")
    if new in cols:
        raise ValueError(
            f"cannot rename {old!r} to {new!r}: the target name "
            f"already exists")
    why = _referenced_anywhere(target_dir, old)
    if why:
        raise ValueError(
            f"cannot rename column {old!r}: {why} — drop/redeclare "
            f"that first (Delta refuses the same way)")
    # physical name of `old` = its current mapping target, else itself
    phys = m["renames"].pop(old, old)
    if phys in m["dropped"]:
        raise ValueError(
            f"physical column {phys!r} was dropped — cannot rename "
            f"onto it")
    if new != phys:
        m["renames"][new] = phys
    atomic_write_json(_colmap_path(target_dir), m)
    from .partitioning import register_table_feature
    register_table_feature(target_dir, "column_mapping")


def drop_table_column(spark, target_dir: str, name: str) -> None:
    """ALTER TABLE DROP COLUMN — metadata-only: the physical column is
    hidden from every reader; its bytes linger in retained snapshots
    until a full-rewrite OPTIMIZE reclaims them (Delta's REORG
    contract). Refused for key-metadata columns (partitioning,
    identity, constraint/generated references) and for the table's
    last column."""
    from ..fsutil import atomic_write_json

    m = table_column_mapping(target_dir)
    cols = _table_logical_columns(spark, target_dir)
    if name not in cols:
        raise ValueError(
            f"cannot drop {name!r}: not a column of this table "
            f"(columns: {cols})")
    if len(cols) <= 1:
        raise ValueError("cannot drop the table's last column")
    why = _referenced_anywhere(target_dir, name)
    if why:
        raise ValueError(
            f"cannot drop column {name!r}: {why} — drop/redeclare "
            f"that first (Delta refuses the same way)")
    phys = m["renames"].pop(name, name)
    m["dropped"].append(phys)
    atomic_write_json(_colmap_path(target_dir), m)
    from .partitioning import register_table_feature
    register_table_feature(target_dir, "column_mapping")
